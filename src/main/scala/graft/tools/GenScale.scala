package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor amplifier for the driver test data (TESTDATA.md):
  * replicates an existing SF directory `reps`× with key remapping so the
  * result behaves like a genuinely larger scale factor, for the
  * scale-curve bench (BENCH at sf0.1 vs sf1 — VERDICT r4 next-steps #1).
  *
  * Invariants the remapping preserves, per table:
  *  - **fact keys stay dense/unique**: every replica shifts ids by
  *    `r × (max_id + 1)` (events stay dense 0..10n-1, so the synthetic
  *    raster grid of `Q.grid` just grows taller);
  *  - **join integrity**: lineitem's order/part/supp keys shift with the
  *    tables they reference, so per-replica join fanouts equal sf0.1's;
  *  - **text corpora do NOT become cross-replica near-duplicates**:
  *    every whitespace token gets a replica suffix (replica vocabularies
  *    are disjoint — the dedup/inverted-index/BM25 queries see 10
  *    independent corpora, the honest linear-scaling reference; naive
  *    replication would manufacture 10-deep duplicate clusters and
  *    quadratic pair growth that says nothing about the plan);
  *  - **embedding geometry is preserved within a replica, decorrelated
  *    across replicas**: dims rotate cyclically by `r` (an orthogonal
  *    transform — all within-replica dot products and hence
  *    cosines/top-k are bit-preserved; cross-replica cosines are
  *    pseudo-random and fall below the near-dup thresholds);
  *  - region/nation are fixed-size dimensions at every TPC-H SF — copied.
  *
  * Usage: spark-submit --class graft.tools.GenScale <jar> <srcDir> <outDir> [reps]
  */
object GenScale {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val reps = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")

    def write(name: String)(mk: Int => DataFrame): Unit = {
      val df = (0 until reps).map(mk).reduce(_ unionByName _)
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      System.err.println(s"[genscale] $name done")
    }

    // fixed-size dimensions: copy
    for (n <- Seq("region", "nation"))
      tbl(n).write.mode("overwrite").parquet(s"$out/$n.parquet")

    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1

    val (oStr, cStr, pStr, sStr) = (
      stride(tbl("orders"), "o_orderkey"), stride(tbl("customer"), "c_custkey"),
      stride(tbl("part"), "p_partkey"), stride(tbl("supplier"), "s_suppkey"))

    write("customer")(r => tbl("customer")
      .withColumn("c_custkey", col("c_custkey") + lit(r * cStr)))
    write("supplier")(r => tbl("supplier")
      .withColumn("s_suppkey", col("s_suppkey") + lit(r * sStr)))
    write("part")(r => tbl("part")
      .withColumn("p_partkey", col("p_partkey") + lit(r * pStr)))
    write("orders")(r => tbl("orders")
      .withColumn("o_orderkey", col("o_orderkey") + lit(r * oStr))
      .withColumn("o_custkey", col("o_custkey") + lit(r * cStr)))
    write("lineitem")(r => tbl("lineitem")
      .withColumn("l_orderkey", col("l_orderkey") + lit(r * oStr))
      .withColumn("l_partkey", col("l_partkey") + lit(r * pStr))
      .withColumn("l_suppkey", col("l_suppkey") + lit(r * sStr)))

    // events: ids stay dense (stride = row count), users shift, ts kept.
    // `ts` is read as raw nanos (legacy conf) and written as int64 —
    // graft.Tables.events rebuilds the micros timestamp either way.
    val evN = tbl("events").count()
    val uStr = stride(tbl("events"), "user_id")
    write("events")(r => tbl("events")
      .withColumn("event_id", col("event_id") + lit(r * evN))
      .withColumn("user_id", col("user_id") + lit(r * uStr)))

    val dStr = stride(tbl("documents"), "doc_id")
    write("documents") { r =>
      val base = tbl("documents")
        .withColumn("doc_id", col("doc_id") + lit(r * dStr))
      // base-26 letter suffix so any rep count stays alphabetic
      // (single chars walk past 'z' into punctuation at r > 26)
      def suffix(n: Int): String =
        if (n < 26) ('a' + n).toChar.toString
        else suffix(n / 26 - 1) + ('a' + n % 26).toChar
      val t = if (r == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + suffix(r - 1))
      base.withColumn("text", t).withColumn("n_chars", length(col("text")))
    }

    val vStr = stride(tbl("embeddings"), "vec_id")
    write("embeddings") { r =>
      // rotate by r mod dim: above 64 reps the raw r made the slice
      // length negative (the sf20 lesson); reps ≥ 64 reuse rotations
      // with distinct vec_ids, which is fine for scale testing
      val k = r % 64
      val rot = if (k == 0) col("embedding")
        else expr(s"concat(slice(embedding, ${k + 1}, ${64 - k}), " +
          s"slice(embedding, 1, $k))")
      tbl("embeddings")
        .withColumn("vec_id", col("vec_id") + lit(r * vStr))
        .withColumn("embedding", rot)
    }

    spark.stop()
  }
}
