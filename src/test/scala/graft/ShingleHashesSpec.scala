package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFns

/** [[graft.functions.ShingleHashes]] — bit parity with the HOF
  * transform + hex-string hash it fused, including concat_ws null-skip
  * semantics, short-doc/empty/null-array edges, and codegen validity. */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def parity(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
    val out = df.select(
      TextFns.shingleHashes(col("toks"), n).as("native"),
      TextFns.shingleHashesFold(col("toks"), n).as("hof")).collect()
    out.foreach { r => r.getSeq[Long](0) shouldBe r.getSeq[Long](1) }
  }

  test("parity with the HOF pipeline on random token arrays (n = 2, 3, 5)") {
    val rnd = new scala.util.Random(23)
    val words = Vector("the", "sea", "ice", "chart", "Δ", "0", "a b".filter(_ != ' '),
      "émile", "x" * 40, "")
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.length))))
    val df = rows.toDF("toks")
    Seq(2, 3, 5).foreach(parity(df, _))
  }

  test("null tokens are skipped concat_ws-style; null array -> empty") {
    val schema = StructType(Seq(StructField("toks", ArrayType(StringType))))
    val rows = Seq(
      Row(Seq("a", null, "b")),      // shingles: "a", "b" (null skipped)
      Row(Seq(null, null)),          // shingle of two nulls -> md5("")
      Row(null),                     // null array -> empty result
      Row(Seq("only")))              // shorter than n -> empty
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    parity(df, 2)
    df.select(TextFns.shingleHashes(col("toks"), 2).as("h"))
      .collect().map(_.getSeq[Long](0).length).toSeq shouldBe Seq(2, 1, 0, 0)
  }

  test("hash value equals the conv(substring(md5)) derivation exactly") {
    val got = Seq(Seq("ice", "chart")).toDF("toks")
      .select(TextFns.shingleHashes(col("toks"), 2).as("h"))
      .select(element_at(col("h"), 1)).as[Long].head()
    val want = Seq("ice chart").toDF("s")
      .select((TextFns.hash60(col("s")) % TextFns.HashMod).as("h"))
      .as[Long].head()
    got shouldBe want
  }

  test("evaluates under CODEGEN_ONLY factory mode") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try parity(Seq(Seq("a", "b", "c", "d")).toDF("toks"), 2)
    finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
