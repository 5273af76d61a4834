package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** [[graft.operators.Layout.zValue]] — hand-computed Morton values and
  * the locality law the q69 gate demonstrates quantitatively — and
  * [[graft.operators.Layout.rangeShards]] (L117) — the envelope
  * disjointness/order, exactly-once assignment, tie-stability,
  * balance, and partitioning-invariance laws behind q164. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Pull (shard → (n, min, max)) envelopes for law checks. */
  private def envelopes(df: org.apache.spark.sql.DataFrame, key: String)
      : Seq[(Long, Long, Long, Long)] =
    df.groupBy(col("shard"))
      .agg(count(lit(1)).as("n"),
        min(col(key).cast("long")).as("mn"),
        max(col(key).cast("long")).as("mx"))
      .select(col("shard").cast("long"), col("n"), col("mn"), col("mx"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)

  test("rangeShards: exactly-once assignment, disjoint ordered envelopes, ties never straddle") {
    val df = (1 to 1000).map(i => (i.toLong, (i * 7919 % 97).toLong))
      .toDF("id", "k")
    val out = Layout.rangeShards(df, col("k"), 8)
    // every row assigned to exactly one shard
    out.count() shouldBe 1000L
    out.select("id").distinct().count() shouldBe 1000L
    // envelopes are disjoint and ordered: shard i's max < shard j's min
    // for i < j — and therefore every key value lives in ONE shard
    val env = envelopes(out, "k")
    env.sliding(2).foreach {
      case Seq((s1, _, _, mx1), (s2, _, mn2, _)) =>
        withClue(s"shards $s1,$s2: ") { mx1 should be < mn2 }
      case _ => ()
    }
    // ties never straddle: each of the 97 distinct values in one shard
    out.groupBy(col("k")).agg(countDistinct(col("shard")).as("d"))
      .agg(max(col("d"))).as[Long].head() shouldBe 1L
    // balance: shard size within max-value-multiplicity of N/numShards
    val maxMult = out.groupBy(col("k")).count()
      .agg(max(col("count"))).as[Long].head()
    env.map(_._2).foreach(n => n should be <= (1000L / 8 + maxMult))
  }

  test("rangeShards: deterministic across partitionings (never sampled bounds)") {
    val rows = (1 to 500).map(i => (i.toLong, (i * 31 % 211).toLong))
    val a = Layout.rangeShards(rows.toDF("id", "k"), col("k"), 5)
      .select("id", "shard").as[(Long, Long)].collect().toSet
    val b = Layout.rangeShards(
        rows.reverse.toDF("id", "k").repartition(7), col("k"), 5)
      .select("id", "shard").as[(Long, Long)].collect().toSet
    a shouldBe b
  }

  test("rangeShards: string keys shard in lexicographic order; numShards=1 is a no-op partition") {
    val df = ('a' to 'z').flatMap(c => Seq.fill(4)(s"doc_$c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val out = Layout.rangeShards(df, col("s"), 4)
    out.count() shouldBe 104L
    val env = out.groupBy(col("shard"))
      .agg(min(col("s")).as("mn"), max(col("s")).as("mx"))
      .select(col("shard").cast("long"), col("mn"), col("mx"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    env.sliding(2).foreach {
      case Seq((_, _, mx1), (_, mn2, _)) => mx1 should be < mn2
      case _ => ()
    }
    Layout.rangeShards(df, col("s"), 1)
      .select(col("shard")).distinct().as[Long].collect() shouldBe Array(1L)
  }

  test("rangeShards: single distinct key value → one shard holding everything") {
    val df = Seq.fill(50)(7L).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val out = Layout.rangeShards(df, col("k"), 4)
    out.count() shouldBe 50L
    out.select("shard").distinct().count() shouldBe 1L
  }

  test("matches hand-computed Morton interleaves") {
    // a=5=0b101 -> even bits 0,4; b=3=0b011 -> odd bits 1,3
    // z = (1<<0)|(0<<2)|(1<<4) | (1<<1)|(1<<3)|(0<<5) = 1+16+2+8 = 27
    val out = Seq((5, 3), (0, 0), (7, 7), (1, 0), (0, 1))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    out shouldBe Seq(27L, 0L, 63L, 1L, 2L)
  }

  test("z >> 2k buckets bound both coordinate spans by 2^k") {
    val k = 3 // 64-cell buckets -> both spans < 8
    val rows = for (a <- 0 until 32; b <- 0 until 32) yield (a, b)
    val spans = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 5).as("z"))
      .groupBy(shiftright(col("z"), 2 * k).as("bucket"))
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .select(greatest(col("sa"), col("sb"))).as[Int].collect()
    all(spans) should be < (1 << k)
  }
}
