package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Incremental

/** [[graft.operators.Incremental.mergeStats]] — the snapshot ⊕ delta
  * == recompute law (q161), disjoint/overlapping key behavior, and the
  * decimal-exactness contract. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def aggOf(rows: Seq[(Long, Double)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast(DecimalType(18, 4))).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))

  private def collectStats(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("n"), col("s").cast("double"), col("mn"), col("mx"))
      .as[(Long, Long, Double, Double, Double)].collect().sortBy(_._1).toSeq

  test("merge(snapshot, delta) == recompute from scratch, fuzzed " +
      "(incl. keys present on only one side)") {
    val rnd = new scala.util.Random(5)
    for (_ <- 0 until 5) {
      val all = (0 until 300).map(_ =>
        (rnd.nextInt(20).toLong, math.round(rnd.nextDouble() * 1e4) / 1e4))
      val cut = rnd.nextInt(all.size)
      val (aRows, bRows) = all.splitAt(cut)
      val merged = Incremental.mergeStats(aggOf(aRows), aggOf(bRows),
        keys = Seq("k"), counts = Seq("n"), sums = Seq("s"),
        mins = Seq("mn"), maxs = Seq("mx"))
      collectStats(merged) shouldBe collectStats(aggOf(all))
    }
  }

  test("merging with an empty delta is the identity") {
    val a = aggOf(Seq((1L, 2.5), (2L, -1.0), (1L, 4.0)))
    val empty = aggOf(Seq.empty[(Long, Double)])
    val merged = Incremental.mergeStats(a, empty, Seq("k"),
      Seq("n"), Seq("s"), Seq("mn"), Seq("mx"))
    collectStats(merged) shouldBe collectStats(a)
  }

  test("merge is associative across three snapshots") {
    val r1 = Seq((1L, 1.0), (2L, 5.0))
    val r2 = Seq((1L, -3.0), (3L, 7.0))
    val r3 = Seq((2L, 2.0), (3L, 0.5), (4L, 9.0))
    def m(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Incremental.mergeStats(a, b, Seq("k"), Seq("n"), Seq("s"),
        Seq("mn"), Seq("mx"))
    val left = m(m(aggOf(r1), aggOf(r2)), aggOf(r3))
    val right = m(aggOf(r1), m(aggOf(r2), aggOf(r3)))
    collectStats(left) shouldBe collectStats(right)
    collectStats(left) shouldBe collectStats(aggOf(r1 ++ r2 ++ r3))
  }

  test("guards: missing columns and key/stat overlap are rejected") {
    val a = aggOf(Seq((1L, 1.0)))
    an[IllegalArgumentException] should be thrownBy
      Incremental.mergeStats(a, a.drop("mx"), Seq("k"),
        Seq("n"), Seq("s"), Seq("mn"), Seq("mx"))
    an[IllegalArgumentException] should be thrownBy
      Incremental.mergeStats(a, a, Seq("k"), Seq("k"), Nil, Nil, Nil)
  }
}
