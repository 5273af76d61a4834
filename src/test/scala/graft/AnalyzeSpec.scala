package graft

import org.apache.spark.sql.functions._

import graft.operators.Analyze

/** [[graft.operators.Analyze.columnStats]] (L116, q163) — the laws that
  * make one-scan ANALYZE trustworthy: exact base stats (count, nulls,
  * lexicographic min/max over the stringified value), the
  * linear-counting regime giving near-exact distinct estimates at low
  * cardinality, the all-null column convention, and the one-row-per-
  * column output shape. */
class AnalyzeSpec extends SparkSpec {
  import spark.implicits._

  private def statsFor(df: org.apache.spark.sql.DataFrame, cols: String*)
      : Map[String, (Long, Long, Double, String, String)] =
    Analyze.columnStats(df, cols)
      .select(col("col_name"), col("n"), col("n_nulls"),
        col("n_distinct_est"), col("min_s"), col("max_s"))
      .as[(String, Long, Long, Double, String, String)]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6))).toMap

  test("exact base stats: count, nulls, lexicographic min/max; one row per column") {
    val df = Seq(
      (1L, Some("banana"), Some(10)),
      (2L, Some("apple"), None),
      (3L, None, Some(2)),
      (4L, Some("cherry"), Some(10))
    ).toDF("id", "s", "v")
    val m = statsFor(df, "id", "s", "v")
    m.keySet shouldBe Set("id", "s", "v")
    m("id") shouldBe ((4L, 0L, m("id")._3, "1", "4"))
    m("s")._1 shouldBe 4L
    m("s")._2 shouldBe 1L
    m("s")._4 shouldBe "apple"
    m("s")._5 shouldBe "cherry"
    // min/max are LEXICOGRAPHIC on the stringified value — "10" < "2"
    m("v")._4 shouldBe "10"
    m("v")._5 shouldBe "2"
    m("v")._2 shouldBe 1L
  }

  test("linear-counting regime: distinct estimate is near-exact at low cardinality") {
    // 500 rows over 40 distinct values: far below the 640 linear-
    // counting threshold, so the estimate tracks truth within a few %
    val df = (1 to 500).map(i => i % 40).toDF("k")
    val est = statsFor(df, "k")("k")._3
    est shouldBe 40.0 +- 40.0 * 0.10
  }

  test("estimate stays within HLL tolerance at moderate cardinality") {
    // 5000 distinct values, m=256 registers: standard error
    // ~1.04/sqrt(256) ≈ 6.5%; assert a generous 3-sigma band
    val df = (1 to 5000).map(i => s"val_$i").toDF("k")
    val est = statsFor(df, "k")("k")._3
    est shouldBe 5000.0 +- 5000.0 * 0.20
  }

  test("all-null column: n_nulls = n, distinct estimate 0, null min/max") {
    val df = Seq.fill(20)(Option.empty[String]).toDF("s")
    val r = Analyze.columnStats(df, Seq("s"))
      .select(col("n"), col("n_nulls"), col("n_distinct_est"),
        col("min_s").isNull, col("max_s").isNull)
      .as[(Long, Long, Double, Boolean, Boolean)].head()
    r shouldBe ((20L, 20L, 0.0, true, true))
  }

  test("partitioning invariance: stats identical under repartition") {
    val rows = (1 to 300).map(i => (i.toLong, s"d${i % 23}"))
    val a = statsFor(rows.toDF("id", "s"), "id", "s")
    val b = statsFor(rows.reverse.toDF("id", "s").repartition(7), "id", "s")
    a shouldBe b
  }

  test("missing column is a loud require, not a silent skip") {
    val df = Seq((1, "x")).toDF("id", "s")
    an[IllegalArgumentException] should be thrownBy
      Analyze.columnStats(df, Seq("id", "nope"))
  }
}
