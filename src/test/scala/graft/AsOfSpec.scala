package graft

import graft.operators.AsOf

/** [[graft.operators.AsOf.joinAsOf]] — the at-or-before carry semantics,
  * tie-breaks, and null behavior the q59 oracle (DuckDB ASOF LEFT JOIN)
  * pins on real data, isolated here on hand-built cases. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def run(left: Seq[(String, Long, Long)],
                  right: Seq[(String, Long, Long, Double)]) = {
    val l = left.toDF("k", "ts", "lid")
    val r = right.toDF("k", "ts", "rid", "rv")
      .select($"k", $"ts", $"rid", $"ts".as("rts"), $"rv")
    AsOf.joinAsOf(l, r, keyCol = "k", tsCol = "ts", ordCol = "rid",
        payload = Seq("rid", "rts", "rv"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().sortBy(t => (t._1, t._2, t._3)).toSeq
  }

  test("carries the most recent right row at-or-before each left row") {
    val out = run(
      left = Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 20L, 3L)),
      right = Seq(("a", 4L, 100L, 1.5), ("a", 10L, 101L, 2.5), ("a", 30L, 102L, 9.9)))
    out shouldBe Seq(
      ("a", 5L, 1L, Some(100L), Some(4L), Some(1.5)),   // strictly before
      ("a", 10L, 2L, Some(101L), Some(10L), Some(2.5)), // tie: at-or-before
      ("a", 20L, 3L, Some(101L), Some(10L), Some(2.5))) // later right invisible
  }

  test("no preceding right row -> null payload; keys never cross") {
    val out = run(
      left = Seq(("a", 1L, 1L), ("b", 50L, 2L)),
      right = Seq(("a", 5L, 100L, 1.0)))
    out shouldBe Seq(
      ("a", 1L, 1L, None, None, None),  // right row is later
      ("b", 50L, 2L, None, None, None)) // right row is another key
  }

  test("duplicate right rows per (key, ts): greatest ordCol wins, coherently") {
    val out = run(
      left = Seq(("a", 10L, 1L)),
      right = Seq(("a", 10L, 100L, 1.0), ("a", 10L, 105L, 7.0), ("a", 10L, 103L, 3.0)))
    // the whole payload comes from the rid=105 row (not a column-wise max)
    out shouldBe Seq(("a", 10L, 1L, Some(105L), Some(10L), Some(7.0)))
  }

  test("null payload field in the newest right row is carried as null, " +
      "not resurrected from an older row") {
    // older right row has rv=1.0; newer right row has rv=NULL. The left
    // probe at ts=20 must see the NEWER row's payload wholesale —
    // rid=101 with rv=None — not a chimera of (rid=101, rv=1.0).
    val l = Seq(("a", 20L, 1L)).toDF("k", "ts", "lid")
    val r = Seq(("a", 5L, 100L, Some(1.0)), ("a", 10L, 101L, None))
      .toDF("k", "ts", "rid", "rv")
      .select($"k", $"ts", $"rid", $"ts".as("rts"), $"rv")
    val out = AsOf.joinAsOf(l, r, keyCol = "k", tsCol = "ts",
        ordCol = "rid", payload = Seq("rid", "rts", "rv"))
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().toSeq
    out shouldBe Seq(("a", 20L, 1L, Some(101L), Some(10L), None))
  }

  test("duplicate left rows each get the same carry") {
    val out = run(
      left = Seq(("a", 10L, 1L), ("a", 10L, 2L)),
      right = Seq(("a", 3L, 100L, 1.0)))
    out shouldBe Seq(
      ("a", 10L, 1L, Some(100L), Some(3L), Some(1.0)),
      ("a", 10L, 2L, Some(100L), Some(3L), Some(1.0)))
  }
}
