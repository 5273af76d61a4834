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

  private def runDir(left: Seq[(String, Long, Long)],
                     right: Seq[(String, Long, Long, Double)],
                     direction: String, allowExact: Boolean = true,
                     tol: Option[Long] = None) = {
    val l = left.toDF("k", "ts", "lid")
    val r = right.toDF("k", "ts", "rid", "rv")
      .select($"k", $"ts", $"rid", $"ts".as("rts"), $"rv")
    AsOf.joinAsOf(l, r, keyCol = "k", tsCol = "ts", ordCol = "rid",
        payload = Seq("rid", "rts", "rv"), direction = direction,
        allowExactMatches = allowExact, toleranceMicros = tol)
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().sortBy(t => (t._1, t._2, t._3)).toSeq
  }

  test("forward: carries the NEXT right row at-or-after; strict excludes ties") {
    val left = Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 40L, 3L))
    val right = Seq(("a", 10L, 100L, 1.0), ("a", 30L, 101L, 2.0))
    runDir(left, right, "forward") shouldBe Seq(
      ("a", 5L, 1L, Some(100L), Some(10L), Some(1.0)),
      ("a", 10L, 2L, Some(100L), Some(10L), Some(1.0)), // tie included
      ("a", 40L, 3L, None, None, None))                 // nothing after
    runDir(left, right, "forward", allowExact = false) shouldBe Seq(
      ("a", 5L, 1L, Some(100L), Some(10L), Some(1.0)),
      ("a", 10L, 2L, Some(101L), Some(30L), Some(2.0)), // tie EXCLUDED
      ("a", 40L, 3L, None, None, None))
  }

  test("backward strict excludes the exact-ts right row") {
    runDir(Seq(("a", 10L, 1L)),
      Seq(("a", 10L, 100L, 1.0), ("a", 4L, 99L, 0.5)),
      "backward", allowExact = false) shouldBe
      Seq(("a", 10L, 1L, Some(99L), Some(4L), Some(0.5)))
  }

  test("nearest: smaller absolute distance wins; exact ties prefer backward") {
    val right = Seq(("a", 8L, 100L, 1.0), ("a", 13L, 101L, 2.0))
    runDir(Seq(("a", 10L, 1L)), right, "nearest") shouldBe
      Seq(("a", 10L, 1L, Some(100L), Some(8L), Some(1.0)))  // 2 < 3
    runDir(Seq(("a", 11L, 1L)), right, "nearest") shouldBe
      Seq(("a", 11L, 1L, Some(101L), Some(13L), Some(2.0))) // 2 < 3 -> forward
  }

  test("nearest exact tie prefers the backward row") {
    val right = Seq(("a", 8L, 100L, 1.0), ("a", 12L, 101L, 2.0))
    runDir(Seq(("a", 10L, 1L)), right, "nearest") shouldBe
      Seq(("a", 10L, 1L, Some(100L), Some(8L), Some(1.0))) // |2| = |2| -> backward
  }

  test("tolerance nulls carries further than the bound, in every direction") {
    val right = Seq(("a", 3L, 100L, 1.0))
    runDir(Seq(("a", 10L, 1L)), right, "backward", tol = Some(5L)) shouldBe
      Seq(("a", 10L, 1L, None, None, None)) // distance 7 > 5
    runDir(Seq(("a", 10L, 1L)), right, "backward", tol = Some(7L)) shouldBe
      Seq(("a", 10L, 1L, Some(100L), Some(3L), Some(1.0)))
    runDir(Seq(("a", 1L, 1L)), right, "nearest", tol = Some(1L)) shouldBe
      Seq(("a", 1L, 1L, None, None, None)) // nearest is 2 away
  }
}
