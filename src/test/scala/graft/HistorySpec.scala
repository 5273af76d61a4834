package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.History

/** [[graft.operators.History]] — SCD2 laws: runs of equal attributes
  * collapse, intervals are half-open and chain (valid_to = next
  * valid_from), exactly one current row per key, null attributes
  * compare null-safely, and the whole build is ONE key-hashed
  * exchange feeding both windows. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  private lazy val changes = Seq(
    (1L, Option("a"), ts(0), 1L),
    (1L, Option("a"), ts(1), 2L),   // same run
    (1L, Option("b"), ts(2), 3L),   // change
    (1L, Option("b"), ts(3), 4L),
    (1L, Option("a"), ts(4), 5L),   // back to a — NEW run, not merged
    (2L, None,        ts(0), 6L),   // null attr run
    (2L, None,        ts(1), 7L),
    (2L, Option("x"), ts(2), 8L)
  ).toDF("k", "a", "t", "o")

  private lazy val hist = History.scd2(changes,
    col("k"), col("a"), col("t"), col("o"))
    .orderBy("key", "valid_from").cache()

  test("runs collapse; revisited values start a new interval") {
    val k1 = hist.where(col("key") === 1).select("attr").as[String].collect()
    k1 shouldBe Array("a", "b", "a")
  }

  test("intervals chain: valid_to equals the next interval's valid_from") {
    val rows = hist.where(col("key") === 1)
      .select("valid_from", "valid_to").collect()
    rows.sliding(2).foreach { case Array(cur, nxt) =>
      cur.getTimestamp(1) shouldBe nxt.getTimestamp(0)
    }
    rows.last.isNullAt(1) shouldBe true
  }

  test("exactly one current row per key, and it is the last run") {
    val cur = hist.where(col("is_current") === 1L)
      .select("key", "attr").as[(Long, String)].collect().toMap
    cur shouldBe Map(1L -> "a", 2L -> "x")
  }

  test("null attribute forms its own run (null-safe change detection)") {
    val k2 = hist.where(col("key") === 2)
      .select("attr", "is_current").collect()
    k2.length shouldBe 2
    k2.head.isNullAt(0) shouldBe true
    k2.head.getLong(1) shouldBe 0L
  }

  test("one exchange, one sort: both windows share the key partitioning") {
    val p = History.scd2(changes, col("k"), col("a"), col("t"), col("o"))
      .queryExecution.executedPlan.toString
    p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    p.linesIterator.count(_.contains("Sort ")) shouldBe 1
    p.linesIterator.count(_.contains("Window ")) shouldBe 2
  }
}
