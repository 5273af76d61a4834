package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** [[graft.operators.RangeJoin]] — the binned equi-join rewrite of
  * point-in-interval and interval-overlap joins (L109, q155).
  * Differential: every case is checked against a naive nested-loop
  * reference over the same rows, across bucket widths, so the binning
  * can neither drop a qualifying pair (interval under-registered in its
  * buckets) nor emit one twice (the uniqueness law). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // Deterministic pseudo-random fixture: keys cluster, times collide,
  // intervals vary in length up to the bucket width.
  private val rnd = new scala.util.Random(42)
  private val us = 1000000L
  private def tsCol(c: String) = timestamp_micros(col(c))

  private val points: Seq[(Long, Long, Long)] = // (key, pid, t)
    (0L until 400L).map(i => (rnd.nextInt(8).toLong, i, rnd.nextInt(2000).toLong * us))
  private val intervals: Seq[(Long, Long, Long, Long)] = // (key, iid, s, e)
    (0L until 150L).map { i =>
      val s = rnd.nextInt(2000).toLong * us
      // includes empty (len 0) and full-bucket-width intervals
      (rnd.nextInt(8).toLong, i, s, s + rnd.nextInt(301).toLong * us)
    }

  private def pointsDf: DataFrame = points.toDF("k", "pid", "pt")
    .select(col("k"), col("pid"), tsCol("pt").as("pt"))
  private def intervalsDf: DataFrame = intervals.toDF("k", "iid", "s", "e")
    .select(col("k"), col("iid"), tsCol("s").as("s"), tsCol("e").as("e"))

  private val expectedPairs: Set[(Long, Long)] = (for {
    (pk, pid, t) <- points
    (ik, iid, s, e) <- intervals
    if pk == ik && t >= s && t < e
  } yield (pid, iid)).toSet

  test("pointInInterval matches the nested-loop reference exactly, at " +
      "several bucket widths (incl. buckets smaller than the intervals)") {
    for (bucketSec <- Seq(300L, 500L, 1000L, 7919L)) {
      val got = RangeJoin.pointInInterval(pointsDf, "pt", intervalsDf,
          "s", "e", key = "k", bucketMicros = bucketSec * us,
          maxSpanBuckets = 16)
        .select("pid", "iid").as[(Long, Long)].collect()
      withClue(s"bucket=${bucketSec}s: ") {
        got.length shouldBe got.toSet.size // each pair exactly once
        got.toSet shouldBe expectedPairs
      }
    }
  }

  test("intervalOverlap matches the nested-loop reference exactly and " +
      "emits each overlapping pair once (first-shared-bucket law)") {
    val a = intervals.take(70)
    val b = intervals.drop(70)
    val expected = (for {
      (ak, aid, as_, ae) <- a
      (bk, bid, bs, be) <- b
      if ak == bk && as_ < be && bs < ae && ae > as_ && be > bs
    } yield (aid, bid)).toSet
    val adf = a.toDF("k", "aid", "as", "ae")
      .select(col("k"), col("aid"), tsCol("as").as("as"), tsCol("ae").as("ae"))
    val bdf = b.toDF("k", "bid", "bs", "be")
      .select(col("k"), col("bid"), tsCol("bs").as("bs"), tsCol("be").as("be"))
    for (bucketSec <- Seq(300L, 1000L)) {
      val got = RangeJoin.intervalOverlap(adf, "as", "ae", bdf, "bs", "be",
          key = "k", bucketMicros = bucketSec * us, maxSpanBuckets = 16)
        .select("aid", "bid").as[(Long, Long)].collect()
      withClue(s"bucket=${bucketSec}s: ") {
        got.length shouldBe got.toSet.size
        got.toSet shouldBe expected
      }
    }
  }

  test("the q155 shape plans an equi hash join, never a nested loop") {
    val plan = RangeJoin.pointInInterval(pointsDf, "pt", intervalsDf,
        "s", "e", key = "k", bucketMicros = 1000L * us)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("an interval spanning more buckets than maxSpanBuckets fails " +
      "loudly instead of fanning out") {
    val iv = Seq((1L, 1L, 0L, 400L * us)).toDF("k", "iid", "s", "e")
      .select(col("k"), col("iid"), tsCol("s").as("s"), tsCol("e").as("e"))
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pointsDf, "pt", iv, "s", "e",
        key = "k", bucketMicros = 10L * us, maxSpanBuckets = 4).collect()
    }
    ex.getMessage should include("RangeJoin")
  }

  test("reserved internal column names are rejected up front") {
    val bad = pointsDf.withColumn("_rj_b", lit(1))
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.pointInInterval(bad, "pt", intervalsDf, "s", "e",
        key = "k", bucketMicros = 1000L * us)
  }
}
