package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join (L109): point-in-interval and interval-overlap
  * joins re-expressed as EQUI joins on `(key, time bucket)` so Catalyst
  * plans a hash join — never the `BroadcastNestedLoopJoin` a raw
  * inequality condition degenerates to (which is a per-executor scan of
  * the entire build side for every probe row: quadratic in practice,
  * the single most common scale-killer in temporal analytics).
  *
  * The trick (the standard production range-join rewrite — Spark has no
  * native range-join optimization; Databricks ships the same idea as a
  * hint): quantize time into fixed buckets of `bucketMicros`; an
  * interval registers in every bucket it overlaps, a point in exactly
  * one, and the exact predicate re-checks inside the bucket-matched
  * candidates. Correctness never depends on the bucket width — only the
  * candidate count does. With `bucketMicros >= max interval length`
  * each interval lands in at most 2 buckets, so shuffle volume is at
  * most 2x the interval count plus 1x the point count, each exchange
  * hash-keyed on `(key, bucket)` — the plan survives a 1000-executor
  * 100 TB run because every candidate pair meets inside one bucket of
  * one key, and AQE's skew split applies to the bucket grain.
  *
  * Pair-uniqueness law (spec-pinned): [[pointInInterval]] emits each
  * qualifying (point, interval) pair EXACTLY once because the point's
  * bucket is unique. [[intervalOverlap]] joins on the pair's FIRST
  * shared bucket — `floor(max(aStart, bStart) / w)`, a pure function of
  * the pair — so overlapping pairs meet exactly once WITHOUT a
  * dedup/distinct pass (the naive both-sides-explode join multiplies
  * each pair by its shared-bucket count and needs a second exchange to
  * dedup; this shape needs neither).
  */
object RangeJoin {

  private val Reserved = Seq("_rj_b", "_rj_bs", "_rj_be")

  private def guard(df: DataFrame, what: String): Unit = {
    val clash = df.columns.toSeq.intersect(Reserved)
    require(clash.isEmpty,
      s"$what columns collide with RangeJoin internals: ${clash.mkString(", ")}")
  }

  /** Buckets covered by `[startTs, endTs)`, loudly rejecting spans wider
    * than `maxSpanBuckets` (an interval orders of magnitude longer than
    * the bucket width would silently fan out that many copies — the
    * misuse should fail the job, not melt it). The raise_error lives
    * inside the consumed expression so the optimizer cannot prune it. */
  private def bucketSeq(startUs: org.apache.spark.sql.Column,
                        endUs: org.apache.spark.sql.Column,
                        bucketMicros: Long, maxSpanBuckets: Int) = {
    val bs = floor(startUs / bucketMicros)
    val be = floor((endUs - 1) / bucketMicros)
    when(be - bs < maxSpanBuckets, sequence(bs, be))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans >= $maxSpanBuckets buckets of " +
          s"$bucketMicros us (starting "), startUs,
        lit(" us) - widen bucketMicros or raise maxSpanBuckets")
      ).cast("string")).cast("array<bigint>"))
  }

  /** Each `points` row pairs with every `intervals` row of the same
    * `key` whose half-open `[startTs, endTs)` contains the point's
    * `ptTs` (all three are TIMESTAMP columns; empty intervals with
    * `endTs <= startTs` match nothing, per half-open semantics).
    * Returns the inner-join rows with all columns from both inputs —
    * column names other than `key` must be disjoint.
    *
    * Pick `bucketMicros` >= the longest interval: fan-out is then <= 2
    * buckets per interval and the join carries at most
    * `2 * |intervals| + |points|` rows into its exchanges. */
  def pointInInterval(points: DataFrame, ptTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      key: String, bucketMicros: Long,
                      maxSpanBuckets: Int = 4): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    guard(points, "points"); guard(intervals, "intervals")
    val p = points.withColumn("_rj_b",
      floor(unix_micros(col(ptTs)) / bucketMicros))
    val iv = intervals
      .where(col(endTs) > col(startTs))
      .withColumn("_rj_b", explode(bucketSeq(
        unix_micros(col(startTs)), unix_micros(col(endTs)),
        bucketMicros, maxSpanBuckets)))
    p.join(iv, Seq(key, "_rj_b"))
      .where(col(ptTs) >= col(startTs) && col(ptTs) < col(endTs))
      .drop("_rj_b")
  }

  /** Each `a` row pairs with every `b` row of the same `key` whose
    * half-open interval overlaps it: `aStart < bEnd && bStart < aEnd`.
    * Both sides explode to their covered buckets; the pair survives
    * only in the FIRST bucket both share — `floor(max(starts) / w)` —
    * so each overlapping pair is emitted exactly once, no dedup pass.
    * Column names other than `key` must be disjoint across `a`/`b`. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
                      b: DataFrame, bStart: String, bEnd: String,
                      key: String, bucketMicros: Long,
                      maxSpanBuckets: Int = 4): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    guard(a, "a"); guard(b, "b")
    def explodeBuckets(df: DataFrame, s: String, e: String): DataFrame =
      df.where(col(e) > col(s))
        .withColumn("_rj_b", explode(bucketSeq(
          unix_micros(col(s)), unix_micros(col(e)),
          bucketMicros, maxSpanBuckets)))
    explodeBuckets(a, aStart, aEnd)
      .join(explodeBuckets(b, bStart, bEnd), Seq(key, "_rj_b"))
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd) &&
        col("_rj_b") === floor(
          greatest(unix_micros(col(aStart)), unix_micros(col(bStart)))
            / bucketMicros))
      .drop("_rj_b")
  }
}
