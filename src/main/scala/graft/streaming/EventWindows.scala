package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming over the `events` stream shape
  * (ts, user_id, event_type, value) — the watermark/window competence
  * extension of SURVEY.md §2.10 (the reference has no event-time
  * semantics; this is engine capability beyond it).
  *
  * Scale notes: watermarked windowed aggregation keeps state only for
  * open windows (late data beyond the watermark is dropped, bounding
  * state); session windows merge per key; the stateful-dedup operator
  * holds one boolean per key with an idle timeout so state is evicted —
  * all three run as incremental partial aggregations over the shuffle
  * keyed by (window/key), the same hash-partitioning story as batch.
  */
object EventWindows {

  /** Watermarked tumbling (or sliding, if `slide` is given) window stats
    * per event type. Append-mode compatible: results finalize when the
    * watermark passes the window end. */
  def windowedStats(events: DataFrame, tsCol: String, watermark: String,
                    windowDur: String, slide: Option[String] = None): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(
        window(col(tsCol), windowDur, slide.getOrElse(windowDur)),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session windows per user: events within `gap` of each other merge
    * into one session (state merges across micro-batches). */
  def sessionStats(events: DataFrame, tsCol: String, watermark: String,
                   gap: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** Stream-static enrichment join + watermarked windowed aggregation:
    * the canonical "enrich the firehose with a dimension table" shape.
    * The dimension side is a BATCH frame — Structured Streaming
    * re-plans the join per micro-batch with no state (a stream-static
    * join is stateless by construction), and the broadcast hint keeps
    * it a map-side hash join: the stream never shuffles for the
    * enrichment, only for the windowed aggregate that follows.
    *
    * `streamKey` derives the dimension key from the event row; `dim`
    * must carry `dimKey` and the `attr` column the windows group by.
    * Append-mode compatible (watermark finalizes windows). */
  def enrichedWindowedStats(events: DataFrame, streamKey: Column,
                            dim: DataFrame, dimKey: String, attr: String,
                            tsCol: String, watermark: String,
                            windowDur: String): DataFrame =
    events.withColumn("_k", streamKey)
      .withWatermark(tsCol, watermark)
      .join(broadcast(dim.select(col(dimKey).as("_k"), col(attr))), Seq("_k"))
      .groupBy(window(col(tsCol), windowDur), col(attr))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(attr), col("n"), col("sum_value"))

  /** Watermarked stream-stream interval join — the streaming counterpart
    * of the batch as-of join ([[graft.operators.AsOf]], q59): each left
    * row pairs with the right rows for the same key whose event time
    * falls in `[left.ts - maxAge, left.ts]`.
    *
    * Both sides MUST be watermarked and the join condition carries the
    * time bounds — that is what lets the engine age right-side state out
    * once the left watermark passes `rTs + maxAge` (state is bounded by
    * watermark + maxAge, not by stream length) and, for outer joins,
    * emit unmatched left rows once no future match is possible. The join
    * shuffles both sides by the key column — the same hash-partitioning
    * story as the batch shape, incrementalized.
    *
    * Column names must be disjoint across the two frames (rename before
    * calling); semantics differ from as-of in that EVERY in-range right
    * row pairs (interval join), not just the latest — compose with a
    * downstream max_by for as-of-style enrichment. */
  def intervalJoin(left: DataFrame, lKey: String, lTs: String, lWm: String,
                   right: DataFrame, rKey: String, rTs: String, rWm: String,
                   maxAge: String, joinType: String = "leftOuter"): DataFrame =
    left.withWatermark(lTs, lWm)
      .join(right.withWatermark(rTs, rWm),
        col(lKey) === col(rKey) &&
          col(rTs) >= col(lTs) - expr(s"INTERVAL $maxAge") &&
          col(rTs) <= col(lTs),
        joinType)

  /** Streaming first-occurrence dedup via flatMapGroupsWithState: one
    * boolean of state per key — the streaming analog of the exact-dedup
    * keeper (Dedup.exactGroups) and the custom-state
    * (`KeyValueGroupedDataset`) extension point.
    *
    * `idleTimeout = Some(duration)` evicts state for keys idle that long
    * (bounds state at 100 TB key cardinality; a re-arriving evicted key
    * is emitted again — the usual TTL'd-dedup trade-off). NOTE the
    * timeout keeps the micro-batch engine ticking even with no input
    * (pending timers schedule empty batches), so drain-style tests and
    * AvailableNow runs should pass None. */
  def dedupFirstSeen[T](events: Dataset[T], key: T => String,
                        idleTimeout: Option[String] = None)
                       (implicit enc: Encoder[T]): Dataset[T] = {
    implicit val stringEnc: Encoder[String] = Encoders.STRING
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val timeoutConf = idleTimeout
      .map(_ => GroupStateTimeout.ProcessingTimeTimeout())
      .getOrElse(GroupStateTimeout.NoTimeout())
    events
      .groupByKey(key)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append(), timeoutConf) {
        (_: String, rows: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            // refresh on every arrival so this is a true IDLE timeout:
            // without it, hot keys are evicted a fixed TTL after first
            // sight and then wrongly re-emitted as "first seen".
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.empty
          }
          else {
            state.update(true)
            idleTimeout.foreach(state.setTimeoutDuration)
            rows.take(1)
          }
      }
  }

  /** Input/output rows for [[runningTally]]. */
  case class TallyIn(user_id: Long, value: Double)
  case class TallyOut(user_id: Long, n_seen: Long, max_value: Double)

  /** Per-key running tally via `transformWithState` — the Spark-4
    * arbitrary-state API (StatefulProcessor + typed ValueState),
    * successor of [[dedupFirstSeen]]'s flatMapGroupsWithState. Each
    * micro-batch emits the key's CUMULATIVE (count, max) so far; the
    * stream's final answer is the per-key MAX over emissions — an
    * arrival-order-insensitive contract (cumulative count and max are
    * both monotone), which is what makes the operator oracle-gateable.
    *
    * Requires the RocksDB state store provider (a transformWithState
    * constraint) — callers set
    * `spark.sql.streaming.stateStore.providerClass` for the drain; see
    * q120. State per key is one (long, double) pair; at 100 TB key
    * cardinality bound state with a TTLConfig instead of NONE. */
  def runningTally(events: Dataset[TallyIn]): Dataset[TallyOut] = {
    import org.apache.spark.sql.streaming.{StatefulProcessor, TimeMode, TTLConfig, ValueState}
    implicit val outEnc: Encoder[TallyOut] = Encoders.product[TallyOut]
    val processor = new StatefulProcessor[Long, TallyIn, TallyOut] {
      @transient private var st: ValueState[(Long, Double)] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[(Long, Double)]("tally",
          Encoders.product[(Long, Double)], TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[TallyIn],
          timers: org.apache.spark.sql.streaming.TimerValues): Iterator[TallyOut] = {
        var (n, mx) =
          if (st.exists()) st.get() else (0L, Double.NegativeInfinity)
        rows.foreach { r => n += 1L; mx = math.max(mx, r.value) }
        st.update((n, mx))
        Iterator.single(TallyOut(key, n, mx))
      }
    }
    implicit val longEnc: Encoder[Long] = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .transformWithState(processor, TimeMode.None(), OutputMode.Append())
  }
}
