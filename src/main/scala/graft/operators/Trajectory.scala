package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** L59 — trajectory assembly: collapse an event stream into per-session
  * ordered action paths — the "build agent/interaction trajectories from
  * raw logs" step of a training-data pipeline (each session becomes one
  * sequence example).
  *
  * Sessions are gap-based ([[session_window]], the q41 semantics); the
  * path is the event-type sequence ordered by (ts, tie) — the tie column
  * MUST be unique within a session (an event id) so the assembled string
  * is deterministic under any partitioning.
  *
  * 100 TB shape: ONE user-keyed exchange (the session-window aggregate
  * merges adjacent windows in-state); per-session state is bounded by the
  * session's own event count — the same bound any sequence-example
  * builder needs to hold a session in memory. The sort is per-group
  * (array_sort over the collected structs), never a global order-by.
  */
object Trajectory {

  def sessionPaths(events: DataFrame, ts: Column, user: Column,
                   etype: Column, tie: Column, gap: String): DataFrame =
    events
      .groupBy(session_window(ts, gap), user.as("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(ts.as("ts"), tie.as("tie"),
              etype.as("et")))),
            x => x.getField("et")),
          ">").as("path"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("n_events"), col("path"))
}
