package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Trajectory

/** [[graft.operators.Trajectory]] — gap-based session splitting and
  * deterministic path assembly (ts order, id tie-break, input order
  * irrelevant). */
class TrajectorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("splits on the gap and orders the path by (ts, id)") {
    // user 1: a@0, b@10 | gap ≥ 4h | c@300; user 2: one event.
    // Rows arrive shuffled; two events share ts 10 → id tie-break.
    val ev = Seq(
      (5L, ts(300), 1L, "c"), (1L, ts(0), 1L, "a"),
      (3L, ts(10), 1L, "b2"), (2L, ts(10), 1L, "b1"),
      (9L, ts(7), 2L, "z")).toDF("event_id", "ts", "user_id", "event_type")
    val out = Trajectory.sessionPaths(ev, col("ts"), col("user_id"),
        col("event_type"), col("event_id"), "4 hours")
      .select("user_id", "n_events", "path").as[(Long, Long, String)]
      .collect().toSet
    out shouldBe Set((1L, 3L, "a>b1>b2"), (1L, 1L, "c"), (2L, 1L, "z"))
  }

  test("result is stable under a different input partitioning") {
    val ev = (0 until 60).map { i =>
      (i.toLong, ts(i * 7), (i % 3).toLong, s"e${i % 5}")
    }.toDF("event_id", "ts", "user_id", "event_type")
    val a = Trajectory.sessionPaths(ev.repartition(7), col("ts"),
      col("user_id"), col("event_type"), col("event_id"), "30 minutes")
    val b = Trajectory.sessionPaths(ev.coalesce(1), col("ts"),
      col("user_id"), col("event_type"), col("event_id"), "30 minutes")
    a.exceptAll(b).count() shouldBe 0
    b.exceptAll(a).count() shouldBe 0
  }
}
