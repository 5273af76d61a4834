package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-contract pin for the two `events.ts` disk encodings the driver
  * generator has shipped (INT64 nanos; TIMESTAMP(MICROS) since the
  * 2026-08-13 regeneration). Round 5 lost 28 batch queries to an
  * analysis error and all four streaming arms to a SILENT 1000× time
  * collapse because the loaders assumed the nanos layout. These tests
  * fail on any loader that stops adapting to either encoding — batch
  * and, separately, the watermarked streaming path whose failure mode
  * was plausible garbage rather than an error. */
class TsContractSpec extends SparkSpec {

  /** Re-encode the real sf0.001 events rows into a fixture dir with the
    * given ts writer — both layouts carry identical instants. */
  private def fixture(tag: String)(ts: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$tag").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("ts", ts)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private lazy val nanosDir = fixture("nanos")(unix_micros(col("ts")) * 1000L)
  private lazy val microsDir = fixture("micros")(col("ts").cast(TimestampNTZType))

  test("footer probe distinguishes the two encodings") {
    Tables.eventsTsDiskType(spark, nanosDir) shouldBe LongType
    Tables.eventsTsDiskType(spark, microsDir) shouldBe TimestampNTZType
  }

  test("batch loader normalizes both encodings to the same timestamps") {
    val a = Tables.events(spark, nanosDir)
    val b = Tables.events(spark, microsDir)
    a.schema("ts").dataType shouldBe TimestampType
    b.schema("ts").dataType shouldBe TimestampType
    val key = Seq("event_id", "ts", "user_id")
    a.select(key.map(col): _*).except(b.select(key.map(col): _*)).count() shouldBe 0L
    a.count() shouldBe b.count()
  }

  test("streaming windows agree across encodings and actually finalize") {
    // The r5 silent mode: micros read through a LongType stream schema
    // collapsed event-time 1000× and q71 emitted 0 rows. Running the
    // real drain on BOTH fixtures pins non-empty + identical output.
    val q71 = SparkEntry.queries("q71_stream_windows")
    val a = q71(spark, nanosDir)
    val b = q71(spark, microsDir)
    val n = a.count()
    assert(n > 0, "watermarked windows must finalize on the nanos fixture")
    b.count() shouldBe n
    a.except(b).count() shouldBe 0L
  }
}
