package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver test tables (see TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf{0.001,0.01,0.1}/`.
  * All driver-contract queries in [[SparkEntry]] read exclusively through
  * here so path handling stays in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** `events.ts` has shipped in two disk encodings across driver testdata
    * generations: parquet TIMESTAMP(NANOS) — which the vectorized reader
    * rejects outright (PARQUET_TYPE_ILLEGAL) unless read as a raw long
    * behind the legacy conf — and plain TIMESTAMP(MICROS), which reads
    * natively. The loader probes the footer and follows the data rather
    * than assuming a generator layout: the round-5 regeneration to
    * micros turned the hard-coded nanos rebuild into an analysis error
    * on 28 queries. Always set the legacy conf BEFORE probing so a nanos
    * file probes as LongType instead of failing the probe itself. */
  private[graft] def eventsTsDiskType(spark: SparkSession, dir: String): org.apache.spark.sql.types.DataType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events").schema("ts").dataType
  }

  /** Normalize a loaded events frame so `ts` is always a session-TZ
    * `TimestampType` at micros precision, whatever the disk encoding:
    *  - INT64 nanos (legacy layout): integral `div` keeps precision
    *    above 2^53 ns ≈ 1970+104 days where a double round-trip loses it;
    *  - TIMESTAMP(MICROS) with isAdjustedToUTC=false (the pyarrow
    *    layout): arrives as TimestampNTZType; the cast is value-exact
    *    because every entry point pins `spark.sql.session.timeZone=UTC`;
    *  - already TimestampType: pass through. */
  private[graft] def normalizeTs(df: DataFrame,
      disk: org.apache.spark.sql.types.DataType): DataFrame = disk match {
    case org.apache.spark.sql.types.LongType =>
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case org.apache.spark.sql.types.TimestampNTZType =>
      df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    case _ => df
  }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"), eventsTsDiskType(spark, dir))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Scale-adaptive fan-out after an unsplittably-NARROW scan — the
    * optimization guide's input-skew rule ("one huge unsplittable
    * file: repartition immediately after the read", §2.5). The driver
    * test tables ship as ONE parquet file with ONE row group per
    * table, so a scan stage — and every map-side operator fused above
    * it (codec synthesis + decode, tokenization, canonical keys) —
    * runs as a single task regardless of core count. The fan-out is
    * derived from the PLANNED scan parallelism vs the box, not from a
    * constant: when the scan already covers most of the cluster
    * (every production layout; any multi-file/multi-row-group input)
    * it is a no-op, so nothing here is tuned to local[32]. */
  def spread[T](ds: org.apache.spark.sql.Dataset[T])
      : org.apache.spark.sql.Dataset[T] = {
    val target = ds.sparkSession.sparkContext.defaultParallelism
    // CONSTRAINT (ADVICE r16): `toRdd.getNumPartitions` plans AND — if
    // the input contains an exchange or subquery under AQE — EXECUTES
    // upstream query stages at build time. Every call site wraps a
    // plain scan+project (exchange-free), where the probe is a pure
    // metadata read; keep it that way — wrap scan-level inputs only.
    val planned = ds.queryExecution.toRdd.getNumPartitions
    if (target <= 1 || planned * 4 >= target) ds
    // hash on every column, not round-robin: a keyless repartition(n)
    // first LOCALLY SORTS its input (SPARK-23207 retry determinism) —
    // on the one-task scans this fan-out exists for, that sort is
    // itself the serial bottleneck. Hashing the full row is one pass,
    // deterministic under retries, and uniform whenever any column
    // varies (these feeds carry unique ids).
    else ds.repartition(target, ds.columns.map(org.apache.spark.sql
      .functions.col).toIndexedSeq: _*)
  }
}
