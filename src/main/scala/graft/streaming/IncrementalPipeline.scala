package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** §2.10 — the streaming embodiment of the incremental "processed files"
  * pipeline (S4/S5).
  *
  * The reference's ledger (`/root/reference/asip_v2/archive.py:180-203`)
  * is at-least-once per input file with manual idempotence: a JSON list
  * of processed names, rewritten after every file, consulted on restart
  * (`build_dataset.py:26-34`). Structured Streaming's file source gives
  * the same observable semantics with stronger guarantees for free:
  *
  *  - the checkpoint's file-source log IS the ledger (exactly-once per
  *    file across restarts — the reference's crash-resume contract);
  *  - `Trigger.AvailableNow` processes everything currently unprocessed
  *    then stops — precisely one `build_dataset.py` run;
  *  - per-batch output commit mirrors the reference's per-file write
  *    cadence.
  *
  * At 100 TB scale the file-source listing is incremental
  * (`maxFilesPerTrigger` bounds a micro-batch) and the per-scene
  * transform is stateless, so micro-batches parallelize across the
  * cluster exactly like the batch path.
  */
object IncrementalPipeline {

  /** Run one incremental pass: read files under `inputDir` that the
    * checkpoint has not seen, apply `transform` (the per-scene pipeline,
    * e.g. mask→decode→tile), append to `outputDir` partitioned parquet.
    * Blocks until the AvailableNow drain completes. Returns the number of
    * micro-batches executed in this pass (0 = nothing new — the
    * "already processed" fast path of `archive.py:193-195`). */
  def runOnce(spark: SparkSession, inputDir: String, schema: StructType,
              transform: DataFrame => DataFrame,
              outputDir: String, checkpointDir: String,
              format: String = "parquet", glob: String = "*"): Long = {
    var batches = 0L
    val q = spark.readStream
      .format(format)
      .schema(schema)
      .option("pathGlobFilter", glob) // file-source root must be a directory
      .load(inputDir)
      .transform(transform)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batches += 1
        batch.write.mode("append").parquet(outputDir)
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** The observable ledger: distinct source files the checkpoint has
    * committed, equivalent to the reference's `processed_files.json`
    * read back via the output's provenance column. */
  def processedFiles(spark: SparkSession, outputDir: String): DataFrame =
    spark.read.parquet(outputDir)
      .select(col("_source_file")).distinct()

  /** Attach provenance (the input file name) — recorded in the output so
    * the ledger survives independently of the checkpoint. */
  def withProvenance(df: DataFrame): DataFrame =
    df.withColumn("_source_file",
      regexp_extract(input_file_name(), "([^/]+)$", 1))
}
