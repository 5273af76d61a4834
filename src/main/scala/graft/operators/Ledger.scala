package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Incremental "processed files" ledger (S4/S5/U1/J2).
  *
  * The reference keeps a JSON list of already-built inputs and diffs the
  * input directory against it on every run
  * (`/root/reference/asip_v2/archive.py:180-203`). Batch embodiment: a
  * LEFT ANTI join against the ledger table — broadcastable (the ledger is
  * tiny relative to the data), so at 100 TB the scan of candidates never
  * shuffles. The streaming embodiment with identical semantics is a file
  * source + checkpoint (see [[graft.streaming.IncrementalPipeline]]).
  */
object Ledger {

  /** U1/J2 — items not yet in the ledger. `keyCols` identifies an item
    * (the reference uses the file name). */
  def unprocessed(candidates: DataFrame, ledger: DataFrame,
                  keyCols: Seq[String]): DataFrame =
    candidates.join(broadcast(ledger.select(keyCols.map(col): _*).distinct()),
      keyCols, "left_anti")

  /** S5 — append newly processed keys (idempotent: distinct union).
    * The reference rewrites the whole JSON each time
    * (`archive.py:197-203`); a table-append + distinct-on-read gives the
    * same observable set without the O(n) rewrite. */
  def appendProcessed(ledger: DataFrame, processed: DataFrame,
                      keyCols: Seq[String]): DataFrame =
    ledger.select(keyCols.map(col): _*)
      .unionByName(processed.select(keyCols.map(col): _*))
      .distinct()

  /** Persist a ledger delta (one parquet append per micro-run, mirroring
    * the per-file commit cadence of `build_dataset.py:31-33`). */
  def commit(processed: DataFrame, path: String): Unit =
    processed.write.mode(SaveMode.Append).parquet(path)
}
