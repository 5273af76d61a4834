package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus snapshots (L53) —
  * the "did the ingest mix shift?" monitor a training-data pipeline
  * runs between crawl batches. Per-bin histogram comparison with an
  * INTEGER-EXACT total-variation numerator: for bin i,
  * `|c_a[i]·N_b − c_b[i]·N_a|`, so that
  * `TV = Σ_i num_i / (2·N_a·N_b)` — but no division, logarithm or
  * floating point ever happens inside the operator. PSI/KL-style
  * scores need ln() whose last-ulp behavior differs across engines;
  * the cross-multiplied TV form is bit-identical everywhere (the
  * arithmetic runs in DECIMAL(38,0): c·N ≤ N² overflows int64 past
  * ~3·10⁹ rows — a 100 TB corpus is ~10¹¹).
  *
  * 100 TB shape: one scan per snapshot into a map-combined groupBy on
  * the bin key (shuffle carries ≤bins partial rows per task); the
  * full-outer bin join and the two totals are bin-frame-sized (the
  * totals are keyless sums over the BIN frames — no second corpus
  * scan); both totals broadcast back onto the bins.
  */
object Drift {

  /** Per-bin drift frame: (bin, c_a, c_b, n_a, n_b, drift_num), where
    * drift_num = |c_a·n_b − c_b·n_a| exactly. Bins absent on one side
    * count 0 there (full-outer). Null bins form their own bin. */
  def histogramDrift(a: DataFrame, b: DataFrame, bin: Column): DataFrame = {
    val ca = a.groupBy(bin.as("bin")).agg(count(lit(1)).as("c_a"))
    val cb = b.groupBy(bin.as("bin")).agg(count(lit(1)).as("c_b"))
    val na = ca.agg(coalesce(sum(col("c_a")), lit(0L)).as("n_a"))
    val nb = cb.agg(coalesce(sum(col("c_b")), lit(0L)).as("n_b"))
    ca.join(cb, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
      .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
      .withColumn("drift_num",
        abs(col("c_a").cast("decimal(38,0)") * col("n_b")
          - col("c_b").cast("decimal(38,0)") * col("n_a")))
  }
}
