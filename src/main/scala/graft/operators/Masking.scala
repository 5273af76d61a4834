package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scene health checks and mask algebra (P4-P7).
  *
  * The reference masks by materializing NaNs and unioning boolean masks
  * (`/root/reference/asip_v2/archive.py:205-221`,
  * `tests/test_archive.py:305-414`). Engine mapping: masked = SQL NULL;
  * mask union = boolean OR of indicator columns; all pure row-local
  * predicates that Catalyst pushes into the scan.
  */
object Masking {

  /** P4/P5 — file healthiness (`archive.py:205-221`): the usable span
    * `aoi_lr_sample - max(rm_swath, aoi_ul_sample)` and the AOI height
    * must each fit at least one window. (Variable-presence is a schema
    * check at analysis time in this engine.) */
  def healthy(scenes: DataFrame, window: Int, rmSwath: Int,
              ulSample: String = "aoi_ul_sample", lrSample: String = "aoi_lr_sample",
              ulLine: String = "aoi_ul_line", lrLine: String = "aoi_lr_line"): DataFrame =
    scenes.filter(
      (col(lrSample) - greatest(lit(rmSwath), col(ulSample))) >= window &&
      (col(lrLine) - col(ulLine)) >= window)

  /** P6 — land-distance mask: pixels closer to land than the threshold
    * are masked (`tests/test_archive.py:305-314`). */
  def distanceMask(distance: Column, threshold: Int): Column =
    distance < threshold

  /** P7 — mask union (`np.ma.mask_or` chain,
    * `tests/test_archive.py:316-326`): any contributing mask set → masked.
    * NULL inputs count as masked (reference: invalid values are already
    * NaN-materialized). */
  def unionMasks(masks: Column*): Column =
    masks.map(m => coalesce(m, lit(true))).reduce(_ || _)

  /** Apply a mask by nulling values (NaN-materialization analog,
    * `archive.py:19-20`): value columns become NULL where masked. */
  def applyMask(df: DataFrame, mask: Column, valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(c, when(mask, lit(null)).otherwise(col(c))))
}
