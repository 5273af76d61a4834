package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Patch tiling (W1/W9/P8/O2/S6) — the heart of the reference pipeline.
  *
  * `view_as_windows` + per-window NaN rejection
  * (`/root/reference/asip_v2/archive.py:25-32,50-72`) re-expressed for a
  * long-format pixel table. Two regimes:
  *
  *  - `stride == window` (the reference default, `utility.py:81-84`):
  *    TUMBLING — each pixel belongs to exactly one patch, so tiling is a
  *    plain `groupBy(scene, floor(line/w), floor(sample/w))`: one shuffle,
  *    no data duplication. This is the 100 TB path.
  *  - `stride < window`: SLIDING — each pixel is exploded to every covering
  *    patch; duplication factor (w/s)² is explicit and documented
  *    (SURVEY.md §7.4.2).
  *
  * Only *complete* windows are emitted (view_as_windows never yields
  * partial windows), and any window containing a NULL value (the engine's
  * NaN) is rejected (`archive.py:62-65`).
  */
object Tiling {

  /** Assign tumbling patch coords; keeps pixels whose patch fits entirely
    * inside the grid (`extentL`/`extentS` = per-scene dims).
    */
  def tumbling(df: DataFrame, window: Int,
               extentL: Column, extentS: Column,
               line: String = "line", sample: String = "sample"): DataFrame =
    df.withColumn("pi", (col(line) / window).cast("int"))
      .withColumn("pj", (col(sample) / window).cast("int"))
      .filter((col("pi") + 1) * window <= extentL &&
              (col("pj") + 1) * window <= extentS)

  /** Explode each pixel to all covering sliding windows: window i covers
    * lines [i*stride, i*stride + window); valid i also satisfies
    * i*stride + window <= extent (complete windows only).
    */
  def sliding(df: DataFrame, window: Int, stride: Int,
              extentL: Column, extentS: Column,
              line: String = "line", sample: String = "sample"): DataFrame = {
    require(stride >= 1 && stride <= window,
      s"stride $stride must be in [1, window=$window]")
    if (stride == window) return tumbling(df, window, extentL, extentS, line, sample)
    def cover(pos: Column, extent: Column) = {
      val lo = greatest(lit(0), ceil((pos - window + 1).cast("double") / stride).cast("int"))
      val hi = least(floor(pos.cast("double") / stride).cast("int"),
                     floor((extent - window).cast("double") / stride).cast("int"))
      sequence(lo, hi) // empty when lo > hi is not allowed -> guard below
    }
    // The extent >= window guard is load-bearing: without it a scene
    // smaller than the window passes the edge filter (the bound
    // floor((extent-window)/stride)*stride + window stays positive) and
    // cover()'s sequence(lo, hi) runs with lo > hi — which Spark
    // evaluates as a DESCENDING sequence, silently emitting bogus
    // negative-index partial patches. view_as_windows yields zero
    // windows for that shape (TilingLawsSpec pins it).
    df.filter(extentL >= window && extentS >= window &&
              col(line) < (floor((extentL - window).cast("double") / stride) * stride + window) &&
              col(sample) < (floor((extentS - window).cast("double") / stride) * stride + window))
      .withColumn("pi", explode(cover(col(line), extentL)))
      .withColumn("pj", explode(cover(col(sample), extentS)))
  }

  /** J5 — patch ↔ mask-patch alignment
    * (`/root/reference/asip_v2/tests/test_archive.py:449-464`): the mask
    * raster is windowed with the SAME (window, stride) as the data, so
    * mask windows and data windows share the patch index; per-mask-window
    * any() reduces the mask side to one row per patch, and data patches
    * align to their mask patch by an equi join on the patch key. Patches
    * whose mask window contains any true pixel are rejected.
    *
    * Scale shape: the aggregated mask side is ~1/window² of the raster
    * (one row per patch), the join is equi on the patch key — AQE picks
    * broadcast when the per-scene patch count allows, shuffle-hash
    * otherwise; no hint is forced.
    */
  def alignWithMask(dataPatches: DataFrame, tiledMask: DataFrame,
                    maskCol: String,
                    keys: Seq[String] = Seq("scene", "pi", "pj")): DataFrame = {
    val maskAny = tiledMask.groupBy(keys.map(col): _*)
      .agg(max(col(maskCol).cast("int")).as("_mask_any"))
    dataPatches.join(maskAny, keys)
      .filter(col("_mask_any") === 0)
      .drop("_mask_any")
  }

  /** P8/A3 — reject patches containing any NULL in any of `valueCols`,
    * and (dense-grid check) patches not fully populated: surviving groups
    * have exactly window² rows and zero nulls (`archive.py:62-65`).
    * Emits per-patch aggregates supplied by `aggs` alongside the key.
    */
  def aggregatePatches(tiled: DataFrame, window: Int, valueCols: Seq[String],
                       aggs: Seq[Column],
                       keys: Seq[String] = Seq("scene", "pi", "pj")): DataFrame = {
    val nullCount = valueCols
      .map(c => sum(when(col(c).isNull, 1).otherwise(0)))
      .reduce(_ + _)
    tiled.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_n"), (nullCount.as("_nulls") +: aggs): _*)
      .filter(col("_n") === window.toLong * window && col("_nulls") === 0)
      .drop("_n", "_nulls")
  }

  /** W7/B4 — dense per-patch matrix assembly: one `array<array<double>>`
    * per patch, row-major — the `.npz`-sample / tensor hand-off shape
    * (`archive.py:66-70`). Long format everywhere else; this runs only at
    * the sink (SURVEY.md §7.4.1). Requires complete patches (exactly
    * window² cells — run after [[aggregatePatches]]-style filtering);
    * `element_at` over the sorted cell list is O(1) per cell, so assembly
    * is linear in output pixels.
    */
  def patchMatrix(tiled: DataFrame, window: Int, valueCol: String = "value",
                  keys: Seq[String] = Seq("scene", "pi", "pj"),
                  line: String = "line", sample: String = "sample"): DataFrame = {
    val cells = sort_array(collect_list(struct(
      (col(line) % window).cast("int").as("r"),
      (col(sample) % window).cast("int").as("c"),
      col(valueCol).cast("double").as("v"))))
    tiled.groupBy(keys.map(col): _*)
      .agg(cells.as("_cells"))
      .select(keys.map(col) :+
        transform(sequence(lit(0), lit(window - 1)), r =>
          transform(sequence(lit(0), lit(window - 1)), c =>
            element_at(col("_cells"), (r * window + c + 1).cast("int")).getField("v")))
          .as("patch"): _*)
  }

  /** [[patchMatrix]] via the custom [[graft.plans.DenseMatrixAgg]]
    * TypedImperativeAggregate: a flat double buffer scatter-filled in
    * place (no per-row struct boxing, no O(n log n) sort) — the
    * 256×256-patch scale path. Missing cells are NaN (F14 canvas). */
  def patchMatrixDense(tiled: DataFrame, window: Int, valueCol: String = "value",
                       keys: Seq[String] = Seq("scene", "pi", "pj"),
                       line: String = "line", sample: String = "sample"): DataFrame =
    tiled.groupBy(keys.map(col): _*)
      .agg(graft.plans.DenseMatrixAgg.dense_matrix(
        (col(line) % window).cast("int"),
        (col(sample) % window).cast("int"),
        col(valueCol).cast("double"), window).as("patch"))

  /** O2/F6/S6 — deterministic sample naming: row-major (pi, pj) order per
    * scene, 6-digit zero-padded sequence, `{scene}_{seq:06d}`
    * (`archive.py:286-292`). The window sort is per-scene (partitioned),
    * not global.
    */
  def sampleNames(patches: DataFrame, sceneCol: String = "scene"): DataFrame = {
    val w = Window.partitionBy(col(sceneCol)).orderBy(col("pi"), col("pj"))
    patches.withColumn("seq", row_number().over(w) - 1)
      .withColumn("sample_name",
        concat(col(sceneCol), lit("_"), format_string("%06d", col("seq"))))
  }
}
