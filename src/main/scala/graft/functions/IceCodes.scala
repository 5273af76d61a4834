package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SIGRID-3 ice-chart codec as pure Catalyst Column expressions.
  *
  * Re-expresses the reference's scalar encoders
  * (`/root/reference/asip_v2/hot_encoding_utils.py:10-145`) and the
  * `polygon_codes` text parser (`/root/reference/asip_v2/archive.py:223-248`)
  * as expression trees — CASE WHEN + arithmetic only, so everything constant-
  * folds, prunes, and whole-stage-codegens. No UDF anywhere on this path:
  * at 100 TB the decode runs once per *polygon id* (a few hundred rows per
  * scene), then fans out to pixels through a broadcast hash join (J1).
  */
object IceCodes {

  /** Stage-of-development → class index (F8).
    *
    * Mirrors `ice_type` (`hot_encoding_utils.py:10-41`): 0 → 0 (ice free),
    * 81-85 → 1 (young), 86-93 → 2 (first-year), 95-97 → 3 (multi-year),
    * anything else → NULL (the Python returns `None`).
    * NOTE the reference's docstring lists different class names than the
    * code computes; per SURVEY.md §2.8 F8 we implement the *code*.
    */
  def iceType(stage: Column): Column =
    when(stage === 0, 0)
      .when(stage.between(81, 85), 1)
      .when(stage.between(86, 93), 2)
      .when(stage.between(95, 97), 3)

  /** One-hot binary encoding (F9), `hot_encoding_utils.py:44-95`.
    *
    * Emits `array(r0,r1,r2,r3)` of ints. Semantics replicated exactly,
    * including the negative-index quirk: fractions accumulate at
    * `f[icetype-1]`, so an ice-free component (`icetype==0`) credits
    * `f[-1]` — the multi-year slot (SURVEY.md §2.8 F9).
    */
  // f[j] collects ci from components whose (icetype - 1) mod 3 == j.
  private def binContrib(ci: Column, si: Column, slot: Int): Column = {
    val t = iceType(si)
    val hits = if (slot == 2) (t === 3) || (t === 0) else t === (slot + 1)
    when((ci =!= -9) && hits, ci).otherwise(0)
  }

  def oneHotBinary(ct: Column, ca: Column, sa: Column,
                   cb: Column, sb: Column,
                   cc: Column, sc: Column,
                   minCt: Int = 10): Column = {
    val f = (0 to 2).map(j =>
      binContrib(ca, sa, j) + binContrib(cb, sb, j) + binContrib(cc, sc, j))
    val maxF = greatest(f(0), f(1), f(2))
    // np.argmax keeps the FIRST maximum (hot_encoding_utils.py:91).
    val argmaxPlus1 =
      when(f(0) === maxF, 1).when(f(1) === maxF, 2).otherwise(3)
    val icetype = when(maxF === 0, iceType(sa)).otherwise(argmaxPlus1)
    // icetype NULL → all comparisons NULL → all-zero vector (Python: the
    // `if icetype is not None` guard leaves result == [0,0,0,0]).
    val slots = (0 to 3).map(k => when(icetype === k, 1).otherwise(0))
    when(ct < minCt, array(lit(1), lit(0), lit(0), lit(0)))
      .otherwise(array(slots: _*))
  }

  /** [[oneHotBinary]] as a DataFrame transform emitting int columns
    * `r0..r3` — the codegen-friendly form. The single-Column variant
    * duplicates the `f` sums into `greatest`, the argmax chain, and all
    * four slot indicators; subexpression elimination then pools the whole
    * forest into ONE generated method, which exceeds janino's 64 KB limit
    * and drops the stage to interpreted execution (VERDICT r1 perf q20).
    * Materializing `f0..f2` and `itype` as real columns keeps project
    * boundaries (CollapseProject won't inline non-cheap, multiply-
    * referenced expressions), so every generated method stays small.
    */
  def withOneHotBinary(df: DataFrame,
                       ct: Column, ca: Column, sa: Column,
                       cb: Column, sb: Column,
                       cc: Column, sc: Column,
                       minCt: Int = 10): DataFrame = {
    val withF = df
      .withColumn("_f0", binContrib(ca, sa, 0) + binContrib(cb, sb, 0) + binContrib(cc, sc, 0))
      .withColumn("_f1", binContrib(ca, sa, 1) + binContrib(cb, sb, 1) + binContrib(cc, sc, 1))
      .withColumn("_f2", binContrib(ca, sa, 2) + binContrib(cb, sb, 2) + binContrib(cc, sc, 2))
    val maxF = greatest(col("_f0"), col("_f1"), col("_f2"))
    val argmaxPlus1 = when(col("_f0") === maxF, 1)
      .when(col("_f1") === maxF, 2).otherwise(3)
    val withT = withF.withColumn("_itype",
      when(maxF === 0, iceType(sa)).otherwise(argmaxPlus1))
    (0 to 3).foldLeft(withT) { (d, k) =>
      d.withColumn(s"r$k",
        when(ct < minCt, if (k == 0) 1 else 0)
          .otherwise(when(col("_itype") === k, 1).otherwise(0)))
    }.drop("_f0", "_f1", "_f2", "_itype")
  }

  /** One-hot continuous encoding (F10), `hot_encoding_utils.py:98-145`.
    *
    * Emits `array(r0,r1,r2,r3)` of doubles. Partial concentrations
    * accumulate at `result[icetype]` (no negative-index quirk here);
    * all-zero fallback sets `r0 = 1 - ct/100` then `r[iceType(sa)] = ct/100`
    * (which *overwrites* r0 when iceType(sa)==0); otherwise
    * `r0 = 1 - (r1+r2+r3)`.
    */
  def oneHotContinuous(ct: Column, ca: Column, sa: Column,
                       cb: Column, sb: Column,
                       cc: Column, sc: Column): Column = {
    def contrib(ci: Column, si: Column, k: Int): Column =
      when((ci =!= -9) && (iceType(si) === k), ci.cast("double") / 100.0)
        .otherwise(0.0)
    val r = (0 to 3).map(k =>
      contrib(ca, sa, k) + contrib(cb, sb, k) + contrib(cc, sc, k))
    val maxR = greatest(r: _*)
    val tSa = iceType(sa)
    val fallback0 =
      when(tSa === 0, ct.cast("double") / 100.0)
        .otherwise(lit(1.0) - ct.cast("double") / 100.0)
    val fallbackK = (1 to 3).map(k =>
      when(tSa === k, ct.cast("double") / 100.0).otherwise(0.0))
    when(maxR === 0.0, array((fallback0 +: fallbackK): _*))
      .otherwise(array((lit(1.0) - (r(1) + r(2) + r(3))) +: (1 to 3).map(r): _*))
  }

  /** Parse raw `polygon_codes` text rows (F1), `archive.py:229-248` +
    * `tests/test_archive.py:287-303`: `id;CT;CA;SA;FA;CB;SB;FB;CC;SC;FC;…`,
    * first row is the header. Input df needs (`scene`, `row`); emits the
    * typed dimension table of §1.4 (`ice_codes`).
    */
  def parsePolygonCodes(raw: DataFrame, sceneCol: String = "scene",
                        rowCol: String = "row"): DataFrame = {
    val fields = Seq("poly_id", "ct", "ca", "sa", "fa",
                     "cb", "sb", "fb", "cc", "sc", "fc")
    val parts = split(col(rowCol), ";")
    // try_cast, not cast: under ANSI a malformed field would fail the
    // whole job (and constant folding can even evaluate the cast over a
    // not-yet-filtered literal header row at plan time). A robust parser
    // yields NULL for junk — at 100 TB one bad line must not kill the run.
    val typed = fields.zipWithIndex.map { case (f, i) =>
      element_at(parts, i + 1).try_cast("int").as(f)
    }
    raw.filter(!col(rowCol).startsWith("id;")) // drop header row
      .select(col(sceneCol) +: typed: _*)
  }

  /** Attach the configured one-hot encoding as 4 columns `r0..r3` (F11 —
    * encoding dispatch is plan-build-time, `archive.py:241-245`). */
  def encode(codes: DataFrame, encoding: String): DataFrame = {
    val c = (n: String) => col(n)
    val vec = encoding match {
      case "binary" =>
        oneHotBinary(c("ct"), c("ca"), c("sa"), c("cb"), c("sb"), c("cc"), c("sc"))
          .cast("array<double>")
      case "continous" | "continuous" =>
        oneHotContinuous(c("ct"), c("ca"), c("sa"), c("cb"), c("sb"), c("cc"), c("sc"))
      case other => throw new IllegalArgumentException(
        s"unknown encoding '$other' (expected binary|continous)")
    }
    codes.withColumn("ice_vec", vec)
      .select(codes.columns.toIndexedSeq.map(col) ++
        (0 to 3).map(k => element_at(col("ice_vec"), k + 1).as(s"r$k")): _*)
  }
}
