package graft

import org.apache.spark.sql.functions._
import graft.operators.{GridOps, Masking}

/** Goldens transliterated from the reference unit tests
  * (`/root/reference/asip_v2/tests/test_archive.py`): decimation
  * (:27-44), padding (:46-57), mask union (:305-326), mask downsample
  * (:379-395). Box-mean uses float semantics (real pipeline data is
  * float32); the reference test's integer-truncation artifact is a SciPy
  * int-dtype quirk documented out of scope (GridOps.blockMean doc).
  */
class GridOpsSpec extends SparkSpec {
  import spark.implicits._

  /** arange(rows*cols).reshape(rows, cols) as a long-format grid. */
  private def arangeGrid(rows: Int, cols: Int) =
    (0 until rows * cols)
      .map(i => (i / cols, i % cols, i.toDouble))
      .toDF("line", "sample", "value")

  test("decimate: 5x5 step 2 golden [[0,2],[10,12]] (test_archive.py:36-44)") {
    val out = GridOps.decimate(arangeGrid(5, 5), 2, lit(5), lit(5))
    toMatrix(out, 2, 2) shouldBe Array(Array(0.0, 2.0), Array(10.0, 12.0))
  }

  test("decimate: step 1 is identity (test_archive.py:31-35)") {
    val out = GridOps.decimate(arangeGrid(2, 2), 1, lit(2), lit(2))
    toMatrix(out, 2, 2) shouldBe Array(Array(0.0, 1.0), Array(2.0, 3.0))
  }

  test("decimate: ragged trim gates BOTH axes on the line count only (VERDICT r1 #3)") {
    // 9x10 step 3: line keeps ceil(9/3)=3 (not ragged) -> NO trim, sample
    // keeps ceil(10/3)=4 -> 3x4 output (reference checks shape[0] only).
    val out = GridOps.decimate(arangeGrid(9, 10), 3, lit(9), lit(10))
    out.count() shouldBe 12
    // 10x9 step 3: line keeps ceil(10/3)=4 (ragged) -> trim BOTH -> 3x2.
    val out2 = GridOps.decimate(arangeGrid(10, 9), 3, lit(10), lit(9))
    out2.count() shouldBe 6
    out2.agg(max("line"), max("sample")).as[(Int, Int)].head() shouldBe ((2, 1))
  }

  test("blockMean: 5x5 step 2 float means [[3,5],[13,15]]") {
    val out = GridOps.blockMean(arangeGrid(5, 5), 2, Seq("value"), lit(5), lit(5))
    toMatrix(out, 2, 2) shouldBe Array(Array(3.0, 5.0), Array(13.0, 15.0))
  }

  test("blockMean reflect: 7x7 step 2 matches SciPy reflect boundary " +
      "(uniform_filter mode='reflect', test_archive.py:76-97 float semantics)") {
    // golden from np.pad(a, (0, s-1), mode='symmetric') tile means —
    // bit-identical to scipy.ndimage.uniform_filter(origin=-(s//2))[::s]
    val out = GridOps.blockMean(arangeGrid(7, 7), 2, Seq("value"),
      lit(7), lit(7), reflect = true)
    toMatrix(out, 4, 4) shouldBe Array(
      Array(4.0, 6.0, 8.0, 9.5),
      Array(18.0, 20.0, 22.0, 23.5),
      Array(32.0, 34.0, 36.0, 37.5),
      Array(42.5, 44.5, 46.5, 48.0))
  }

  test("blockMean reflect: 7x7 step 3 — overhang 2 mirrors PAST the last " +
      "anchor, so edge pixels feed two tiles") {
    val out = GridOps.blockMean(arangeGrid(7, 7), 3, Seq("value"),
      lit(7), lit(7), reflect = true)
    toMatrix(out, 3, 3) shouldBe Array(
      Array(8.0, 11.0, 38.0 / 3.0),
      Array(29.0, 32.0, 101.0 / 3.0),
      Array(122.0 / 3.0, 131.0 / 3.0, 136.0 / 3.0))
  }

  test("blockMean reflect: trimmed (ragged) config equals the plain mode — " +
      "all kept tiles are interior") {
    val plain = GridOps.blockMean(arangeGrid(5, 5), 2, Seq("value"), lit(5), lit(5))
    val refl = GridOps.blockMean(arangeGrid(5, 5), 2, Seq("value"), lit(5), lit(5),
      reflect = true)
    toMatrix(refl, 2, 2) shouldBe toMatrix(plain, 2, 2)
    // and on an exact multiple (9x9 step 3: no overhang at all)
    val p9 = GridOps.blockMean(arangeGrid(9, 9), 3, Seq("value"), lit(9), lit(9))
    val r9 = GridOps.blockMean(arangeGrid(9, 9), 3, Seq("value"), lit(9), lit(9),
      reflect = true)
    toMatrix(r9, 3, 3) shouldBe toMatrix(p9, 3, 3)
  }

  test("blockAny: 6x6 mask >18, target 3x3 golden (test_archive.py:379-395)") {
    val mask = (0 until 36).map(i => (i / 6, i % 6, i > 18)).toDF("line", "sample", "mask")
    val out = GridOps.blockAny(mask, 2, "mask")
    val m = out.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getBoolean(2))).toMap
    for (i <- 0 until 3; j <- 0 until 3)
      m((i, j)) shouldBe (i >= 1) // rows 1,2 downsampled contain >18
  }

  test("padConstant: pads (1,2,3,4) fill 100 golden (test_archive.py:46-57)") {
    val sub = Seq(("s0", 0, 0, 1.0), ("s0", 0, 1, 2.0), ("s0", 1, 0, 3.0), ("s0", 1, 1, 4.0))
      .toDF("scene", "line", "sample", "value")
    val scenes = Seq("s0").toDF("scene")
    // pads [top=1, bottom=2, left=3, right=4] on 2x2 -> 5x9 canvas, offset (1,3)
    val out = GridOps.padConstant(sub, scenes, lit(5), lit(9), lit(1), lit(3), Seq("value"), 100.0)
    val expected = Array(
      Array(100.0, 100, 100, 100, 100, 100, 100, 100, 100),
      Array(100.0, 100, 100, 1, 2, 100, 100, 100, 100),
      Array(100.0, 100, 100, 3, 4, 100, 100, 100, 100),
      Array(100.0, 100, 100, 100, 100, 100, 100, 100, 100),
      Array(100.0, 100, 100, 100, 100, 100, 100, 100, 100))
    toMatrix(out, 5, 9) shouldBe expected
  }

  test("mask union: distance threshold masks near-land rows (test_archive.py:305-314)") {
    val px = Seq((0, 0, 10), (0, 1, 11), (1, 0, 32), (1, 1, 33))
      .toDF("line", "sample", "distance")
    val out = px.withColumn("masked",
      Masking.unionMasks(Masking.distanceMask(col("distance"), 20)))
    val m = out.collect().map(r => ((r.getInt(0), r.getInt(1)), r.getBoolean(3))).toMap
    m((0, 0)) shouldBe true; m((0, 1)) shouldBe true
    m((1, 0)) shouldBe false; m((1, 1)) shouldBe false
  }

  test("mask union: null (masked-value) inputs count as masked (test_archive.py:316-326)") {
    val px = Seq((0, Some(true), Some(false)), (1, None, Some(false)),
        (2, Some(false), None), (3, Some(false), Some(false)))
      .toDF("id", "m1", "m2")
    val out = px.withColumn("masked", Masking.unionMasks(col("m1"), col("m2")))
      .collect().map(r => r.getInt(0) -> r.getBoolean(3)).toMap
    out(0) shouldBe true   // m1 set
    out(1) shouldBe true   // m1 null -> masked
    out(2) shouldBe true   // m2 null -> masked
    out(3) shouldBe false  // nothing set
  }

  test("requireColumns fails fast at plan-build time (archive.py:205-214)") {
    val df = Seq((1, "a")).toDF("id", "name")
    graft.plans.Checks.requireColumns(df, "id", "name") shouldBe df
    val e = intercept[IllegalArgumentException] {
      graft.plans.Checks.requireColumns(df, "id", "polygon_icechart")
    }
    e.getMessage should include("polygon_icechart")
  }

  test("healthy: AOI span must fit a window after swath clamp (archive.py:205-221)") {
    val scenes = Seq(
      ("ok", 0, 100, 0, 100),
      ("narrow", 0, 50, 0, 100),   // sample span 50 < 95
      ("swathed", 90, 190, 0, 100) // span 190-max(3,90)=100 >= 95 -> ok
    ).toDF("scene", "aoi_ul_sample", "aoi_lr_sample", "aoi_ul_line", "aoi_lr_line")
    Masking.healthy(scenes, window = 95, rmSwath = 3)
      .select("scene").as[String].collect().sorted shouldBe Array("ok", "swathed")
  }
}
