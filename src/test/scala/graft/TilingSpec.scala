package graft

import org.apache.spark.sql.functions._
import graft.operators.{Reconstruct, Tiling}
import graft.queries.Q

/** Tiling laws + reconstruction goldens.
  *
  * Pinned against `view_as_windows` semantics
  * (`/root/reference/asip_v2/archive.py:25-32,50-72`) and the scatter
  * golden of `tests/test_apply_model.py:49-72`.
  */
class TilingSpec extends SparkSpec {
  import spark.implicits._

  private def grid(rows: Int, cols: Int, scene: String = "s0") =
    (0 until rows * cols)
      .map(i => (scene, i / cols, i % cols, i.toDouble))
      .toDF("scene", "line", "sample", "value")

  test("tumbling: partition law — every pixel of a complete patch appears exactly once") {
    val tiled = Tiling.tumbling(grid(10, 10), 3, lit(10), lit(10))
    // 3 complete patches per axis -> 9 patches x 9 px
    tiled.count() shouldBe 81
    tiled.groupBy("pi", "pj").count().select("count").as[Long]
      .collect().toSet shouldBe Set(9L)
    tiled.select("line", "sample").distinct().count() shouldBe 81
  }

  test("sliding: duplication factor is (w/s)^2 in the interior") {
    val tiled = Tiling.sliding(grid(12, 12), 4, 2, lit(12), lit(12))
    // interior pixel (5,5) covered by 2x2 windows
    tiled.filter(col("line") === 5 && col("sample") === 5).count() shouldBe 4
    // corner pixel (0,0) only by window (0,0)
    tiled.filter(col("line") === 0 && col("sample") === 0).count() shouldBe 1
    // window count: ((12-4)/2+1)^2 = 25
    tiled.select("pi", "pj").distinct().count() shouldBe 25
  }

  test("sliding with stride == window degenerates to tumbling") {
    val a = Tiling.sliding(grid(9, 9), 3, 3, lit(9), lit(9))
    val b = Tiling.tumbling(grid(9, 9), 3, lit(9), lit(9))
    a.exceptAll(b).count() shouldBe 0
    b.exceptAll(a).count() shouldBe 0
  }

  test("aggregatePatches rejects patches containing NULL (archive.py:62-65)") {
    val g = grid(6, 6).withColumn("value",
      when(col("line") === 0 && col("sample") === 1, lit(null).cast("double"))
        .otherwise(col("value")))
    val tiled = Tiling.tumbling(g, 3, lit(6), lit(6))
    val out = Tiling.aggregatePatches(tiled, 3, Seq("value"),
      Seq(Q.dsum(col("value"), 6).as("s")))
    // patch (0,0) has the NULL -> rejected; 3 of 4 survive
    out.count() shouldBe 3
    out.filter(col("pi") === 0 && col("pj") === 0).count() shouldBe 0
  }

  test("reconstruct ∘ tile is identity at stride == window (valid region)") {
    val g = grid(9, 9)
    val tiled = Tiling.tumbling(g, 3, lit(9), lit(9))
    // per-patch dense matrices -> explode back to pixels
    val patches = tiled.groupBy("scene", "pi", "pj")
      .agg(sort_array(collect_list(struct(
        (col("line") % 3).as("r"), (col("sample") % 3).as("c"), col("value")))).as("cells"))
      .select(col("scene"), col("pi"), col("pj"),
        expr("transform(sequence(0,2), r -> transform(sequence(0,2), c -> filter(cells, x -> x.r = r AND x.c = c)[0].value))").as("patch"))
    val rebuilt = Reconstruct.explodePatches(patches, 3)
    rebuilt.count() shouldBe 81
    rebuilt.exceptAll(g.select("scene", "line", "sample", "value")).count() shouldBe 0
  }

  test("scatter golden: 1x1 windows at 4 locs -> [[1,2],[3,4]] (test_apply_model.py:49-72)") {
    val patches = Seq(("s0", 0, 0, 1.0), ("s0", 0, 1, 2.0), ("s0", 1, 0, 3.0), ("s0", 1, 1, 4.0))
      .toDF("scene", "pi", "pj", "pred")
    val px = Reconstruct.scatterScalar(patches, 1, "pred")
    val scenes = Seq("s0").toDF("scene")
    val canvas = Reconstruct.onCanvas(px, scenes, lit(2), lit(2))
    toMatrix(canvas, 2, 2) shouldBe Array(Array(1.0, 2.0), Array(3.0, 4.0))
  }

  test("onCanvas zero-fills uncovered cells (apply_model.py:62-70)") {
    val patches = Seq(("s0", 0, 0, 7.0)).toDF("scene", "pi", "pj", "pred")
    val px = Reconstruct.scatterScalar(patches, 2, "pred")
    val scenes = Seq("s0").toDF("scene")
    val canvas = Reconstruct.onCanvas(px, scenes, lit(4), lit(4))
    val m = toMatrix(canvas, 4, 4)
    m(0)(0) shouldBe 7.0; m(1)(1) shouldBe 7.0
    m(2)(2) shouldBe 0.0; m(0)(3) shouldBe 0.0
  }

  test("patchMatrix and DenseMatrixAgg produce identical dense matrices (W7)") {
    val g = grid(10, 10)
    val tiled = Tiling.tumbling(g, 5, lit(10), lit(10))
    val viaList = Tiling.patchMatrix(tiled, 5)
    val viaAgg = Tiling.patchMatrixDense(tiled, 5)
    viaList.exceptAll(viaAgg).count() shouldBe 0
    viaAgg.exceptAll(viaList).count() shouldBe 0
    // row-major content check on one patch
    val p = viaAgg.filter(col("pi") === 1 && col("pj") === 0)
      .select("patch").as[Seq[Seq[Double]]].head()
    p(0) shouldBe (50 to 54).map(_.toDouble)
    p(4) shouldBe (90 to 94).map(_.toDouble)
  }

  test("DenseMatrixAgg leaves missing cells NaN (F14 canvas init)") {
    val sparse = Seq(("s0", 0, 0, 1.0), ("s0", 1, 1, 2.0))
      .toDF("scene", "line", "sample", "value")
      .withColumn("pi", lit(0)).withColumn("pj", lit(0))
    val m = Tiling.patchMatrixDense(sparse, 2)
      .select("patch").as[Seq[Seq[Double]]].head()
    m(0)(0) shouldBe 1.0
    m(1)(1) shouldBe 2.0
    assert(m(0)(1).isNaN && m(1)(0).isNaN)
  }

  test("alignWithMask rejects exactly the patches whose mask window has any true (J5)") {
    val g = grid(6, 6)
    // mask true only at (0,1) and (4,5) -> patches (0,0) and (1,1) rejected
    val mask = g.select(col("scene"), col("line"), col("sample"),
      ((col("line") === 0 && col("sample") === 1) ||
        (col("line") === 4 && col("sample") === 5)).as("mask"))
    val data = Tiling.aggregatePatches(
      Tiling.tumbling(g, 3, lit(6), lit(6)), 3, Seq("value"),
      Seq(Q.dsum(col("value"), 6).as("s")))
    val aligned = Tiling.alignWithMask(data,
      Tiling.tumbling(mask, 3, lit(6), lit(6)), "mask")
    aligned.count() shouldBe 2
    aligned.select("pi", "pj").as[(Int, Int)].collect().toSet shouldBe
      Set((0, 1), (1, 0))
    // all-false mask aligns everything (the join drops nothing)
    val clean = Tiling.alignWithMask(data,
      Tiling.tumbling(mask.withColumn("mask", lit(false)), 3, lit(6), lit(6)),
      "mask")
    clean.count() shouldBe 4
  }

  test("sampleNames: per-scene row-major sequence, zero-padded (archive.py:286-292)") {
    val patches = Seq(("a", 1, 0), ("a", 0, 1), ("a", 0, 0), ("b", 0, 0))
      .toDF("scene", "pi", "pj")
    val out = Tiling.sampleNames(patches)
      .select("scene", "pi", "pj", "sample_name").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    out should contain(("a", 0, 0, "a_000000"))
    out should contain(("a", 0, 1, "a_000001"))
    out should contain(("a", 1, 0, "a_000002"))
    out should contain(("b", 0, 0, "b_000000"))
  }
}
