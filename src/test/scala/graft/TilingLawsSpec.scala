package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Reconstruct, Tiling}

/** Randomized tiling laws over arbitrary grid/window/stride shapes —
  * the generator-based generalization of TilingSpec's fixed-size cases.
  * Pinned semantics: `view_as_windows`
  * (`/root/reference/asip_v2/archive.py:25-32,50-72`).
  */
class TilingLawsSpec extends SparkSpec {
  import spark.implicits._

  private def grid(rows: Int, cols: Int) =
    (0 until rows * cols)
      .map(i => ("s0", i / cols, i % cols, i.toDouble))
      .toDF("scene", "line", "sample", "value")

  /** Windows per axis for extent n, window w, stride s (view_as_windows):
    * 0 if n < w else (n - w) / s + 1. */
  private def nWin(n: Int, w: Int, s: Int): Long =
    if (n < w) 0L else ((n - w) / s + 1).toLong

  private val shapes: Gen[(Int, Int, Int, Int)] = for {
    rows <- Gen.chooseNum(1, 14)
    cols <- Gen.chooseNum(1, 14)
    w <- Gen.chooseNum(1, 6)
    s <- Gen.chooseNum(1, w) // stride <= window (reference constraint)
  } yield (rows, cols, w, s)

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("sliding: window count and per-patch pixel count match view_as_windows") {
    check(Prop.forAll(shapes) { case (rows, cols, w, s) =>
      val tiled = Tiling.sliding(grid(rows, cols), w, s, lit(rows), lit(cols))
      val patches = tiled.groupBy("pi", "pj").count().collect()
      patches.length == nWin(rows, w, s) * nWin(cols, w, s) &&
        patches.forall(_.getLong(2) == w.toLong * w)
    })
  }

  test("tumbling: complete patches partition the covered region exactly once") {
    check(Prop.forAll(shapes) { case (rows, cols, w, _) =>
      val tiled = Tiling.tumbling(grid(rows, cols), w, lit(rows), lit(cols))
      val n = tiled.count()
      val distinctPx = tiled.select("line", "sample").distinct().count()
      n == nWin(rows, w, w) * nWin(cols, w, w) * w * w && distinctPx == n
    })
  }

  test("reconstruct ∘ tile identity at stride == window on random shapes") {
    check(Prop.forAll(shapes) { case (rows, cols, w, _) =>
      val g = grid(rows, cols)
      val tiled = Tiling.tumbling(g, w, lit(rows), lit(cols))
      val patches = Tiling.patchMatrixDense(tiled, w)
      val rebuilt = Reconstruct.explodePatches(patches, w)
      // identity on the covered region (ragged edges are dropped by design)
      val covered = g.filter(
        col("line") < nWin(rows, w, w) * w && col("sample") < nWin(cols, w, w) * w)
      rebuilt.select("scene", "line", "sample", "value")
        .exceptAll(covered.select("scene", "line", "sample", "value"))
        .count() == 0L &&
        rebuilt.count() == covered.count()
    })
  }
}
