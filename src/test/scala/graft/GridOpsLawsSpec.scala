package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.GridOps

/** Randomized W2 law: decimate == NumPy `a[::step, ::step]` followed by
  * the both-axis trim gated on the decimated line count
  * (`/root/reference/asip_v2/archive.py:40-48`), over arbitrary shapes —
  * the generator form of GridOpsSpec's fixed goldens (the ragged-trim
  * divergence of VERDICT r1 #3 is exactly the class of bug this sweeps
  * for). */
class GridOpsLawsSpec extends SparkSpec {
  import spark.implicits._

  private def grid(rows: Int, cols: Int) =
    (0 until rows * cols)
      .map(i => ("s0", i / cols, i % cols, i.toDouble))
      .toDF("scene", "line", "sample", "value")

  test("decimate matches the reference slice+trim on random shapes") {
    val shapes = for {
      rows <- Gen.chooseNum(1, 17)
      cols <- Gen.chooseNum(1, 17)
      step <- Gen.chooseNum(1, 5)
    } yield (rows, cols, step)
    val prop = Prop.forAll(shapes) { case (rows, cols, step) =>
      val got = GridOps.decimate(grid(rows, cols), step, lit(rows), lit(cols))
        .select("line", "sample", "value").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
      // driver-side reference model: slice keeps ceil(n/step) indices per
      // axis; if the DECIMATED line count is not divisible by step, the
      // last kept index of BOTH axes is dropped (array[:-1, :-1]).
      var kl = (rows + step - 1) / step
      var ks = (cols + step - 1) / step
      if (step > 1 && kl % step != 0) { kl -= 1; ks -= 1 }
      val want = (for {
        i <- 0 until math.max(kl, 0)
        j <- 0 until math.max(ks, 0)
      } yield (i, j, (i.toLong * step * cols + j.toLong * step).toDouble)).toSet
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
