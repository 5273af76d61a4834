package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

/** [[graft.operators.Drift]] — integer-exact histogram drift: hand-
  * computed numerators on a known fixture, full-outer bin semantics,
  * symmetry, zero self-drift, null bins. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  // a: x×3 y×1   (N=4);   b: x×1 y×2 z×1   (N=4)
  private lazy val fa = Seq("x", "x", "x", "y").toDF("bin0")
  private lazy val fb = Seq("x", "y", "y", "z").toDF("bin0")

  private def drift(l: org.apache.spark.sql.DataFrame,
                    r: org.apache.spark.sql.DataFrame) =
    Drift.histogramDrift(l, r, col("bin0"))
      .select(col("bin"), col("c_a"), col("c_b"), col("n_a"), col("n_b"),
        col("drift_num").cast("long").as("num"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap

  test("hand-computed numerators, absent bins count zero") {
    val d = drift(fa, fb)
    // |c_a*4 - c_b*4|: x |12-4|=8, y |4-8|=4, z |0-4|=4
    d("x") shouldBe ("x", 3L, 1L, 4L, 4L, 8L)
    d("y") shouldBe ("y", 1L, 2L, 4L, 4L, 4L)
    d("z") shouldBe ("z", 0L, 1L, 4L, 4L, 4L)
    // TV = Σnum / (2*N_a*N_b) = 16/32 = 0.5 — sanity of the encoding
    d.values.map(_._6).sum shouldBe 16L
  }

  test("drift is symmetric per bin") {
    val ab = drift(fa, fb); val ba = drift(fb, fa)
    ab.keySet shouldBe ba.keySet
    ab.foreach { case (k, t) => t._6 shouldBe ba(k)._6 }
  }

  test("self-drift is zero on every bin") {
    drift(fa, fa).values.foreach(_._6 shouldBe 0L)
  }

  test("null bins form their own bin") {
    val withNull = Seq(Some("x"), None, None).toDF("bin0")
    val d = Drift.histogramDrift(withNull, fa, col("bin0"))
      .where(col("bin").isNull)
      .select(col("c_a"), col("c_b")).as[(Long, Long)].collect()
    d shouldBe Array((2L, 0L))
  }

  test("sourceMixDrift: hand-computed TV, telescoped absent mass, top term") {
    // source A: "x x y" (n_s=3), source B: "z" (n_s=1). Corpus: x=2,
    // y=1, z=1, N=4. Present terms A: x |2·4−2·3|=2, y |1·4−1·3|=1;
    // absent mass A = 3·(4−3)=3 → tv_num=6, tv=6/(2·3·4)=0.25.
    // B: z |1·4−1·1|=3; absent = 1·(4−1)=3 → tv_num=6, tv=6/8=0.75.
    val df = Seq((0L, "A", "x x y"), (1L, "B", "z"))
      .toDF("doc_id", "source", "text")
    val out = Drift.sourceMixDrift(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4),
          r.getLong(5)))).toMap
    out("A") shouldBe ((3L, 6L, 0.25, "x", 2L))
    out("B") shouldBe ((1L, 6L, 0.75, "z", 3L))
  }

  test("sourceMixDrift: a source matching the corpus mix has zero drift") {
    // both sources carry the identical distribution {x, y} -> TV = 0;
    // the top-term tie then breaks toward the alphabetically first token
    val df = Seq((0L, "A", "x y"), (1L, "B", "x y"))
      .toDF("doc_id", "source", "text")
    val out = Drift.sourceMixDrift(df, col("source"), col("text"))
      .collect()
    out.foreach { r =>
      r.getLong(2) shouldBe 0L     // tv_num
      r.getDouble(3) shouldBe 0.0
      r.getString(4) shouldBe "x"
    }
  }

  test("uneven totals: cross-multiplied form stays exact") {
    // a: x×2 (N=2); b: x×3 y×3 (N=6) — same x-share 1/1 vs 1/2
    val l = Seq("x", "x").toDF("bin0")
    val r = Seq("x", "x", "x", "y", "y", "y").toDF("bin0")
    val d = drift(l, r)
    d("x")._6 shouldBe math.abs(2L * 6 - 3L * 2) // 6
    d("y")._6 shouldBe math.abs(0L * 6 - 3L * 2) // 6
  }
}
