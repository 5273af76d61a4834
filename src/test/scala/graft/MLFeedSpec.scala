package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Ledger, MLFeed, Regrid}

/** ML-feed, ledger, and regrid semantics
  * (`/root/reference/asip_v2/utility.py:167-179`,
  * `data_generator.py:20-35`, `archive.py:180-203,250-263`). */
class MLFeedSpec extends SparkSpec {
  import spark.implicits._

  test("permuteKey: split-multiply identity, and no overflow to key 2^62") {
    // the split 16/16-bit form must equal (key * 2654435761) mod 2^32
    // computed with BigInt (the naive long multiply overflows past
    // ~3.4e9 — ANSI would throw), including keys far beyond 2^32
    val keys = Seq(0L, 1L, 65535L, 65536L, 123456789L, 4294967295L,
      4294967296L, 3470000000L, 1L << 45, (1L << 62) - 7)
    val got = keys.toDF("id")
      .select(MLFeed.permuteKey(col("id")).as("p")).as[Long].collect()
    val want = keys.map(k =>
      ((BigInt(k) * BigInt(2654435761L)) mod BigInt(4294967296L)).toLong)
    got.toSeq shouldBe want
  }

  test("exactSplit: exact head/tail sizes, not Bernoulli (utility.py:167-179)") {
    val df = (1 to 10).toDF("id")
    val out = MLFeed.exactSplit(df, Seq(MLFeed.permuteKey(col("id")), col("id")), 0.7)
    val sizes = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes("train") shouldBe 7
    sizes("valid") shouldBe 3
  }

  test("scale-safe global rank matches the single-window formulation") {
    val df = (1 to 500).map(i => (i * 37) % 501).toDF("k")
    val viaOp = MLFeed.batchIds(df, Seq(col("k")), 100)
    val viaWindow = df
      .withColumn("_r", row_number().over(Window.orderBy(col("k"))) - 1)
      .withColumn("batch_id", (col("_r") / 100).cast("long"))
      .filter(col("batch_id") < 5).drop("_r")
    viaOp.exceptAll(viaWindow).count() shouldBe 0
    viaWindow.exceptAll(viaOp).count() shouldBe 0
  }

  test("closed-form keyDomain buckets match the approxQuantile path") {
    val df = (1 to 500).toDF("id")
    val keys = Seq(MLFeed.permuteKey(col("id")), col("id"))
    val viaQuantile = MLFeed.batchIds(df, keys, 100)
    val viaDomain = MLFeed.batchIds(df, keys, 100,
      keyDomain = Some(MLFeed.PermuteKeyDomain))
    viaDomain.exceptAll(viaQuantile).count() shouldBe 0
    viaQuantile.exceptAll(viaDomain).count() shouldBe 0
    // skewed domain declaration (all keys land near bucket 0) must still
    // rank correctly — buckets only need monotonicity, not balance
    val viaSkewed = MLFeed.batchIds(df, keys, 100,
      keyDomain = Some((0L, Long.MaxValue / 64)))
    viaSkewed.exceptAll(viaQuantile).count() shouldBe 0
  }

  test("no single-partition exchange in the global-rank plan (VERDICT r1 perf)") {
    val df = (1 to 100).toDF("k")
    val plan = MLFeed.batchIds(df, Seq(col("k")), 10)
      .queryExecution.executedPlan.toString
    // the row-bearing window must be keyed by the deterministic bucket
    // id — never a global (empty-key) window over the data, and never a
    // sampled RangePartitioning (whose rdd-id-seeded bounds differ
    // between evaluations of the same subtree)
    plan should include("windowspecdefinition(_pid")
    plan should not include "rangepartitioning"
  }

  test("batchIds drops the ragged tail (data_generator.py:20-35)") {
    val df = (1 to 25).toDF("id")
    val out = MLFeed.batchIds(df, Seq(col("id")), 10)
    out.count() shouldBe 20 // floor(25/10) = 2 batches
    out.groupBy("batch_id").count().select("count").as[Long]
      .collect().toSet shouldBe Set(10L)
  }

  test("epoch shuffle keys differ across epochs but are reproducible") {
    val df = (1 to 20).toDF("id")
    def order(e: Int) = df
      .orderBy(MLFeed.epochShuffleKey(col("id"), e), col("id"))
      .select("id").as[Int].collect().toSeq
    order(0) should not be order(1)
    order(1) shouldBe order(1)
  }

  test("dayOfYearFilter: days-since-Jan-1 bounds inclusive (train_model.py:69-81)") {
    val df = Seq("2020-01-01", "2020-01-31", "2020-02-01", "2020-03-01")
      .toDF("d").select(to_date(col("d")).as("d"))
    // doy-1 in [0, 30]: Jan 1 (0) .. Jan 31 (30); Feb 1 is 31 -> out
    MLFeed.dayOfYearFilter(df, "d", 0, 30).count() shouldBe 2
  }

  test("ledger: unprocessed = dir \\ ledger; append is idempotent (archive.py:180-203)") {
    val candidates = Seq("a", "b", "c", "d").toDF("name")
    val ledger = Seq("b", "d").toDF("name")
    Ledger.unprocessed(candidates, ledger, Seq("name"))
      .as[String].collect().sorted shouldBe Array("a", "c")
    val appended = Ledger.appendProcessed(ledger, Seq("a", "b").toDF("name"), Seq("name"))
    appended.as[String].collect().sorted shouldBe Array("a", "b", "d")
  }

  test("assembleBatches: per-batch sample lists ordered by the batch key (B4)") {
    val df = Seq((0L, 3, "c"), (0L, 1, "a"), (0L, 2, "b"), (1L, 5, "e"), (1L, 4, "d"))
      .toDF("batch_id", "ord", "name")
    val out = MLFeed.assembleBatches(df, col("ord"), Seq("name"))
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1))
      }.toMap
    out(0L) shouldBe Seq("a", "b", "c")
    out(1L) shouldBe Seq("d", "e")
  }

  test("patch <-> mask-patch alignment joins on (scene, pi, pj) (J5, test_archive.py:449-464)") {
    // data and mask tiled INDEPENDENTLY must align by patch key
    val data = Seq(("s0", 0, 0, 1.0), ("s0", 0, 1, 2.0), ("s0", 1, 0, 3.0), ("s0", 1, 1, 4.0))
      .toDF("scene", "line", "sample", "value")
    val mask = Seq(("s0", 0, 0, false), ("s0", 0, 1, true), ("s0", 1, 0, false), ("s0", 1, 1, false))
      .toDF("scene", "line", "sample", "masked")
    val dt = graft.operators.Tiling.tumbling(data, 1, lit(2), lit(2))
      .groupBy("scene", "pi", "pj").agg(sum("value").as("v"))
    val mt = graft.operators.Tiling.tumbling(mask, 1, lit(2), lit(2))
      .groupBy("scene", "pi", "pj").agg(max(col("masked")).as("m"))
    val aligned = dt.join(mt, Seq("scene", "pi", "pj"))
    aligned.count() shouldBe 4
    // the masked patch is (0,1), carrying data value 2.0
    val bad = aligned.filter(col("m")).select("v").as[Double].collect()
    bad shouldBe Array(2.0)
  }

  test("catalog: scene-id extraction + scene-prefix selection (F2/P10, apply_model.py:30-42)") {
    import graft.sources.Catalog
    val files = Seq("20180410T084537_S1B_x.nc", "20180410T084537_S1B_y.nc",
      "20190501T120000_S1A_z.nc").toDF("name")
    files.select(Catalog.sceneId(col("name")).as("s")).distinct()
      .as[String].collect().sorted shouldBe Array("20180410T084537", "20190501T120000")
    Catalog.forScene(files, "20180410T084537").count() shouldBe 2
  }

  test("legacy sample-name parse recovers scene/seq/(i,j) (F7, train_model.py:93-95)") {
    import graft.sources.Catalog
    // exact strings from tests/test_archive.py:433-447 (savez adds .npz;
    // train_model lists the extensioned form — both must parse)
    val names = Seq("20180410T084537_000000_nersc_-11_12",
      "20180410T084537_000002_nersc_-15_16.npz").toDF("name")
    val out = Catalog.parseLegacySampleName(names)
      .select("scene", "seq", "pi", "pj")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    out should contain theSameElementsAs Seq(
      ("20180410T084537", 0, 11, 12), ("20180410T084537", 2, 15, 16))
  }

  test("regrid bilinear: interior interpolation + linear extrapolation (archive.py:250-263)") {
    // source grid: values v(l, s) = 10*l + s at positions {0, 10} x {0, 10}
    val src = Seq(
      ("s0", 0.0, 0.0, 0.0), ("s0", 0.0, 10.0, 10.0),
      ("s0", 10.0, 0.0, 100.0), ("s0", 10.0, 10.0, 110.0)
    ).toDF("scene", "line", "sample", "value")
    val tl = Seq(("s0", 5.0), ("s0", 15.0)).toDF("scene", "pos")
    val ts = Seq(("s0", 2.0), ("s0", -3.0)).toDF("scene", "pos")
    val out = Regrid.bilinear(src, tl, ts)
      .collect().map(r => ((r.getDouble(1), r.getDouble(2)), r.getDouble(3))).toMap
    // linear field -> exact everywhere, including beyond the hull
    out((5.0, 2.0)) shouldBe 52.0 +- 1e-9
    out((5.0, -3.0)) shouldBe 47.0 +- 1e-9   // extrapolated sample
    out((15.0, 2.0)) shouldBe 152.0 +- 1e-9  // extrapolated line
    out((15.0, -3.0)) shouldBe 147.0 +- 1e-9 // both axes extrapolated
  }
}
