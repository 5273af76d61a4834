package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.functions.IceCodes
import graft.operators.{Masking, Reconstruct, Tiling}
import graft.plans.Checks
import graft.sources.SceneFixtures

/** The full build_dataset slice over generated scene fixtures
  * (SURVEY.md §7.2 step 5; `build_dataset.py:26-34`):
  * fixture → health check → codes parse → encode → decode join → mask →
  * tile → NaN-reject → dense matrices → named samples →
  * write.partitionBy(scene) → pruned read-back → reconstruction. Closes
  * the S1 (fixture generator) and S6/S8 (partitioned sinks) components
  * end to end. */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("fixture -> masked -> decoded -> tiled -> partitioned write -> pruned scan -> reconstruct") {
    val nScenes = 2; val h = 20; val w = 30; val win = 5
    val px = Checks.requireColumns(
      SceneFixtures.pixels(spark, nScenes, h, w),
      "scene", "line", "sample", "sar_primary", "polygon_id", "distance_map")

    // P4 health gate on scene metadata
    val scenes = SceneFixtures.scenes(spark, nScenes, h, w)
    Masking.healthy(scenes, window = win, rmSwath = 1).count() shouldBe nScenes

    // F1 parse + F9 encode + J1 broadcast decode join
    val codes = IceCodes.parsePolygonCodes(
      SceneFixtures.polygonCodesText(spark, nScenes, maxPolyId = 50))
    val encoded = IceCodes.withOneHotBinary(codes,
      col("ct"), col("ca"), col("sa"), col("cb"), col("sb"), col("cc"), col("sc"))
      .select(col("scene"), col("poly_id").as("polygon_id"),
        col("r0"), col("r1"), col("r2"), col("r3"))
    val decoded = px.join(broadcast(encoded), Seq("scene", "polygon_id"))
    decoded.count() shouldBe nScenes.toLong * h * w

    // P6/P7/S2: distance mask nulls a left band
    val masked = Masking.applyMask(decoded,
      Masking.unionMasks(Masking.distanceMask(col("distance_map"), 6)),
      Seq("sar_primary"))

    // W1/P8: tile + reject patches touching the masked band
    val tiled = Tiling.tumbling(masked, win, lit(h), lit(w))
    val patches = Tiling.aggregatePatches(tiled, win, Seq("sar_primary"),
      Seq(sum(col("sar_primary")).as("s")))
    // samples 0..5 are masked (distance < 6 -> sample*3 < 6 -> samples 0,1)
    // -> patch column pj=0 rejected in every scene: 4x6 grid -> 4x5 left
    patches.count() shouldBe nScenes * 4 * 5
    patches.filter(col("pj") === 0).count() shouldBe 0

    // W7 + O2/F6 + S6: dense matrices, named, written partitionBy(scene)
    val mats = Tiling.patchMatrixDense(
      tiled.join(patches.select("scene", "pi", "pj"), Seq("scene", "pi", "pj")),
      win, valueCol = "sar_primary")
    val named = Tiling.sampleNames(mats.join(
      patches.select("scene", "pi", "pj"), Seq("scene", "pi", "pj")))
    val out = Files.createTempDirectory("graft_e2e").toString
    named.write.partitionBy("scene").parquet(s"$out/samples")

    // partition layout + pruned read-back
    new java.io.File(s"$out/samples/scene=sc0").exists() shouldBe true
    new java.io.File(s"$out/samples/scene=sc1").exists() shouldBe true
    val back = spark.read.parquet(s"$out/samples").filter(col("scene") === "sc0")
    back.count() shouldBe 4 * 5
    back.select("sample_name").as[String].collect().min shouldBe "sc0_000000"

    // W8/S8: reconstruct kept patches onto the canvas, write per scene
    val rebuilt = Reconstruct.onCanvas(
      Reconstruct.explodePatches(
        back.select(col("scene"), col("pi"), col("pj"), col("patch")), win),
      scenes.filter(col("scene") === "sc0"), lit(h), lit(w))
    rebuilt.count() shouldBe h * w
    rebuilt.write.partitionBy("scene").parquet(s"$out/reconstructed")
    // kept pixels round-trip exactly; rejected band is zero-filled
    val m = toMatrix(rebuilt.filter(col("scene") === "sc0"), h, w)
    m(0)(0) shouldBe 0.0 // pj=0 rejected -> zero fill
    val orig = px.filter(col("scene") === "sc0" && col("line") === 0 &&
      col("sample") === 10).select("sar_primary").as[Double].head()
    m(0)(10) shouldBe orig
  }
}
