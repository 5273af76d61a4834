package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — the NetCDF ingestion boundary's deterministic fixture generator:
  * synthesizes the §1.4 scene tables (SURVEY.md) a production DataSource
  * V2 NetCDF reader would emit, so the full pipeline can be exercised
  * end-to-end without a codec dependency. Everything is a pure function
  * of (scene, line, sample) — reproducible across runs and engines.
  */
object SceneFixtures {

  /** Long-format pixel table for `nScenes` scenes of `h`×`w`:
    * (scene, line, sample, sar_primary, sar_secondary, polygon_id,
    * distance_map). SAR bands are smooth deterministic fields; polygon
    * ids tile the scene in 4×4 blocks; distance_map grows away from the
    * left edge (so a threshold masks a vertical band, like a coastline).
    */
  def pixels(spark: SparkSession, nScenes: Int, h: Int, w: Int): DataFrame =
    spark.range(nScenes.toLong * h * w).select(
      concat(lit("sc"), (col("id") / (h.toLong * w)).cast("long")).as("scene"),
      ((col("id") / w) % h).cast("int").as("line"),
      (col("id") % w).cast("int").as("sample"))
      .select(col("scene"), col("line"), col("sample"),
        (sin(col("line") * 0.7) * cos(col("sample") * 0.3) + 2.0).as("sar_primary"),
        (cos(col("line") * 0.2) * sin(col("sample") * 0.5) + 2.0).as("sar_secondary"),
        ((col("line") / 4).cast("int") * 10 +
          (col("sample") / 4).cast("int") % 10 + 1).cast("int").as("polygon_id"),
        (col("sample") * 3).cast("double").as("distance_map"))

  /** Raw `polygon_codes` text rows per scene (header + data lines) —
    * the exact text shape `archive.py:229-248` parses. */
  def polygonCodesText(spark: SparkSession, nScenes: Int, maxPolyId: Int): DataFrame = {
    val ids = spark.range(1, maxPolyId + 1)
    val scenes = spark.range(nScenes).select(concat(lit("sc"), col("id")).as("scene"))
    val header = scenes.select(col("scene"),
      lit("id;CT;CA;SA;FA;CB;SB;FB;CC;SC;FC").as("row"))
    def stage(i: org.apache.spark.sql.Column) =
      when(i % 9 === 0, 0).when(i % 9 === 1, 81).when(i % 9 === 2, 84)
        .when(i % 9 === 3, 86).when(i % 9 === 4, 91).when(i % 9 === 5, 95)
        .when(i % 9 === 6, 97).when(i % 9 === 7, 43).otherwise(-9)
    val rows = scenes.crossJoin(ids).select(col("scene"),
      concat_ws(";",
        col("id"),
        (col("id") % 110).cast("int"),
        when(col("id") % 11 === 0, -9).otherwise(col("id") % 40).cast("int"),
        stage(col("id")).cast("int"), lit(-9),
        when(col("id") % 13 === 0, -9).otherwise(col("id") % 37).cast("int"),
        stage(col("id") + 4).cast("int"), lit(-9),
        when(col("id") % 17 === 0, -9).otherwise(col("id") % 31).cast("int"),
        stage(col("id") + 7).cast("int"), lit(-9)).as("row"))
    header.unionByName(rows)
  }

  /** Scene metadata table (scene, ts, AOI box, dims) — P4's input. */
  def scenes(spark: SparkSession, nScenes: Int, h: Int, w: Int): DataFrame =
    spark.range(nScenes).select(
      concat(lit("sc"), col("id")).as("scene"),
      to_timestamp(concat(lit("2020-01-"), format_string("%02d", col("id") + 1)),
        "yyyy-MM-dd").as("ts"),
      lit(0).as("aoi_ul_sample"), lit(w - 1).as("aoi_lr_sample"),
      lit(0).as("aoi_ul_line"), lit(h - 1).as("aoi_lr_line"),
      lit(w).as("width"), lit(h).as("height"))
}
