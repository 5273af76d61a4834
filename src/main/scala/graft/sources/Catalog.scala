package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S3/O1/F2/P10 — input-catalog operators: directory listing with a
  * suffix filter, lexicographic ordering, scene-id extraction from file
  * names, scene-prefix selection.
  *
  * The reference does `sorted(os.listdir(dir))` + `endswith(".nc")` +
  * `f.split("_")[0]` (`/root/reference/asip_v2/archive.py:193-195,229`,
  * `apply_model.py:30-42`, `train_model_simple.py:19`). Spark mapping:
  * the `binaryFile` source's file index does the distributed listing;
  * selecting only metadata columns prunes the content column, so no file
  * bytes are read (the scan is listing-only — cheap at any scale). The
  * NetCDF ingestion boundary (S1): a production reader would decode
  * `content` per file in a `flatMap` into the §1.4 pixel tables; here
  * the catalog stops at metadata, which is all the driver tables need.
  */
object Catalog {

  /** S3 — list files under `dir` matching `*suffix`, metadata only. */
  def listFiles(spark: SparkSession, dir: String, suffix: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", s"*$suffix")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"))

  /** F2 — scene id = file-name prefix before the first separator
    * (`archive.py:229`: `filename.split("_")[0]`). */
  def sceneId(name: org.apache.spark.sql.Column, sep: String = "_"): org.apache.spark.sql.Column =
    split(name, java.util.regex.Pattern.quote(sep)).getItem(0)

  /** O1 — lexicographic catalog order with a deterministic sequence
    * (`sorted(...)`). Scale-safe even for billion-file catalogs: ranks
    * within name-prefix buckets (a pure function of the row — identical
    * on every subtree evaluation) and stitches global offsets from the
    * tiny per-bucket counts, so no unpartitioned window ever funnels the
    * listing through one task. */
  def ordered(files: DataFrame): DataFrame =
    graft.operators.MLFeed.rankByBucket(
        files, substring(col("name"), 1, 2), Seq(col("name")))
      .withColumn("seq", col("_rank") - 1)
      .drop("_rank", "_n")

  /** P10 — keep files of one scene (`apply_model.py:30-42`). */
  def forScene(files: DataFrame, scene: String): DataFrame =
    files.filter(sceneId(col("name")) === scene)

  /** F7 — legacy sample-name parse. The reference's legacy `.npz` sample
    * files carry the patch location at the END of the name —
    * `{scene}_{seq:06d}_{noise}-{i}_{j}[.npz]`, e.g.
    * `20180410T084537_000000_nersc_-11_12`
    * (`tests/test_archive.py:433-447`) — and `train_model.py:93-95`
    * recovers `(i, j)` as `(x.split("-")[-1].split(".")[0]).split("_")`.
    * This mirrors that contract exactly (everything after the LAST '-',
    * truncated at the first '.', split on '_'), so ingesting a
    * reference-produced legacy sample store keeps `(pi, pj)` as real
    * columns instead of losing them with the filename. Adds
    * `scene, seq, pi, pj`. */
  def parseLegacySampleName(df: DataFrame, nameCol: String = "name"): DataFrame = {
    val tail = element_at(split(col(nameCol), "-"), -1) // x.split("-")[-1]
    val loc = element_at(split(tail, "\\."), 1)         // .split(".")[0]
    // try_cast, not cast: a real sample directory can hold stray files
    // (README, index.html) — under default-on ANSI mode a plain cast of
    // a malformed field would fail the whole listing job; NULL rows are
    // filterable instead (same rule as IceCodes' polygon parser).
    df.withColumn("scene", sceneId(col(nameCol)))       // name.split("_")[0]
      .withColumn("seq", element_at(split(col(nameCol), "_"), 2).try_cast("int"))
      .withColumn("pi", element_at(split(loc, "_"), 1).try_cast("int"))
      .withColumn("pj", element_at(split(loc, "_"), 2).try_cast("int"))
  }
}
