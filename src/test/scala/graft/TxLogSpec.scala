package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TxLog

/** [[graft.operators.TxLog]] (L163/L164, q217/q218) — the laws that make
  * checkpointed and streamed log resolution trustworthy:
  *
  *  - checkpoint ∪ tail ≡ full replay, bit-identically, at latest AND
  *    at arbitrary time-travel bounds (incl. bounds that need an OLDER
  *    checkpoint than the pointer's);
  *  - tombstones survive checkpointing (a remove before the checkpoint
  *    must not resurrect through it);
  *  - the file-count evidence for the scale claim: the commit TAIL a
  *    resolution replays is bounded by the checkpoint cadence, CONSTANT
  *    as history grows — replay's cost grows linearly instead;
  *  - the streaming tail's micro-batch fold equals replay regardless of
  *    batching.
  */
class TxLogSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"txlog_$tag").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Write a synthetic commit log: `v` commits, one JSON-lines file per
    * commit; doc d adds `part-d` at version d%v with size 10*d, docs
    * d%3==0 remove it again at d%v+1 (when < v), docs d%9==0 re-add at
    * d%v+2 (when < v) with size 10*d+1. */
  private def writeLog(base: String, nDocs: Int, v: Int): Unit = {
    val d = spark.range(nDocs.toLong).select(col("id").as("doc_id"))
    val adds = d.select((col("doc_id") % v).as("version"),
      to_json(struct(struct(
        concat(lit("part-"), col("doc_id")).as("path"),
        (col("doc_id") * 10).as("size")).as("add"))).as("value"))
    val rms = d.where(col("doc_id") % 3 === 0 &&
        col("doc_id") % v + 1 < v)
      .select((col("doc_id") % v + 1).as("version"),
        to_json(struct(struct(
          concat(lit("part-"), col("doc_id")).as("path"))
          .as("remove"))).as("value"))
    val readds = d.where(col("doc_id") % 9 === 0 &&
        col("doc_id") % v + 2 < v)
      .select((col("doc_id") % v + 2).as("version"),
        to_json(struct(struct(
          concat(lit("part-"), col("doc_id")).as("path"),
          (col("doc_id") * 10 + 1).as("size")).as("add"))).as("value"))
    adds.unionAll(rms).unionAll(readds).coalesce(1)
      .write.partitionBy("version").text(base)
  }

  /** Full replay through the same fold — the ground truth. */
  private def replay(logBase: String, asOf: Long): DataFrame = {
    val raw = spark.read.text(s"$logBase/version=*")
      .withColumn("version", regexp_extract(input_file_name(),
        "version=(\\d+)", 1).cast("long"))
    val acts = TxLog.parseActions(raw)
    TxLog.latestWins(
      if (asOf >= 0) acts.where(col("version") <= asOf) else acts)
  }

  private def snap(df: DataFrame): Set[(String, Long, Long)] =
    df.where(col("is_add"))
      .select(col("path"), col("version"), col("add_size"))
      .as[(String, Long, Long)].collect().toSet

  test("checkpointed resolution is bit-identical to full replay at latest") {
    val base = tmp("latest")
    writeLog(s"$base/log", nDocs = 60, v = 20)
    Seq(7L, 15L).foreach(v =>
      TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", v))
    val r = TxLog.resolve(spark, s"$base/log", s"$base/ckpt", -1L)
    r.ckptVersion shouldBe Some(15L)
    // the tail is exactly the commits after the checkpoint
    r.tailVersions shouldBe Seq(16L, 17L, 18L, 19L)
    snap(r.state) shouldBe snap(replay(s"$base/log", -1L))
  }

  test("time travel picks the newest checkpoint <= bound, older than the pointer") {
    val base = tmp("travel")
    writeLog(s"$base/log", nDocs = 60, v = 20)
    Seq(7L, 15L).foreach(v =>
      TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", v))
    val r = TxLog.resolve(spark, s"$base/log", s"$base/ckpt", 11L)
    r.ckptVersion shouldBe Some(7L) // NOT the pointer's 15
    r.tailVersions shouldBe Seq(8L, 9L, 10L, 11L)
    snap(r.state) shouldBe snap(replay(s"$base/log", 11L))
  }

  test("bound before the first checkpoint falls back to pure replay") {
    val base = tmp("young")
    writeLog(s"$base/log", nDocs = 40, v = 20)
    Seq(15L).foreach(v =>
      TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", v))
    val r = TxLog.resolve(spark, s"$base/log", s"$base/ckpt", 4L)
    r.ckptVersion shouldBe None
    r.tailVersions shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    snap(r.state) shouldBe snap(replay(s"$base/log", 4L))
  }

  test("tombstones survive the checkpoint: a pre-checkpoint remove cannot resurrect") {
    val base = tmp("tomb")
    // doc 3: add at v3, remove at v4 — both BEFORE the checkpoint at 15.
    writeLog(s"$base/log", nDocs = 20, v = 20)
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 15L)
    // the checkpoint row for part-3 must be the tombstone
    val ck = spark.read.text(s"$base/ckpt/version=15")
      .select(get_json_object(col("value"), "$.state.path").as("path"),
        get_json_object(col("value"), "$.state.is_add").cast("boolean")
          .as("is_add"))
      .where(col("path") === "part-3")
      .as[(String, Boolean)].collect()
    ck.length shouldBe 1
    ck.head._2 shouldBe false
    // and the resolved snapshot excludes it
    val live = snap(TxLog.resolve(spark, s"$base/log", s"$base/ckpt",
      -1L).state)
    live.exists(_._1 == "part-3") shouldBe false
  }

  test("scale law: the replayed tail is bounded by cadence, constant as history grows") {
    // same cadence (checkpoint every 10 commits), 10x the history: the
    // tail a latest-resolution replays must NOT grow. This is the O(1)-
    // files claim q217 rests on; full replay would read 40 vs 400 dirs.
    val short = tmp("hist40"); val long = tmp("hist400")
    writeLog(s"$short/log", nDocs = 80, v = 40)
    writeLog(s"$long/log", nDocs = 800, v = 400)
    def ckptEvery10(base: String, v: Int): Unit =
      (9L until v.toLong by 10L).foreach(cv =>
        TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", cv))
    ckptEvery10(short, 40); ckptEvery10(long, 400)
    val rs = TxLog.resolve(spark, s"$short/log", s"$short/ckpt", -1L)
    val rl = TxLog.resolve(spark, s"$long/log", s"$long/ckpt", -1L)
    rs.ckptVersion shouldBe Some(39L)
    rl.ckptVersion shouldBe Some(399L)
    // identical tail length at 10x the history — and both < cadence
    rs.tailVersions.size shouldBe 0
    rl.tailVersions.size shouldBe 0
    // a mid-cadence head: history-independent tail ≤ 9
    val rl2 = TxLog.resolve(spark, s"$long/log", s"$long/ckpt", 395L)
    rl2.ckptVersion shouldBe Some(389L)
    rl2.tailVersions.size shouldBe 6
    snap(rl.state) shouldBe snap(replay(s"$long/log", -1L))
    snap(rl2.state) shouldBe snap(replay(s"$long/log", 395L))
  }

  test("streaming tail fold equals replay for any micro-batch split") {
    val base = tmp("stream")
    writeLog(s"$base/log", nDocs = 60, v = 20)
    for ((fpt, i) <- Seq(1, 3, 100).zipWithIndex) {
      val st = TxLog.tailOnce(spark, s"$base/log", s"$base/state$i",
        s"$base/sckpt$i", filesPerTrigger = fpt)
      st.isDefined shouldBe true
      snap(st.get) shouldBe snap(replay(s"$base/log", -1L))
    }
  }

  test("empty log: tailOnce returns None, resolve returns the empty state") {
    val base = tmp("empty")
    new java.io.File(s"$base/log").mkdirs()
    TxLog.tailOnce(spark, s"$base/log", s"$base/state",
      s"$base/sckpt", filesPerTrigger = 4) shouldBe None
    val r = TxLog.resolve(spark, s"$base/log", s"$base/ckpt", -1L)
    r.ckptVersion shouldBe None
    r.tailVersions shouldBe Seq.empty
    r.state.count() shouldBe 0L
  }
}
