package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{ParquetFile, ParquetWrite, TxLog}
import graft.sources.{LakeCommitMessage, LakeStreamingWrite, LakeTable}

/** The graft-lake STREAMING SINK (q236) — exactly-once laws:
  * one commit version per epoch carrying a txn fence, a replayed
  * epoch is a no-op that also drops its duplicate files, a restart
  * from the same checkpoint re-emits nothing, and the fence is
  * scoped per app (two queries can interleave epochs). */
class LakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private val FileRows = 64

  private def rows(f: Int): Seq[(Long, Option[Long], String)] =
    (0 until FileRows).map { i =>
      val id = f.toLong * FileRows + i
      (id, if (id % 7 == 0) None else Some(id * 3), "s" + (id % 3))
    }

  private def writeFileFor(base: String, f: Int): String = {
    val rs = rows(f)
    val bytes = ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("doc_id", rs.map(_._1).toArray),
      ParquetWrite.OptLongCol("v", rs.map(r =>
        r._2.map(java.lang.Long.valueOf).orNull).toArray),
      ParquetWrite.StrCol("s", rs.map(_._3).toArray)))
    val p = s"$base/data/part-$f.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
    p
  }

  private def addLine(p: String, f: Int): String = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p))
    val st = ParquetFile.parse(f.toLong, bytes)
      .filter(r => r.valid && r.col_path == "doc_id" && r.has_stats)
    s"""{"add":{"path":"$p","size":$FileRows""" +
      s""","min_key":${st.map(_.min_long).min}""" +
      s""","max_key":${st.map(_.max_long).max}}}"""
  }

  /** Source with files 1..n in n separate commit versions; sink
    * bootstrapped with file 0 at version 0. Returns (src, dst). */
  private def buildPipe(n: Int): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("graft_sink")
      .toFile.getAbsolutePath
    val src = s"$base/src"; val dst = s"$base/dst"
    new java.io.File(s"$src/data").mkdirs()
    new java.io.File(s"$dst/data").mkdirs()
    (1 to n).foreach { f =>
      TxLog.commitVersion(s"$src/log", (f - 1).toLong,
        Seq(addLine(writeFileFor(src, f), f)))
    }
    TxLog.commitVersion(s"$dst/log", 0L,
      Seq(addLine(writeFileFor(dst, 0), 0)))
    (src, dst)
  }

  private def lake(base: String): DataFrame =
    spark.read.format("graft-lake").option("path", base).load()

  private def drain(src: String, dst: String, ck: String): Unit = {
    val q = spark.readStream.format("graft-lake").option("path", src)
      .option("versionsPerTrigger", 1).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("graft-lake").option("path", dst)
      .start()
    q.awaitTermination()
  }

  test("one commit version per epoch, each carrying the txn fence; " +
      "restart from the same checkpoint re-emits nothing") {
    val (src, dst) = buildPipe(3)
    val ck = java.nio.file.Files.createTempDirectory("sink_ck").toString
    drain(src, dst, ck)
    // 3 epochs -> sink versions 1..3 (0 = bootstrap)
    TxLog.commitVersions(s"$dst/log") shouldBe Seq(0L, 1L, 2L, 3L)
    lake(dst).count() shouldBe (4 * FileRows).toLong
    lake(dst).select("doc_id").as[Long].collect().toSet shouldBe
      (0L until 4L * FileRows).toSet
    // fences are per-app: an unknown app sees none
    TxLog.latestTxn(s"$dst/log", "nope") shouldBe None
    // restart: same checkpoint, no new source versions -> no change
    drain(src, dst, ck)
    TxLog.commitVersions(s"$dst/log") shouldBe Seq(0L, 1L, 2L, 3L)
    lake(dst).count() shouldBe (4 * FileRows).toLong
    // new source commit after restart: exactly one more epoch lands
    TxLog.commitVersion(s"$src/log", 3L,
      Seq(addLine(writeFileFor(src, 4), 4)))
    drain(src, dst, ck)
    TxLog.commitVersions(s"$dst/log") shouldBe Seq(0L, 1L, 2L, 3L, 4L)
    lake(dst).count() shouldBe (5 * FileRows).toLong
  }

  test("replayed epoch is a no-op: no second version, duplicate " +
      "files dropped; the fence is scoped per app") {
    val (_, dst) = buildPipe(1)
    val table = new LakeTable(dst, -1L, "doc_id")
    val schema = table.schema()
    val sw = new LakeStreamingWrite(table, schema, "app-A")
    def msg(f: Int): LakeCommitMessage = {
      val p = writeFileFor(dst, f)
      LakeCommitMessage(p, FileRows.toLong, f.toLong * FileRows,
        f.toLong * FileRows + FileRows - 1, hasKey = true)
    }
    sw.commit(7L, Array(msg(10)))
    TxLog.commitVersions(s"$dst/log").max shouldBe 1L
    TxLog.latestTxn(s"$dst/log", "app-A") shouldBe Some(7L)
    // replay of epoch 7 (and anything older): no version, file gone
    val dup = msg(11)
    sw.commit(7L, Array(dup))
    TxLog.commitVersions(s"$dst/log").max shouldBe 1L
    new java.io.File(dup.adds.head.path).exists() shouldBe false
    sw.commit(5L, Array(msg(12)))
    TxLog.commitVersions(s"$dst/log").max shouldBe 1L
    // a DIFFERENT app's epoch 7 is not fenced by app-A's
    val swB = new LakeStreamingWrite(table, schema, "app-B")
    swB.commit(7L, Array(msg(13)))
    TxLog.commitVersions(s"$dst/log").max shouldBe 2L
    TxLog.latestTxn(s"$dst/log", "app-B") shouldBe Some(7L)
    // and app-A's NEXT epoch lands normally
    sw.commit(8L, Array(msg(14)))
    TxLog.commitVersions(s"$dst/log").max shouldBe 3L
    TxLog.latestTxn(s"$dst/log", "app-A") shouldBe Some(8L)
    // resolution sees exactly the committed files (10, 13, 14 + boot)
    lake(dst).count() shouldBe (4 * FileRows).toLong
  }

  test("sink checkpoint maintenance fires at the cadence: the " +
      "pointer advances from inside epoch commits") {
    val (src, dst) = buildPipe(5) // 5 epochs under versionsPerTrigger=1
    val ck = java.nio.file.Files.createTempDirectory("sink_ck3").toString
    val q = spark.readStream.format("graft-lake").option("path", src)
      .option("versionsPerTrigger", 1).load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .format("graft-lake").option("path", dst)
      .option("checkpointEvery", 2)
      .start()
    q.awaitTermination()
    // sink versions 0..5; cadence 2 -> checkpoints at odd versions,
    // the pointer at the newest (5)
    TxLog.commitVersions(s"$dst/log") shouldBe (0L to 5L)
    TxLog.readPointer(s"$dst/ckpt") shouldBe Some(5L)
    // resolution through the checkpointed state sees every row
    lake(dst).count() shouldBe (6 * FileRows).toLong
  }

  test("schema mismatch rejects before any epoch lands") {
    val (src, dst) = buildPipe(1)
    val ck = java.nio.file.Files.createTempDirectory("sink_ck2").toString
    intercept[Exception] {
      val q = spark.readStream.format("graft-lake").option("path", src)
        .load()
        .select(col("doc_id")) // projected away: schema mismatch
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .format("graft-lake").option("path", dst)
        .start()
      q.awaitTermination()
    }
    TxLog.commitVersions(s"$dst/log") shouldBe Seq(0L)
  }
}
