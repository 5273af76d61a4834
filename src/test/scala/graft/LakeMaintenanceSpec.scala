package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LakeMaintenance, ParquetFile, ParquetWrite, TxLog}

/** OPTIMIZE/compaction (q228, [[LakeMaintenance.compact]]) — the laws:
  * content is INVARIANT (files change, rows don't), live file count
  * drops, key-ordered bins keep pruning selective, pre-compaction
  * time travel still resolves the old files, and the operation is
  * idempotent (rewritten files never re-qualify). */
class LakeMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val FileRows = 100

  private def expected(f: Int): Seq[(Long, Option[Long], String)] =
    (0 until FileRows).map { i =>
      val id = f.toLong * FileRows + i
      (id, if (id % 7 == 0) None else Some(id * 3), "s" + (id % 3))
    }

  private def buildLittered(nFiles: Int): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_opt").toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    val lines = (0 until nFiles).map { f =>
      val rows = expected(f)
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("doc_id", rows.map(_._1).toArray),
        ParquetWrite.OptLongCol("v", rows.map(r =>
          r._2.map(java.lang.Long.valueOf).orNull).toArray),
        ParquetWrite.StrCol("s", rows.map(_._3).toArray)))
      val p = s"$base/data/part-$f.parquet"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
      val st = ParquetFile.parse(f.toLong, bytes)
        .filter(r => r.valid && r.col_path == "doc_id" && r.has_stats)
      s"""{"add":{"path":"$p","size":$FileRows""" +
        s""","min_key":${st.map(_.min_long).min}""" +
        s""","max_key":${st.map(_.max_long).max}}}"""
    }
    val d = new java.io.File(s"$base/log/version=0")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/actions.json"),
      lines.mkString("\n").getBytes("UTF-8")): Unit
    base
  }

  private def lake(base: String, asOf: Long = -1L): DataFrame = {
    val r = spark.read.format("graft-lake").option("path", base)
    (if (asOf >= 0) r.option("asOf", asOf) else r).load()
  }

  private def asSet(df: DataFrame): Set[(Long, Option[Long], String)] =
    df.collect().map { r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2))
    }.toSet

  test("content invariant, file count drops, stats stay tight, " +
      "time travel sees the old layout, idempotent") {
    val base = buildLittered(8) // 8 x 100 rows
    val before = asSet(lake(base))
    val r = LakeMaintenance.compact(spark, base, targetRows = 400)
    r.removed shouldBe 8
    r.created shouldBe 2 // two 400-row bins
    r.version shouldBe 1L
    // live set: 2 compacted files, same rows
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    live.size shouldBe 2
    live.foreach(f => f.minKey.isDefined shouldBe true)
    asSet(lake(base)) shouldBe before
    // key-ordered bins: pruning is still one file for a range inside
    // the first half
    lake(base).filter(col("doc_id") < 100L).rdd.getNumPartitions shouldBe 1
    lake(base).filter(col("doc_id") < 100L).count() shouldBe 100L
    // time travel to the pre-compaction snapshot resolves old files
    val old = lake(base, asOf = 0L)
    asSet(old) shouldBe before
    TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", 0L)
      .size shouldBe 8
    // idempotent: nothing below target remains in >= 2-file bins
    val r2 = LakeMaintenance.compact(spark, base, targetRows = 400)
    r2 shouldBe LakeMaintenance.CompactResult(0, 0, -1L)
    TxLog.commitVersions(s"$base/log").max shouldBe 1L
  }

  test("r15 readVersion fence: a merge whose candidates postdate the " +
      "caller's scan snapshot aborts loudly instead of mutating rows " +
      "the scan never saw") {
    val base = buildLittered(2)
    // the caller "scanned" at version 0; a concurrent append then
    // lands at version 1 touching the same key space
    val scanVersion = 0L
    Seq((50L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    // the appended file intersects key 50 → it is a candidate newer
    // than the fence → abort (never a silent delete of unseen rows)
    val e = intercept[IllegalStateException] {
      LakeMaintenance.merge(spark, base, Seq.empty, "doc_id",
        deletes = Seq(50L), readVersion = scanVersion)
    }
    e.getMessage should include("scan snapshot")
    // nothing committed, nothing lost
    asSet(lake(base)).size shouldBe 201
    // without the fence (the whole-snapshot contract) the same merge
    // applies — deleting BOTH occurrences of key 50 is then explicit
    LakeMaintenance.merge(spark, base, Seq.empty, "doc_id",
      deletes = Seq(50L)): Unit
    lake(base).where(col("doc_id") === 50L).count() shouldBe 0L
    // a fence at the current head passes: no candidate postdates it
    val head = TxLog.commitVersions(s"$base/log").max
    LakeMaintenance.merge(spark, base, Seq.empty, "doc_id",
      deletes = Seq(51L), readVersion = head): Unit
    lake(base).where(col("doc_id") === 51L).count() shouldBe 0L
  }

  test("r15 RESTORE: rolls data, deletion vectors AND schema back to " +
      "the target snapshot as one metadata commit; history grows; " +
      "vacuum-reclaimed snapshots refuse") {
    val base = buildLittered(4) // v0: 4 x 100 rows
    val before = asSet(lake(base))
    // v1: compact; v2: small DV delete; v3: big delete rewrite
    LakeMaintenance.compact(spark, base, targetRows = 200): Unit
    LakeMaintenance.merge(spark, base, Seq.empty, "doc_id",
      deletes = Seq(7L)): Unit // v2: deletion vector
    LakeMaintenance.merge(spark, base, Seq.empty, "doc_id",
      deletes = (100L until 180L).toSeq): Unit // v3: rewrite
    // v4: schema evolution after the target
    graft.sources.LakeSource.addColumn(base, "extra", "long"): Unit
    asSet(lake(base).select(col("doc_id"), col("v"), col("s")))
      .size shouldBe 319
    // restore to v1 (post-compaction, pre-deletes, pre-evolution)
    val r = LakeMaintenance.restore(spark, base, version = 1L)
    r.restoredVersion shouldBe 1L
    r.version shouldBe 5L
    // data AND schema are back
    lake(base).schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s")
    asSet(lake(base)) shouldBe before
    // the DV rolled back too: key 7 lives again
    lake(base).where(col("doc_id") === 7L).count() shouldBe 1L
    // history only grew: the pre-restore snapshot still reads
    TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", 3L)
      .nonEmpty shouldBe true
    TxLog.historyLocal(s"$base/log")
      .count(_._2.contains("RESTORE")) shouldBe 1
    // restore to the head: no-op, no commit
    LakeMaintenance.restore(spark, base, version = 5L)
      .version shouldBe -1L
    // a vacuumed snapshot refuses: drop version-0's files, then ask
    // for version 0
    LakeMaintenance.vacuum(base, retainVersions = 2,
      graceMs = 0L): Unit
    val e = intercept[IllegalArgumentException] {
      LakeMaintenance.restore(spark, base, version = 0L)
    }
    e.getMessage should include("no longer restorable")
    // exactly one of version/timestamp
    intercept[IllegalArgumentException] {
      LakeMaintenance.restore(spark, base)
    }
  }

  test("r15 SHALLOW CLONE: one metadata commit, zero data files " +
      "copied; the clone evolves independently and its vacuum never " +
      "touches source files; constraints and protocol carry") {
    val src = buildLittered(4)
    graft.sources.LakeSource.addConstraint(spark, src,
      "v_pos", "v IS NULL OR v >= 0"): Unit
    val dst = java.nio.file.Files
      .createTempDirectory("graft_clone").toFile.getAbsolutePath + "/t"
    val r = LakeMaintenance.cloneTable(spark, src, dst)
    r.files shouldBe 4
    r.version shouldBe 0L
    // zero data files copied
    Option(new java.io.File(s"$dst/data").listFiles()).toSeq.flatten
      .length shouldBe 0
    asSet(lake(dst)) shouldBe asSet(lake(src))
    // the clone evolves independently: delete + append touch ONLY dst
    LakeMaintenance.merge(spark, dst, Seq.empty, "doc_id",
      deletes = (0L until 100L).toSeq): Unit
    Seq((9000L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", dst)
      .mode("append").save()
    lake(dst).count() shouldBe 301L
    lake(src).count() shouldBe 400L // source untouched
    // the carried CONSTRAINT enforces on the clone's appends
    intercept[Exception] {
      Seq((9001L, java.lang.Long.valueOf(-5L), "zz"))
        .toDF("doc_id", "v", "s").coalesce(1)
        .write.format("graft-lake").option("path", dst)
        .mode("append").save()
    }
    // the clone's vacuum sweeps only ITS data dir: source files live
    LakeMaintenance.vacuum(dst, retainVersions = 0, graceMs = 0L): Unit
    lake(src).count() shouldBe 400L
    lake(dst).count() shouldBe 301L
    // cloning onto an existing table rejects
    intercept[IllegalArgumentException] {
      LakeMaintenance.cloneTable(spark, src, dst)
    }
  }

  test("r15 CONVERT in place: an existing Spark-written parquet dir " +
      "becomes a lake table without rewriting a byte; reads, " +
      "pruning, count pushdown and row-level deletes work") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_convert").toFile.getAbsolutePath
    val rows = (0 until 400).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some(i * 3L), "s" + (i % 3))
    }
    rows.toDF("doc_id", "v", "s")
      .repartitionByRange(4, col("doc_id"))
      .write.option("compression", "snappy") // the reader's codec
      .parquet(s"$root/data") // surface; Spark 4 defaults to zstd
    val r = LakeMaintenance.convert(spark, root)
    r.files shouldBe 4
    r.rows shouldBe 400L
    val expectedSet = rows.map(t => (t._1, t._2, t._3)).toSet
    asSet(lake(root)) shouldBe expectedSet
    // footer-derived key windows drive file pruning
    lake(root).where(col("doc_id") === 5L).rdd
      .getNumPartitions shouldBe 1
    // COUNT(*) pushdown answers from the registered sizes
    lake(root).count() shouldBe 400L
    // a converted table is a full lake citizen: row-level delete
    // (the merge machinery reads Spark-written files through our
    // codecs), then time travel back
    LakeMaintenance.merge(spark, root, Seq.empty, "doc_id",
      deletes = Seq(5L, 6L)): Unit
    lake(root).count() shouldBe 398L
    lake(root, asOf = 0L).count() shouldBe 400L
    // double-convert rejects
    intercept[IllegalArgumentException] {
      LakeMaintenance.convert(spark, root)
    }
  }

  test("files at or above the target are left alone; a lone small " +
      "file never rewrites by itself") {
    val base = buildLittered(3)
    // target 150: file pairs pack (100+100 >= 150 after 2) -> one bin
    // of 2, the third file is a single-file bin -> untouched
    val r = LakeMaintenance.compact(spark, base, targetRows = 150)
    r.removed shouldBe 2
    r.created shouldBe 1
    TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
      .size shouldBe 2 // 1 compacted + 1 untouched
    asSet(lake(base)).size shouldBe 300
    // target smaller than every file: full no-op
    LakeMaintenance.compact(spark, base, targetRows = 50) shouldBe
      LakeMaintenance.CompactResult(0, 0, -1L)
  }

  test("VACUUM: unreferenced files and orphans leave the disk, live " +
      "files survive, retention protects the window, idempotent") {
    val base = buildLittered(8)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/orphan.bin"),
      Array[Byte](9, 9, 9)): Unit
    LakeMaintenance.compact(spark, base, targetRows = 400)
    val before = asSet(lake(base))
    def diskFiles(): Set[String] =
      new java.io.File(s"$base/data").listFiles()
        .filter(_.isFile).map(_.getName).toSet
    diskFiles().size shouldBe 11 // 8 small + 2 compacted + orphan

    // retention 1: the pre-compaction snapshot (v0) stays resolvable,
    // so the 8 small files MUST survive; only the orphan goes
    LakeMaintenance.vacuum(base, retainVersions = 1, graceMs = 0L) shouldBe
      LakeMaintenance.VacuumResult(1, 10)
    diskFiles().size shouldBe 10
    asSet(lake(base, asOf = 0L)) shouldBe before

    // retention 0: only the latest snapshot survives on disk
    val r = LakeMaintenance.vacuum(base, retainVersions = 0, graceMs = 0L)
    r.deleted shouldBe 8
    r.retainedFiles shouldBe 2
    diskFiles().size shouldBe 2
    asSet(lake(base)) shouldBe before // live content untouched
    // time travel BEHIND the horizon is gone (the documented trade):
    // resolution still lists the old paths, but their bytes are not
    // on disk any more
    intercept[Exception] {
      lake(base, asOf = 0L).count()
    }
    // idempotent
    LakeMaintenance.vacuum(base, retainVersions = 0, graceMs = 0L) shouldBe
      LakeMaintenance.VacuumResult(0, 2)

    // modification-time grace (ADVICE r11): a just-written orphan —
    // indistinguishable from an in-flight append's not-yet-committed
    // data file — survives a DEFAULT-grace vacuum, and goes only when
    // the caller explicitly waives the window
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/inflight.parquet"),
      Array[Byte](7, 7, 7)): Unit
    LakeMaintenance.vacuum(base, retainVersions = 0) shouldBe
      LakeMaintenance.VacuumResult(0, 2)
    diskFiles() should contain("inflight.parquet")
    LakeMaintenance.vacuum(base, retainVersions = 0, graceMs = 0L) shouldBe
      LakeMaintenance.VacuumResult(1, 2)
  }

  test("MERGE: matched keys replace in place, unmatched insert, " +
      "untouched files stay untouched, one commit") {
    val base = buildLittered(4) // keys 0..399 in 4 files
    val upd = Seq(
      (5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Long.valueOf(9999L), "upd")),
      (105L, Array[Any](java.lang.Long.valueOf(105L),
        null, "upd")), // null value into the nullable column
      (9000L, Array[Any](java.lang.Long.valueOf(9000L),
        java.lang.Long.valueOf(1L), "new")))
    val r = LakeMaintenance.merge(spark, base, upd, "doc_id")
    r.rewritten shouldBe 2 // files 0 and 1 intersect {5, 105}
    r.matched shouldBe 2L
    r.inserted shouldBe 1L
    r.version shouldBe 1L
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    // r15 DV-update: a 1-row update of a 100-row file is merge-on-
    // read — the old file stays (1 dead ordinal) and the updated row
    // re-inserts as a small add: 2 DV'd originals + 2 update adds +
    // 2 untouched + 1 insert file
    live.size shouldBe 7
    // NO data file was rewritten: all four originals keep their paths
    live.count(_.path.contains("/part-")) shouldBe 4
    live.filter(_.path.contains("/part-"))
      .count(_.dvRows == 1L) shouldBe 2
    val df = lake(base)
    df.count() shouldBe 401L
    val got = asSet(df)
    got should contain ((5L, Some(9999L), "upd"))
    got should contain ((105L, None, "upd"))
    got should contain ((9000L, Some(1L), "new"))
    // every other row is byte-identical to the original
    (got -- Set((5L, Some(9999L), "upd"), (105L, None, "upd"),
      (9000L, Some(1L), "new"))) shouldBe
      (0 until 4).flatMap(expected).toSet
        .filterNot(r => r._1 == 5L || r._1 == 105L)
    // file pruning still works over the merged layout
    lake(base).filter(col("doc_id") === 9000L)
      .rdd.getNumPartitions shouldBe 1
  }

  test("MERGE guards: empty changeset no-op, duplicate keys reject, " +
      "oversized changeset rejects") {
    val base = buildLittered(2)
    LakeMaintenance.merge(spark, base, Seq.empty, "doc_id") shouldBe
      LakeMaintenance.MergeResult(0, 0L, 0L, -1L)
    intercept[IllegalArgumentException] {
      LakeMaintenance.merge(spark, base, Seq(
        (1L, Array[Any](java.lang.Long.valueOf(1L),
          java.lang.Long.valueOf(1L), "a")),
        (1L, Array[Any](java.lang.Long.valueOf(1L),
          java.lang.Long.valueOf(2L), "b"))), "doc_id")
    }
    intercept[IllegalArgumentException] {
      LakeMaintenance.merge(spark, base, Seq(
        (1L, Array[Any](java.lang.Long.valueOf(1L),
          java.lang.Long.valueOf(1L), "a"))), "doc_id",
        maxBroadcast = 0)
    }
    TxLog.commitVersions(s"$base/log").max shouldBe 0L // no commits
  }

  test("r12 compaction over the widened type surface: array<float> " +
      "+ double files rewrite content-invariantly (null lists, empty " +
      "lists, null elements, NaN all survive)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_optfp").toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    def emb(id: Long): Array[java.lang.Float] =
      if (id % 11 == 0) null
      else if (id % 13 == 0) Array.empty
      else Array.tabulate[java.lang.Float](1 + (id % 4).toInt) { j =>
        if (j == 2 && id % 5 == 0) null
        else if (j == 1 && id % 17 == 0)
          java.lang.Float.valueOf(Float.NaN)
        else java.lang.Float.valueOf((id * 4 + j).toFloat / 8f)
      }
    val lines = (0 until 4).map { f =>
      val ids = (f * 50L until f * 50L + 50L).toArray
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("vec_id", ids),
        ParquetWrite.OptDoubleCol("score", ids.map(i =>
          if (i % 7 == 0) null
          else java.lang.Double.valueOf(i * 0.25 - 3.0))),
        ParquetWrite.FloatListCol("emb", ids.map(emb))))
      val p = s"$base/data/part-$f.parquet"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
      s"""{"add":{"path":"$p","size":50,"min_key":${ids.head}""" +
        s""","max_key":${ids.last}}}"""
    }
    TxLog.commitVersion(s"$base/log", 0L, lines)
    def read(): Set[(Long, Option[Double], Seq[Option[Float]])] =
      spark.read.format("graft-lake").option("path", base)
        .option("statsCol", "vec_id").load()
        .collect().map { r =>
          (r.getLong(0),
            if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            if (r.isNullAt(2)) null
            else r.getSeq[Any](2).map(v =>
              if (v == null) None else Some(v.asInstanceOf[Float])))
        }.map { case (id, sc, es) =>
          // NaN breaks Set equality: compare via bit pattern
          (id, sc, if (es == null) null
            else es.map(_.map(f =>
              java.lang.Float.intBitsToFloat(
                java.lang.Float.floatToRawIntBits(f)))))
        }.toSet
    def key(s: Set[(Long, Option[Double], Seq[Option[Float]])]) =
      s.map { case (id, sc, es) =>
        (id, sc, if (es == null) "null"
          else es.map(_.map(f =>
            java.lang.Float.floatToIntBits(f).toHexString)
            .getOrElse("n")).mkString(","))
      }
    val before = key(read())
    val r = LakeMaintenance.compact(spark, base, targetRows = 1000)
    r.removed shouldBe 4
    r.created shouldBe 1
    key(read()) shouldBe before
    TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
      .size shouldBe 1
  }

  /** 4 key-sorted files over a 4096-row grid: doc_id 0..4095, b
    * scattered via ×797 mod 4096, s = "s"+(id%3) — every file's (and
    * row group's) b-window spans the whole domain before a z-order. */
  private val ZN = 4096
  private def zbOf(id: Long): Long = (id * 797L) % 4096L
  private def buildZTable(): String = {
    val base = java.nio.file.Files
      .createTempDirectory("graft_zord").toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    val lines = (0 until 4).map { f =>
      val ids = (f * ZN / 4 until (f + 1) * ZN / 4)
        .map(_.toLong).toArray
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("doc_id", ids),
        ParquetWrite.LongCol("b", ids.map(zbOf)),
        ParquetWrite.StrCol("s", ids.map(i => "s" + (i % 3)))),
        rowsPerGroup = 256)
      val p = s"$base/data/part-$f.parquet"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
      s"""{"add":{"path":"$p","size":${ids.length}""" +
        s""","min_key":${ids.head},"max_key":${ids.last}}}"""
    }
    TxLog.commitVersion(s"$base/log", 0L, lines)
    base
  }

  test("r12 Z-ORDER: content-invariant rewrite, ONE commit, " +
      "dataChange=false, and row-group pruning on the SECOND column " +
      "tightens from whole-domain to Z-local") {
    val base = buildZTable()
    val N = ZN
    def bOf(id: Long): Long = zbOf(id)
    def scanRows(pred: org.apache.spark.sql.Column): Long = {
      val q = spark.read.format("graft-lake").option("path", base)
        .load().filter(pred)
      q.collect(): Unit
      q.queryExecution.executedPlan.collectLeaves().head
        .metrics("numOutputRows").value
    }
    val bWin = col("b").between(1000L, 1099L)
    val want = (0L until N.toLong).count(i =>
      bOf(i) >= 1000L && bOf(i) <= 1099L)
    // BEFORE: b is scattered — every row group's window matches and
    // the scan emits the whole table
    scanRows(bWin) shouldBe N.toLong
    val before = spark.read.format("graft-lake").option("path", base)
      .load().collect().map(_.toSeq).toSet
    val r = LakeMaintenance.zorder(spark, base, Seq("doc_id", "b"),
      targetRows = 1024, rowsPerGroup = 128)
    r.removed shouldBe 4
    r.created should be >= 4
    r.version shouldBe 1L
    // content invariant
    spark.read.format("graft-lake").option("path", base)
      .load().collect().map(_.toSeq).toSet shouldBe before
    // THE LAYOUT PROPERTY (r13 — the deterministic re-anchor of the
    // r12 knife-edge gate): every 128-row row group of every output
    // file spans a bounded Z-LOCAL window on BOTH dimensions. 128
    // consecutive z-cells of a 32-bit curve over a 4096×4096 value
    // grid cover at most ~1024 (dim A) × ~2048 (dim B) values — the
    // gate asserts ≤ 2048 on both with that analysis as the margin,
    // against the 4096 whole-domain span a key-sorted layout gives b.
    val liveFiles = TxLog.resolveLiveLocal(
      s"$base/log", s"$base/ckpt", -1L)
    liveFiles.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f.path))
      Seq("doc_id", "b").foreach { c =>
        val st = ParquetFile.parse(0L, bytes)
          .filter(r => r.valid && r.has_stats && r.col_path == c)
        st should not be empty
        st.foreach { rg =>
          (rg.max_long - rg.min_long) should be <= 2048L
        }
      }
    }
    // AFTER: the same b-window touches a small fraction of row groups
    val after = scanRows(bWin)
    after should be >= want.toLong
    after should be <= (N / 2).toLong // was the WHOLE table before
    // DETERMINISM: the layout is a pure function of the data — the
    // per-file (rows, min_key, max_key) multiset of a TWIN table's
    // rewrite is identical (r12's sampled repartitionByRange was not)
    val layout1 = liveFiles.map(f => (f.size, f.minKey, f.maxKey))
      .sortBy(t => (t._1, t._2.getOrElse(0L))).toList
    val twin = buildZTable()
    LakeMaintenance.zorder(spark, twin, Seq("doc_id", "b"),
      targetRows = 1024, rowsPerGroup = 128): Unit
    TxLog.resolveLiveLocal(s"$twin/log", s"$twin/ckpt", -1L)
      .map(f => (f.size, f.minKey, f.maxKey))
      .sortBy(t => (t._1, t._2.getOrElse(0L))).toList shouldBe layout1
    // doc_id file pruning still works from the new adds' stats
    spark.read.format("graft-lake").option("path", base).load()
      .filter(col("doc_id") === 7L).count() shouldBe 1L
    // the rewrite is dataChange=false: a change feed emits the table
    // once (v0), never the zorder commit
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ck = java.nio.file.Files.createTempDirectory("zord_ck").toString
    val q = spark.readStream.format("graft-lake").option("path", base)
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", ck)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => got += r.getLong(0))
      }
      .start()
    q.awaitTermination()
    got.size shouldBe N
    // time travel to the pre-zorder layout still resolves
    spark.read.format("graft-lake").option("path", base)
      .option("asOf", 0).load().count() shouldBe N.toLong
  }

  test("r13 Z-ORDER over THREE dimensions with a STRING dim: file " +
      "pruning works on the statsCol windows AND the strStatsCol " +
      "skey windows; content invariant") {
    val base = buildZTable() // doc_id, b (long), s in {s0,s1,s2}
    val before = spark.read.format("graft-lake").option("path", base)
      .load().collect().map(_.toSeq).toSet
    val r = LakeMaintenance.zorder(spark, base,
      Seq("doc_id", "b", "s"), targetRows = 512, rowsPerGroup = 128,
      statsCol = "doc_id", strStatsCol = Some("s"))
    r.removed shouldBe 4
    r.created should be >= 8
    spark.read.format("graft-lake").option("path", base)
      .load().collect().map(_.toSeq).toSet shouldBe before
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    // every add carries BOTH window kinds
    live.foreach { f =>
      f.minKey.isDefined shouldBe true
      f.minSkey.isDefined shouldBe true
    }
    def planned(df: DataFrame): Int = df.rdd.getNumPartitions
    val lk = spark.read.format("graft-lake").option("path", base)
      .option("strStatsCol", "s").load()
    // the string dim clusters: the rank-bucketed top value "s2" is
    // separated at the dim's HIGH z-bit, so its equality predicate
    // prunes the files whose skey window tops out at "s1" (a z-curve
    // gives each of 3 dims ~1/3 of the locality — the LOW value "s0"
    // still appears in every file; that is the curve, not a bug)
    planned(lk.filter(col("s") === "s2")) should be < live.size
    lk.filter(col("s") === "s2").count() shouldBe
      (0 until ZN).count(_ % 3 == 2).toLong
    // every value still reads correctly through the residual filter
    lk.filter(col("s") === "s0").count() shouldBe
      (0 until ZN).count(_ % 3 == 0).toLong
    // and doc_id file pruning still works from the statsCol windows
    planned(lk.filter(col("doc_id") < 256L)) should be < live.size
    lk.filter(col("doc_id") < 256L).count() shouldBe 256L
  }

  test("r13 Z-ORDER by columns that do NOT include the reader's " +
      "statsCol: windows are measured on statsCol (never on a z " +
      "column) — scans stay correct (ADVICE r12)") {
    val base = buildZTable()
    // cluster by (b, s); readers prune on doc_id — the r12 bug wrote
    // b-windows that readers then interpreted as doc_id windows
    val r = LakeMaintenance.zorder(spark, base, Seq("b", "s"),
      targetRows = 1024, rowsPerGroup = 128, statsCol = "doc_id")
    r.removed shouldBe 4
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    live.foreach(f => f.minKey.isDefined shouldBe true)
    val lk = spark.read.format("graft-lake").option("path", base).load()
    // every doc_id equality must still find its row — a wrong window
    // silently prunes the file that holds it
    lk.filter(col("doc_id") === 7L).count() shouldBe 1L
    lk.filter(col("doc_id") === 4000L).count() shouldBe 1L
    lk.count() shouldBe ZN.toLong
    // absent statsCol: windows are OMITTED, never fabricated — the
    // table degrades to scan and stays correct
    val base2 = buildZTable()
    LakeMaintenance.zorder(spark, base2, Seq("b", "s"),
      targetRows = 1024, rowsPerGroup = 128, statsCol = "nope"): Unit
    val live2 = TxLog.resolveLiveLocal(
      s"$base2/log", s"$base2/ckpt", -1L)
    live2.foreach(f => f.minKey shouldBe None)
    spark.read.format("graft-lake").option("path", base2).load()
      .count() shouldBe ZN.toLong
  }

  test("r13 concurrent append vs compact: the append's collision " +
      "retries, compaction's read set is intact — both land") {
    val base = buildLittered(8)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future {
      Seq((9999L, java.lang.Long.valueOf(1L), "zz"))
        .toDF("doc_id", "v", "s").coalesce(1)
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    }
    val fc = Future {
      LakeMaintenance.compact(spark, base, targetRows = 400)
    }
    Await.result(fa, 120.seconds)
    val rc = Await.result(fc, 120.seconds)
    rc.removed shouldBe 8
    // both effects are visible: 800 original + 1 appended row
    asSet(lake(base)).size shouldBe 801
    lake(base).filter(col("doc_id") === 9999L).count() shouldBe 1L
    TxLog.commitVersions(s"$base/log").size shouldBe 3 // v0 + both
  }

  test("MERGE delete arm (r12): scattered deletes drop rows in " +
      "place, a fully-deleted file commits as a remove-only " +
      "tombstone, and update+delete compose in one commit") {
    val base = buildLittered(4) // keys 0..399 in 4 files
    // delete ALL of file 1 (100..199) plus scattered %31 keys; update
    // key 5; keys must be disjoint between the two arms
    val dels = (100L until 200L) ++
      (0L until 400L).filter(k => k % 31 == 0 && (k < 100 || k >= 200))
    val r = LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Long.valueOf(777L), "upd"))),
      "doc_id", deletes = dels.toSeq)
    r.version shouldBe 1L
    r.matched shouldBe 1L
    r.deleted shouldBe dels.size.toLong
    r.rewritten shouldBe 4 // every file intersects the key span
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    // file 1 died entirely (remove-only tombstone, NO empty file);
    // file 0's small update+delete touch is merge-on-read (r15 DV
    // update: original kept + 1-row re-insert); files 2/3 carry
    // delete-only DVs
    live.size shouldBe 4
    live.foreach(f => f.size should be > 0L)
    live.find(_.path.contains("part-0")).get.dvRows shouldBe 5L
    val got = asSet(lake(base))
    got.size shouldBe 400 - dels.size
    got should contain ((5L, Some(777L), "upd"))
    got.map(_._1).intersect(dels.toSet) shouldBe empty
    (got -- Set((5L, Some(777L), "upd"))) shouldBe
      (0 until 4).flatMap(expected).toSet
        .filterNot(row => dels.contains(row._1) || row._1 == 5L)
    // disjointness guard: a key in both arms rejects
    intercept[IllegalArgumentException] {
      LakeMaintenance.merge(spark, base,
        Seq((7L, Array[Any](java.lang.Long.valueOf(7L),
          java.lang.Long.valueOf(1L), "a"))),
        "doc_id", deletes = Seq(7L))
    }
  }

  test("r13 MERGE over the WIDENED type surface: update/delete/" +
      "insert against array<float> + double columns (the q233 " +
      "embeddings shape) — null lists, null elements, NaN survive") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_mrgfp").toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    def emb(id: Long): Array[java.lang.Float] =
      if (id % 11 == 0) null
      else if (id % 13 == 0) Array.empty
      else Array.tabulate[java.lang.Float](1 + (id % 4).toInt) { j =>
        if (j == 2 && id % 5 == 0) null
        else if (j == 1 && id % 17 == 0)
          java.lang.Float.valueOf(Float.NaN)
        else java.lang.Float.valueOf((id * 4 + j).toFloat / 8f)
      }
    val lines = (0 until 4).map { f =>
      val ids = (f * 50L until f * 50L + 50L).toArray
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("vec_id", ids),
        ParquetWrite.OptDoubleCol("score", ids.map(i =>
          if (i % 7 == 0) null
          else java.lang.Double.valueOf(i * 0.25 - 3.0))),
        ParquetWrite.FloatListCol("emb", ids.map(emb))))
      val p = s"$base/data/part-$f.parquet"
      java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
      s"""{"add":{"path":"$p","size":50,"min_key":${ids.head}""" +
        s""","max_key":${ids.last}}}"""
    }
    TxLog.commitVersion(s"$base/log", 0L, lines)
    def key(df: DataFrame): Set[(Long, Option[Double], String)] =
      df.collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) "null"
          else r.getSeq[Any](2).map(v =>
            if (v == null) "n"
            else java.lang.Float.floatToIntBits(
              v.asInstanceOf[Float]).toHexString).mkString(","))
      }.toSet
    def lakeFp(): DataFrame =
      spark.read.format("graft-lake").option("path", base)
        .option("statsCol", "vec_id").load()
    val before = key(lakeFp())
    // update key 5 (new score + list with a null element), update key
    // 60 to ALL-NULL values, delete file 3 entirely + scattered keys,
    // insert 9000 — one commit
    val upd = Seq(
      (5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Double.valueOf(2.5),
        Array[java.lang.Float](java.lang.Float.valueOf(1f), null,
          java.lang.Float.valueOf(3f)))),
      (60L, Array[Any](java.lang.Long.valueOf(60L), null, null)),
      (9000L, Array[Any](java.lang.Long.valueOf(9000L),
        java.lang.Double.valueOf(1.25),
        Array[java.lang.Float](java.lang.Float.valueOf(9f)))))
    val dels = (150L until 200L) ++ Seq(7L, 63L)
    val r = LakeMaintenance.merge(spark, base, upd, "vec_id",
      deletes = dels.toSeq)
    r.matched shouldBe 2L
    r.inserted shouldBe 1L
    r.deleted shouldBe dels.size.toLong
    r.rewritten shouldBe 3 // files 0, 1, 3 intersect the key span
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    // file 3 died entirely (tombstone); file 2 untouched; files 0/1
    // took small update+delete touches → merge-on-read (r15 DV
    // update), originals kept with 2 dead ordinals each
    live.count(_.path.contains("/part-")) shouldBe 3
    live.filter(f => f.path.contains("part-0") ||
      f.path.contains("part-1")).map(_.dvRows) shouldBe Seq(2L, 2L)
    val got = key(lakeFp())
    got.size shouldBe 200 - dels.size + 1
    got should contain ((5L, Some(2.5),
      Seq(java.lang.Float.floatToIntBits(1f).toHexString, "n",
        java.lang.Float.floatToIntBits(3f).toHexString).mkString(",")))
    got should contain ((60L, None, "null"))
    got should contain ((9000L, Some(1.25),
      java.lang.Float.floatToIntBits(9f).toHexString))
    // every untouched row is bit-identical
    (got -- Set(got.find(_._1 == 5L).get, (60L, None, "null"),
      got.find(_._1 == 9000L).get)) shouldBe
      before.filterNot(row => dels.contains(row._1) ||
        row._1 == 5L || row._1 == 60L)
  }

  test("r13 ROW-LEVEL change feed: a changeFeed stream drains " +
      "inserts, then MERGE's delete/update pre+post images from the " +
      "cdc sidecars — bit-identical to the batch diff; maintenance " +
      "rewrites stay silent") {
    val base = buildLittered(4) // doc_id 0..399, v, s
    import org.apache.spark.sql.Row
    val feed = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Option[Long], String, String)]
    val ck = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("path", base).option("changeFeed", "true").load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("doc_id", "v", "s", "_change_type").collect()
            .foreach { r: Row =>
              feed += ((r.getLong(0),
                if (r.isNullAt(1)) None else Some(r.getLong(1)),
                r.getString(2), r.getString(3)))
            }
        }
        .start()
      q.awaitTermination()
    }
    drain() // phase 1: the bootstrap — every row an insert
    feed.size shouldBe 400
    feed.forall(_._4 == "insert") shouldBe true
    feed.clear()
    // phase 2: merge (update 5, delete 100..119 and 333, insert 9000)
    val dels = (100L until 120L) :+ 333L
    LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
          java.lang.Long.valueOf(777L), "upd")),
        (9000L, Array[Any](java.lang.Long.valueOf(9000L),
          java.lang.Long.valueOf(1L), "new"))),
      "doc_id", deletes = dels): Unit
    drain()
    // the feed is exactly the row-level diff — no rewritten-file
    // re-emission (the whole point vs the add-level tail)
    feed.size shouldBe (dels.size + 2 + 1)
    feed.count(_._4 == "delete") shouldBe dels.size
    feed.filter(_._4 == "delete").map(_._1).toSet shouldBe dels.toSet
    feed.filter(_._4 == "update_preimage").toList shouldBe
      List((5L, Some(15L), "s2", "update_preimage"))
    feed.filter(_._4 == "update_postimage").toList shouldBe
      List((5L, Some(777L), "upd", "update_postimage"))
    feed.filter(_._4 == "insert").toList shouldBe
      List((9000L, Some(1L), "new", "insert"))
    feed.clear()
    // phase 3: compaction is dataChange=false — silent in the feed
    LakeMaintenance.compact(spark, base, targetRows = 1 << 20): Unit
    drain()
    feed shouldBe empty
    // phase 4: a plain append arrives as inserts
    Seq((9500L, java.lang.Long.valueOf(2L), "ap"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    drain()
    feed.toList shouldBe List((9500L, Some(2L), "ap", "insert"))
    // batch CDF (Delta's table_changes): an explicit version range
    // replays the same change rows without a stream
    def cdf(from: Long, to: Long): DataFrame =
      spark.read.format("graft-lake").option("path", base)
        .option("changeFeed", "true").option("cdfFrom", from)
        .option("cdfTo", to).load()
    // version 1 is the merge: exactly the row-level diff
    val v1 = cdf(1L, 1L).groupBy(col("_change_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    v1 shouldBe Map("delete" -> dels.size.toLong,
      "update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 1L)
    // the full range: bootstrap + diff + append, compact silent
    cdf(0L, -1L).count() shouldBe (400L + dels.size + 3L + 1L)
    // a batch read WITHOUT a range fails loudly, never null-fills
    intercept[Exception] {
      spark.read.format("graft-lake").option("path", base)
        .option("changeFeed", "true").load().count()
    }
  }

  test("r13 PARTITION-AWARE compaction: bins never cross partition " +
      "values, rewritten adds keep part + union skey windows, and " +
      "OPTIMIZE WHERE touches only the named partition") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cpart").toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    // 9 small files: 3 per partition value, each with skey stats
    val lines = (0 until 9).map { f =>
      val pv = Seq("a", "b", "c")(f % 3)
      val ids = (f * 10L until f * 10L + 10L).toArray
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("doc_id", ids),
        ParquetWrite.StrCol("p", ids.map(_ => pv)),
        ParquetWrite.StrCol("s2",
          ids.map(i => "k" + "%03d".format(i)))))
      val path = s"$base/data/part-$f.parquet"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path), bytes): Unit
      s"""{"add":{"path":"$path","size":10""" +
        s""","min_key":${ids.head},"max_key":${ids.last}""" +
        s""","min_skey":"k${"%03d".format(ids.head)}"""" +
        s""","max_skey":"k${"%03d".format(ids.last)}"""" +
        s""","part":"$pv"}}"""
    }
    TxLog.commitVersion(s"$base/log", 0L, lines)
    def lakeP(): DataFrame = spark.read.format("graft-lake")
      .option("path", base).option("partitionBy", "p")
      .option("strStatsCol", "s2").load()
    val before = lakeP().collect().map(_.toSeq).toSet
    // OPTIMIZE WHERE p = 'a': only partition a's 3 files rewrite
    val r1 = LakeMaintenance.compact(spark, base, targetRows = 1000,
      partition = Some("a"))
    r1.removed shouldBe 3
    r1.created shouldBe 1
    // full compaction then folds b and c — but never across values
    val r2 = LakeMaintenance.compact(spark, base, targetRows = 1000)
    r2.removed shouldBe 6
    r2.created shouldBe 2
    lakeP().collect().map(_.toSeq).toSet shouldBe before
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    live.size shouldBe 3
    // every rewritten file kept its part AND a union skey window
    live.foreach { f =>
      f.part.isDefined shouldBe true
      f.minSkey.isDefined shouldBe true
    }
    // partition pruning still plans ONE file per value post-compact
    lakeP().filter(col("p") === "b").rdd.getNumPartitions shouldBe 1
    lakeP().filter(col("p") === "b").count() shouldBe 30L
    // skey pruning also survived the rewrite
    lakeP().filter(col("s2") === "k005").rdd
      .getNumPartitions shouldBe 1
  }

  test("r13 CHECK constraints: analyzed at ADD (existing violations " +
      "reject), enforced per-row on batch and streaming appends " +
      "(NULL passes), folded into checkpoints across expiry, " +
      "dropped cleanly") {
    val base = buildLittered(2) // doc_id 0..199, v (null %7), s
    // a constraint existing rows violate rejects before any commit
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.addConstraint(spark, base,
        "small", "doc_id < 100")
    }
    TxLog.commitVersions(s"$base/log").max shouldBe 0L
    graft.sources.LakeSource.addConstraint(spark, base,
      "sane", "doc_id >= 0 AND s IN ('s0','s1','s2','upd')") shouldBe 1L
    // valid append passes; v stays NULL-able (NULL passes the check)
    Seq((9000L, null.asInstanceOf[java.lang.Long], "upd"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).count() shouldBe 201L
    // a violating batch append fails LOUDLY and commits nothing
    val vBefore = TxLog.commitVersions(s"$base/log").max
    intercept[Exception] {
      Seq((-5L, java.lang.Long.valueOf(1L), "s0"))
        .toDF("doc_id", "v", "s").coalesce(1)
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    }
    TxLog.commitVersions(s"$base/log").max shouldBe vBefore
    lake(base).count() shouldBe 201L
    // a violating STREAMING epoch fails before its commit
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext =
      spark.sqlContext
    val ms = MemoryStream[(Long, Long, String)]
    ms.addData((1L, 1L, "BAD"))
    val ck = java.nio.file.Files.createTempDirectory("cons_ck").toString
    val q = ms.toDF().toDF("doc_id", "v", "s")
      .writeStream.format("graft-lake").option("path", base)
      .option("checkpointLocation", ck)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    intercept[Exception] { q.awaitTermination() }
    lake(base).count() shouldBe 201L
    // constraints survive checkpoint + log expiry (consState fold)
    val head = TxLog.commitVersions(s"$base/log").max
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", head)
    LakeMaintenance.expireLog(base, keepVersions = 0): Unit
    TxLog.activeConstraintsFast(s"$base/log", s"$base/ckpt", -1L)
      .map(_.name) shouldBe Seq("sane")
    intercept[Exception] {
      Seq((-6L, java.lang.Long.valueOf(1L), "s0"))
        .toDF("doc_id", "v", "s").coalesce(1)
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    }
    // drop re-allows
    graft.sources.LakeSource.dropConstraint(base, "sane"): Unit
    Seq((-6L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).count() shouldBe 202L
    // guards
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.dropConstraint(base, "nope")
    }
  }

  test("r13 constraints compose with evolution and MERGE: a " +
      "rename/drop of a constrained column rejects (appends would " +
      "brick), and a violating merge changeset rejects before any " +
      "commit") {
    val base = buildLittered(2)
    graft.sources.LakeSource.addConstraint(spark, base,
      "vpos", "v IS NULL OR v >= 0"): Unit
    val vBefore = TxLog.commitVersions(s"$base/log").max
    // rename/drop of the constrained column rejects loudly
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.renameColumn(base, "v", "w")
    }
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.dropColumn(base, "v")
    }
    // an UNCONSTRAINED column still evolves freely
    graft.sources.LakeSource.renameColumn(base, "s", "s1") shouldBe
      vBefore + 1
    // a violating merge UPDATE rejects before any commit
    val vb2 = TxLog.commitVersions(s"$base/log").max
    intercept[IllegalArgumentException] {
      LakeMaintenance.merge(spark, base,
        Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
          java.lang.Long.valueOf(-7L), "bad"))), "doc_id")
    }
    TxLog.commitVersions(s"$base/log").max shouldBe vb2
    // a compliant merge (incl. NULL — the CHECK rule) lands
    val r = LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L), null, "ok"))),
      "doc_id")
    r.matched shouldBe 1L
    asSet(lake(base).select(col("doc_id"), col("v"),
      col("s1").as("s"))) should contain ((5L, None, "ok"))
  }

  test("r13 review: two RACING compactions of the same read set — " +
      "exactly one wins, the loser aborts cleanly or no-ops, content " +
      "never duplicates") {
    val base = buildLittered(8)
    val before = asSet(lake(base))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def run(): Either[Throwable, LakeMaintenance.CompactResult] =
      try Right(LakeMaintenance.compact(spark, base, targetRows = 400))
      catch { case t: Throwable => Left(t) }
    val f1 = Future(run()); val f2 = Future(run())
    val r1 = Await.result(f1, 300.seconds)
    val r2 = Await.result(f2, 300.seconds)
    // exactly one rewrite landed; the other aborted loudly (stale
    // read set) or no-opped (serialized after the winner)
    val wins = Seq(r1, r2).count {
      case Right(r) => r.removed == 8
      case Left(_) => false
    }
    wins shouldBe 1
    Seq(r1, r2).foreach {
      case Right(r) => r.removed should (be(8) or be(0))
      case Left(t) =>
        t.getMessage should include("maintenance conflict")
    }
    // the law that matters: content is invariant — a double-applied
    // rewrite would duplicate all 800 rows
    asSet(lake(base)) shouldBe before
    lake(base).count() shouldBe 800L
  }

  test("r13 review: collision classification — only a real version " +
      "collision is retryable; z-order on a partitioned table is " +
      "per-partition and keeps part") {
    val base = buildLittered(2)
    intercept[TxLog.CommitCollisionException] {
      TxLog.commitVersion(s"$base/log", 0L, Seq("""{"x":1}"""))
    }
    // z-order: partitioned tables must name a partition
    val pbase = java.nio.file.Files
      .createTempDirectory("graft_zpart").toFile.getAbsolutePath
    new java.io.File(s"$pbase/data").mkdirs()
    val lines = (0 until 4).map { f =>
      val pv = Seq("a", "b")(f % 2)
      val ids = (f * 100L until f * 100L + 100L).toArray
      val bytes = ParquetWrite.writeFile(Seq(
        ParquetWrite.LongCol("doc_id", ids),
        ParquetWrite.LongCol("h", ids.map(i => (i * 797L) % 4096L)),
        ParquetWrite.StrCol("p", ids.map(_ => pv))),
        rowsPerGroup = 64)
      val path = s"$pbase/data/part-$f.parquet"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path), bytes): Unit
      s"""{"add":{"path":"$path","size":100""" +
        s""","min_key":${ids.head},"max_key":${ids.last}""" +
        s""","part":"$pv"}}"""
    }
    TxLog.commitVersion(s"$pbase/log", 0L, lines)
    intercept[IllegalArgumentException] {
      LakeMaintenance.zorder(spark, pbase, Seq("doc_id", "h"),
        targetRows = 200)
    }
    val before = spark.read.format("graft-lake").option("path", pbase)
      .option("partitionBy", "p").load().collect().map(_.toSeq).toSet
    val r = LakeMaintenance.zorder(spark, pbase, Seq("doc_id", "h"),
      targetRows = 200, partition = Some("p" -> "a"))
    r.removed shouldBe 2 // only partition a's files
    val live = TxLog.resolveLiveLocal(s"$pbase/log", s"$pbase/ckpt", -1L)
    live.size shouldBe (4 - 2 + r.created)
    live.foreach(f => f.part.isDefined shouldBe true) // part KEPT
    val lk = spark.read.format("graft-lake").option("path", pbase)
      .option("partitionBy", "p").load()
    lk.collect().map(_.toSeq).toSet shouldBe before
    // partition pruning survives the rewrite on BOTH values
    lk.filter(col("p") === "b").rdd.getNumPartitions shouldBe 2
    lk.filter(col("p") === "b").count() shouldBe 200L
    lk.filter(col("p") === "a").count() shouldBe 200L
  }

  test("r13 review: merge constraint checks align through the column " +
      "mapping after DROP COLUMN (file-leaf order != logical order)") {
    val base = buildLittered(2) // (doc_id, v, s) in the files
    graft.sources.LakeSource.addConstraint(spark, base,
      "s_ok", "s IN ('s0','s1','s2','ok')"): Unit
    graft.sources.LakeSource.dropColumn(base, "v"): Unit
    // logical schema is now (doc_id, s); files carry 3 leaves; the
    // changeset stays in FILE order — the check must evaluate the
    // logical slots, not positional ones
    val r = LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Long.valueOf(1L), "ok"))), "doc_id")
    r.matched shouldBe 1L
    lake(base).where(col("doc_id") === 5L).head().getString(1)
      .shouldBe("ok")
    // and a violating value in the LOGICAL column still rejects
    intercept[IllegalArgumentException] {
      LakeMaintenance.merge(spark, base,
        Seq((6L, Array[Any](java.lang.Long.valueOf(6L),
          java.lang.Long.valueOf(1L), "BAD"))), "doc_id")
    }
  }

  test("r13 commit provenance: every engine write path stamps its " +
      "operation; hand-built commits read back as None; parsers all " +
      "skip the line") {
    val base = buildLittered(2) // hand-built v0: no provenance
    Seq((9000L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Long.valueOf(1L), "u"))), "doc_id"): Unit
    LakeMaintenance.compact(spark, base, targetRows = 1 << 20): Unit
    graft.sources.LakeSource.addColumn(base, "score", "double"): Unit
    graft.sources.LakeSource.renameColumn(base, "score", "sc"): Unit
    graft.sources.LakeSource.dropColumn(base, "sc"): Unit
    graft.sources.LakeSource.addConstraint(spark, base,
      "pos", "doc_id >= 0"): Unit
    graft.sources.LakeSource.dropConstraint(base, "pos"): Unit
    val ops = TxLog.historyLocal(s"$base/log").map(_._2)
    ops shouldBe Seq(None, Some("APPEND"), Some("MERGE"),
      Some("OPTIMIZE"), Some("ADD COLUMN"), Some("RENAME COLUMN"),
      Some("DROP COLUMN"), Some("ADD CONSTRAINT"),
      Some("DROP CONSTRAINT"))
    // rows-added accounting: the append carried 1 row
    TxLog.historyLocal(s"$base/log")
      .find(_._2.contains("APPEND")).get._3 shouldBe 1L
    // the line is invisible to every other parser: content + schema
    // + pruning all unchanged
    lake(base).count() shouldBe 201L
    lake(base).filter(col("doc_id") === 9000L).count() shouldBe 1L
  }

  test("r13 TIMESTAMP time travel: asOfTs resolves the newest commit " +
      "whose mtime is at or before it; explicit asOf wins; a " +
      "too-early timestamp rejects") {
    val base = buildLittered(2) // v0
    Seq((9000L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save() // v1
    // pin deterministic mtimes
    val t0 = 1700000000000L
    new java.io.File(s"$base/log/version=0")
      .setLastModified(t0) shouldBe true
    new java.io.File(s"$base/log/version=1")
      .setLastModified(t0 + 60000L) shouldBe true
    def at(ts: Long): DataFrame = spark.read.format("graft-lake")
      .option("path", base).option("asOfTs", ts).load()
    at(t0).count() shouldBe 200L            // between v0 and v1
    at(t0 + 30000L).count() shouldBe 200L
    at(t0 + 60000L).count() shouldBe 201L   // at v1
    at(System.currentTimeMillis()).count() shouldBe 201L
    intercept[IllegalArgumentException] {
      at(t0 - 1L).count()
    }
    // explicit asOf wins over asOfTs
    spark.read.format("graft-lake").option("path", base)
      .option("asOf", 0).option("asOfTs", t0 + 60000L).load()
      .count() shouldBe 200L
  }

  test("r13 LOG EXPIRY: a format-2 checkpoint carries the folded " +
      "file/schema/txn state, so reads, evolution and the sink fence " +
      "survive the truncation; behind-horizon time travel fails " +
      "loudly, never partially") {
    val base = buildLittered(4) // v0: 400 rows in 4 files
    // v1: merge (update + delete + cdc sidecars)
    LakeMaintenance.merge(spark, base,
      Seq((5L, Array[Any](java.lang.Long.valueOf(5L),
        java.lang.Long.valueOf(777L), "upd"))),
      "doc_id", deletes = Seq(100L, 101L)): Unit
    // v2: ADD COLUMN (a metaData action that will be EXPIRED)
    graft.sources.LakeSource.addColumn(base, "score", "double") shouldBe 2L
    // v3: an append carrying the evolved schema
    Seq((9000L, java.lang.Long.valueOf(1L), "zz",
        java.lang.Double.valueOf(2.5)))
      .toDF("doc_id", "v", "s", "score").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    // v4: a streaming-sink txn fence (hand-committed — the fence law
    // is what matters: latestTxnFast must survive expiry)
    TxLog.commitVersion(s"$base/log", 4L,
      Seq("""{"txn":{"app":"appX","epoch":7}}"""))
    val before = lake(base).drop("score").collect().map(_.toSeq).toSet
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 4L)
    TxLog.isCheckpointV2(s"$base/ckpt", 4L) shouldBe true

    val r = LakeMaintenance.expireLog(base, keepVersions = 1)
    r.deletedVersions shouldBe 4 // v0..v3 gone, v4 kept
    TxLog.commitVersions(s"$base/log") shouldBe Seq(4L)
    // content, schema (from the folded metaState) and pruning intact
    val df = lake(base)
    df.schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s", "score")
    df.drop("score").collect().map(_.toSeq).toSet shouldBe before
    df.where(col("score").isNotNull).count() shouldBe 1L
    // the sink fence survives in the checkpoint's txnState
    TxLog.latestTxnFast(s"$base/log", s"$base/ckpt", "appX") shouldBe
      Some(7L)
    // behind-horizon time travel fails LOUDLY (no partial replay)
    intercept[IllegalStateException] {
      TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", 0L)
    }
    // the table keeps working: append, re-checkpoint (folds prev
    // checkpoint ∪ tail — no full history needed), expire again
    Seq((9001L, java.lang.Long.valueOf(2L), "yy",
        java.lang.Double.valueOf(1.0)))
      .toDF("doc_id", "v", "s", "score").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 5L)
    LakeMaintenance.expireLog(base, keepVersions = 0)
      .deletedVersions shouldBe 2
    lake(base).count() shouldBe before.size.toLong + 1L
    lake(base).where(col("doc_id") === 9001L).count() shouldBe 1L
    // the EMPTY-TAIL case (review follow-up): the log is now empty,
    // every checkpoint is above asOf=3 — resolution must refuse, not
    // silently return an empty snapshot
    intercept[IllegalStateException] {
      TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", 3L)
    }
    // evolution after expiry: drop + re-add needs NO history — the
    // fresh-phys rule (c<version>_) is monotone by commit version,
    // so the re-added column reads NULL even though pre-expiry files
    // still physically carry the old bytes
    graft.sources.LakeSource.dropColumn(base, "s"): Unit
    graft.sources.LakeSource.addColumn(base, "s", "string"): Unit
    lake(base).where(col("s").isNotNull).count() shouldBe 0L
  }

  test("the streaming tail SKIPS compaction commits (r12: " +
      "dataChange=false — maintenance never re-emits rows)") {
    val base = buildLittered(4)
    LakeMaintenance.compact(spark, base, targetRows = 400)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val ck = java.nio.file.Files.createTempDirectory("opt_ck").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake").option("path", base)
        .load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("doc_id").collect().foreach(r => got += r.getLong(0))
        }
        .start()
      q.awaitTermination()
    }
    drain()
    // v0 adds (4 files) arrive ONCE; v1's compaction rewrite of the
    // same 400 rows carries dataChange=false and is skipped — the
    // r11 re-emission wart is fixed (Delta's dataChange contract)
    got.size shouldBe 400
    got.toSet shouldBe (0L until 400L).toSet
    // a subsequent DATA-changing append still arrives exactly once
    Seq((9999L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    drain()
    got.size shouldBe 401
    got.last shouldBe 9999L
  }

  test("r14 advice: a maintenance commit whose read set was " +
      "invalidated by an EARLIER-landing rewrite aborts cleanly and " +
      "deletes its written files — never a stale-snapshot commit") {
    val base = buildLittered(4)
    val live = TxLog.resolveLiveLocal(s"$base/log", s"$base/ckpt", -1L)
    // a conflicting rewrite lands FIRST: it removes live file 0 and
    // re-adds its content under a new path (simulates a concurrent
    // compaction that finished while "our" rewrite ran on executors)
    val victim = live.head.path
    val moved = victim.replace(".parquet", "-moved.parquet")
    java.nio.file.Files.copy(java.nio.file.Paths.get(victim),
      java.nio.file.Paths.get(moved)): Unit
    TxLog.commitVersion(s"$base/log", 1L, Seq(
      s"""{"remove":{"path":"$victim"}}""",
      s"""{"add":{"path":"$moved","size":$FileRows,"dataChange":false}}"""))
    // "our" rewrite believes victim is still live: commitMaintenance
    // must abort (read-set re-validation) and clean up its output,
    // even though its rename would NOT collide (v2 is free)
    val orphan = s"$base/data/would-be-output.parquet"
    java.nio.file.Files.write(java.nio.file.Paths.get(orphan),
      Array[Byte](1, 2, 3)): Unit
    val t = intercept[IllegalStateException] {
      LakeMaintenance.commitMaintenance(base, Seq(victim),
        Seq(s"""{"remove":{"path":"$victim"}}""",
          s"""{"add":{"path":"$orphan","size":1}}"""), Seq(orphan))
    }
    t.getMessage should include("maintenance conflict")
    new java.io.File(orphan).exists() shouldBe false
    // no version landed beyond the conflicting rewrite's v1
    TxLog.commitVersions(s"$base/log").max shouldBe 1L
    // content unchanged through the conflict
    asSet(lake(base)) shouldBe (0 until 4).flatMap(expected).toSet
  }

  test("r14 advice: log expiry hides commits ATOMICALLY — a crashed " +
      "expiry's dot-temp dir is invisible to every resolver, and a " +
      "completed expiry leaves no temp debris") {
    val base = buildLittered(4)
    Seq((9000L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 1L)
    val before = asSet(lake(base))
    // simulate a CRASHED expiry: version=0 renamed to the dot-temp
    // but not yet deleted — readers must not see a half-expired log
    val v0 = new java.io.File(s"$base/log/version=0")
    val tmp = new java.io.File(s"$base/log", ".expired-0-crashed")
    java.nio.file.Files.move(v0.toPath, tmp.toPath): Unit
    TxLog.commitVersions(s"$base/log") shouldBe Seq(1L)
    asSet(lake(base)) shouldBe before // checkpoint covers v0's state
    // restore, then run the REAL expiry: no empty version dirs and no
    // temp dirs may survive it (the old files-then-dir delete left an
    // emptied version=0 visible to a concurrent lister)
    java.nio.file.Files.move(tmp.toPath, v0.toPath): Unit
    LakeMaintenance.expireLog(base, keepVersions = 1)
      .deletedVersions shouldBe 1
    val names = Option(new java.io.File(s"$base/log").listFiles())
      .toSeq.flatten.map(_.getName)
    names.count(_.startsWith("version=")) shouldBe 1
    names.count(_.startsWith(".expired")) shouldBe 0
    asSet(lake(base)) shouldBe before
  }
}
