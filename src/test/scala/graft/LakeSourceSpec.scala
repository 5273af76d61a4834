package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.operators.{ParquetFile, ParquetWrite, TxLog}

/** [[graft.sources.LakeSource]] (q222) — the connector-law matrix over
  * the own-write/own-read lakehouse loop: snapshot resolution through
  * checkpoint + pointer, time travel, column pruning reaching the
  * reader, FILE pruning from log stats, ROW-GROUP pruning from our
  * footer stats, runtime (dynamic) file pruning, residual semantics,
  * and null/dictionary round-trips. */
class LakeSourceSpec extends SparkSpec {
  import spark.implicits._

  private val FileRows = 256
  private val RgRows = 64

  /** Row i of file f: doc_id = f*256+i, v = null when id%7==0 else
    * id*3, s = "s"+(id%3) (3 distinct values → dictionary). */
  private def expected(file: Int): Seq[(Long, Option[Long], String)] =
    (0 until FileRows).map { i =>
      val id = file.toLong * FileRows + i
      (id, if (id % 7 == 0) None else Some(id * 3), "s" + (id % 3))
    }

  private def fileBytes(file: Int): Array[Byte] = {
    val rows = expected(file)
    ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("doc_id", rows.map(_._1).toArray),
      ParquetWrite.OptLongCol("v", rows.map(r =>
        r._2.map(java.lang.Long.valueOf).orNull).toArray),
      ParquetWrite.StrCol("s", rows.map(_._3).toArray)),
      rowsPerGroup = RgRows)
  }

  private def addLine(base: String, f: Int,
      withStats: Boolean = true): String = {
    val p = s"$base/data/part-$f.parquet"
    val stats =
      if (withStats) {
        val bytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p))
        val st = ParquetFile.parse(f.toLong, bytes)
          .filter(r => r.valid && r.col_path == "doc_id" && r.has_stats)
        s""","min_key":${st.map(_.min_long).min}""" +
          s""","max_key":${st.map(_.max_long).max}"""
      } else ""
    s"""{"add":{"path":"$p","size":$FileRows$stats}}"""
  }

  /** Build the canonical 2-commit table: v0 adds files 0..2 (with a
    * checkpoint + pointer at v0), v1 removes part-1 and adds part-3.
    * Latest live set = {0, 2, 3}; asOf=0 = {0, 1, 2}. */
  private def buildTable(): String = {
    val base = java.nio.file.Files.createTempDirectory("graft_lake")
      .toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    (0 to 3).foreach { f =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$base/data/part-$f.parquet"),
        fileBytes(f)): Unit
    }
    def commit(v: Int, lines: Seq[String]): Unit = {
      val d = new java.io.File(s"$base/log/version=$v")
      d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$d/actions.json"),
        lines.mkString("\n").getBytes("UTF-8")): Unit
    }
    commit(0, (0 to 2).map(addLine(base, _)))
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 0L)
    commit(1, Seq(
      s"""{"remove":{"path":"$base/data/part-1.parquet"}}""",
      addLine(base, 3)))
    base
  }

  private def lake(base: String, asOf: Long = -1L): DataFrame = {
    val r = spark.read.format("graft-lake").option("path", base)
    (if (asOf >= 0) r.option("asOf", asOf) else r).load()
  }

  private def asSet(df: DataFrame): Set[(Long, Option[Long], String)] =
    df.select("doc_id", "v", "s").collect().map { r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getString(2))
    }.toSet

  private def partitions(df: DataFrame): Int = df.rdd.getNumPartitions

  test("snapshot read through checkpoint+pointer+tail: values, nulls " +
      "and dictionary strings all round-trip; removed file is gone") {
    val base = buildTable()
    val df = lake(base)
    df.schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s")
    df.schema("v").nullable shouldBe true
    asSet(df) shouldBe
      (expected(0) ++ expected(2) ++ expected(3)).toSet
  }

  test("time travel (asOf=0) resolves the pre-remove snapshot") {
    val base = buildTable()
    asSet(lake(base, asOf = 0L)) shouldBe
      (expected(0) ++ expected(1) ++ expected(2)).toSet
  }

  test("column pruning reaches the reader: a 2-column projection " +
      "scans 2 columns") {
    val base = buildTable()
    val q = lake(base).select("doc_id", "s")
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    scans shouldBe Seq(Seq("doc_id", "s"))
    q.count() shouldBe 3L * FileRows
  }

  test("FILE pruning from log stats: range and IN predicates plan " +
      "only intersecting files; residual semantics hold") {
    val base = buildTable()
    val df = lake(base) // live files 0 [0,255], 2 [512,767], 3 [768,1023]
    partitions(df) shouldBe 3
    partitions(df.filter(col("doc_id") < 200L)) shouldBe 1
    partitions(df.filter(col("doc_id") >= 600L)) shouldBe 2
    partitions(df.filter(col("doc_id").between(256L, 511L))) shouldBe 0
    partitions(df.filter(col("doc_id").isin(10L, 999L))) shouldBe 2
    // residual: the filter still applies exactly
    df.filter(col("doc_id") < 200L).count() shouldBe 200L
    df.filter(col("doc_id").between(256L, 511L)).count() shouldBe 0L
    df.filter(col("doc_id").isin(10L, 999L)).count() shouldBe 2L
  }

  test("ROW-GROUP pruning from our footer stats: a 1-group predicate " +
      "emits one group's rows from the scan, not the file's") {
    val base = buildTable()
    val q = lake(base).filter(col("doc_id") < 32L) // RG0 of file 0 only
    // collect on THIS frame: count() builds a separate execution whose
    // metrics this handle never sees
    q.collect().length shouldBe 32
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val emitted = scan.metrics("numOutputRows").value
    withClue(s"scan emitted $emitted rows: ") {
      emitted shouldBe RgRows.toLong // 1 of 4 groups in 1 of 3 files
    }
  }

  test("runtime filtering: a selective broadcast join narrows the " +
      "planned files at execution time") {
    val base = buildTable()
    val df = lake(base)
    val dim = Seq(600L, 601L).toDF("doc_id")
    val joined = df.join(broadcast(dim), "doc_id")
    joined.queryExecution.executedPlan.toString should
      include("RuntimeFilters")
    joined.count() shouldBe 2L
    // the DSv2 hook directly: an IN on the stats column keeps only
    // the file whose [min,max] window contains a key
    val scan = df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b.scan }.head
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("doc_id",
        Array(600L.asInstanceOf[AnyRef]))))
    scan.asInstanceOf[org.apache.spark.sql.connector.read.Batch]
      .planInputPartitions().length shouldBe 1
  }

  test("statless adds must scan: a file whose add carries no " +
      "min/max is never pruned") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_ns")
      .toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/part-0.parquet"),
      fileBytes(0)): Unit
    val d = new java.io.File(s"$base/log/version=0")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/actions.json"),
      addLine(base, 0, withStats = false).getBytes("UTF-8")): Unit
    val df = lake(base)
    // a predicate far outside the file's range still plans the file
    partitions(df.filter(col("doc_id") > 5000L)) shouldBe 1
    df.filter(col("doc_id") > 5000L).count() shouldBe 0L
    df.count() shouldBe FileRows.toLong
  }

  test("streaming tail: each commit's added files stream exactly " +
      "once, offsets survive restart, late commits arrive alone") {
    import org.apache.spark.sql.streaming.Trigger
    val base = buildTable() // commits 0 (files 0..2) and 1 (rm 1, add 3)
    val ckpt = tmp("lake_stream_ckpt")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-lake")
        .option("path", base).option("versionsPerTrigger", 1)
        .load()
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.select("doc_id").collect()
            .foreach(r => got += ((id, r.getLong(0))))
        }
        .start()
      q.awaitTermination()
    }
    drain()
    // append-only tail: commit 0 emitted files 0..2, commit 1 ADDED
    // file 3 (the remove does not retract) — versionsPerTrigger=1
    // forces one batch per commit
    got.map(_._1).distinct.size shouldBe 2
    got.map(_._2).toSet shouldBe
      (0 until 4 * FileRows).map(_.toLong).toSet
    got.size shouldBe 4 * FileRows
    // a NEW commit lands while the stream is down; restart emits ONLY
    // its adds (the checkpoint remembers version 1 was processed)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/part-4.parquet"),
      fileBytes(4)): Unit
    val d = new java.io.File(s"$base/log/version=2")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/actions.json"),
      addLine(base, 4).getBytes("UTF-8")): Unit
    got.clear()
    drain()
    got.map(_._2).toSet shouldBe
      expected(4).map(_._1).toSet
  }

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("write path: an append through the connector lands as a new " +
      "commit with stats — batch read, file pruning and the streaming " +
      "tail all see it") {
    val base = buildTable() // commits 0/1, live files {0, 2, 3}
    val rows = (5000L until 5300L).map(id =>
      (id, if (id % 7 == 0) None else Some(id * 3), "s" + (id % 3)))
    spark.createDataFrame(rows.map(r =>
        (r._1, r._2.map(java.lang.Long.valueOf).orNull, r._3)))
      .toDF("doc_id", "v", "s")
      .coalesce(2) // two writers -> two files in ONE commit
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    // the append is commit 2 with two add actions carrying stats
    TxLog.commitVersions(s"$base/log").max shouldBe 2L
    val added = TxLog.addsInVersions(s"$base/log", Seq(2L))
    added.size shouldBe 2
    added.foreach { f =>
      f.minKey.get should be >= 5000L
      f.maxKey.get should be <= 5299L
    }
    // batch read sees old + new
    val df = lake(base)
    df.count() shouldBe (3 * FileRows + 300).toLong
    asSet(df.filter(col("doc_id") >= 5000L)) shouldBe rows.toSet
    // file pruning works on the APPENDED stats too: a window inside
    // the appended range plans only the appended files
    partitions(df.filter(col("doc_id") >= 5000L)) should be <= 2
    partitions(df.filter(col("doc_id").between(256L, 511L))) shouldBe 0
    // and the streaming tail picks the new commit up
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-lake").option("path", base)
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("lake_wr_ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r => got += r.getLong(0))
      }
      .start()
    q.awaitTermination()
    got.toSet.intersect((5000L until 5300L).toSet) shouldBe
      (5000L until 5300L).toSet
  }

  test("write path: schema mismatch and unsupported types reject " +
      "before any file lands") {
    val base = buildTable()
    val before = TxLog.commitVersions(s"$base/log").max
    intercept[Exception] {
      Seq((1L, 2L)).toDF("doc_id", "wrong")
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    }
    TxLog.commitVersions(s"$base/log").max shouldBe before
  }

  test("write path: checkpoint maintenance fires at the cadence and " +
      "resolution stays pointer-fast") {
    val base = buildTable() // commits 0, 1 exist; ckpt at 0
    // drive commits 2..9 through the connector: commit 9 is the 10th
    // version -> the writer compacts a checkpoint at 9
    (2 to 9).foreach { i =>
      Seq((9000L + i, java.lang.Long.valueOf(i.toLong), s"s$i"))
        .toDF("doc_id", "v", "s")
        .coalesce(1)
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    }
    TxLog.readPointer(s"$base/ckpt") shouldBe Some(9L)
    val r = TxLog.resolve(spark, s"$base/log", s"$base/ckpt", -1L)
    r.ckptVersion shouldBe Some(9L)
    r.tailVersions shouldBe Seq.empty // everything compacted
    // and the read still sees every row
    lake(base).count() shouldBe (3 * FileRows + 8).toLong
  }

  test("pure-checkpoint resolution (empty tail) keeps the stats: " +
      "file pruning works through the checkpointed state") {
    val base = buildTable()
    // advance the checkpoint past the last commit: tail is empty and
    // everything — including min/max — comes from the checkpoint
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 1L)
    val df = lake(base)
    partitions(df) shouldBe 3
    partitions(df.filter(col("doc_id") < 200L)) shouldBe 1
    asSet(df) shouldBe
      (expected(0) ++ expected(2) ++ expected(3)).toSet
  }

  // ================================================================
  // r12 partition columns + string stats: pruning from log metadata
  // ================================================================

  /** Table whose append is partitioned by `p` (values a/b/c) with
    * string stats on `s2`; the bootstrap file carries neither. */
  private def buildPartitioned(): String = {
    val base = java.nio.file.Files.createTempDirectory("graft_lkpart")
      .toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    // bootstrap: ids 0..9, no part value, no skey stats
    val bytes = ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("doc_id", (0L until 10L).toArray),
      ParquetWrite.StrCol("p", Array.fill(10)("a")),
      ParquetWrite.StrCol("s2", (0 until 10).map(i => s"k$i").toArray)))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/boot.parquet"), bytes): Unit
    TxLog.commitVersion(s"$base/log", 0L, Seq(
      s"""{"add":{"path":"$base/data/boot.parquet","size":10,""" +
        s""""min_key":0,"max_key":9}}"""))
    // append ids 10..99 partitioned by p (3 values), skey stats on s2
    (10L until 100L).map { i =>
      (i, Seq("a", "b", "c")((i % 3).toInt), f"k$i%03d")
    }.toDF("doc_id", "p", "s2")
      .coalesce(1) // ONE task -> exactly one file per part value
      .write.format("graft-lake").option("path", base)
      .option("partitionBy", "p").option("strStatsCol", "s2")
      .mode("append").save()
    base
  }

  private def lakeOpt(base: String, opts: (String, String)*): DataFrame = {
    var r = spark.read.format("graft-lake").option("path", base)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("r12 partition pruning: an equality/IN predicate on the " +
      "partition column plans only matching files (+ the partless " +
      "bootstrap, which must always scan)") {
    val base = buildPartitioned()
    val df = lakeOpt(base, "partitionBy" -> "p")
    partitions(df) shouldBe 4 // boot + one file per value a/b/c
    // eq: one partition file + the conservative bootstrap
    partitions(df.filter(col("p") === "b")) shouldBe 2
    df.filter(col("p") === "b").count() shouldBe 30L
    // IN: two partition files + bootstrap
    partitions(df.filter(col("p").isin("a", "c"))) shouldBe 3
    df.filter(col("p").isin("a", "c")).count() shouldBe 70L
    // a value no file carries: bootstrap only
    partitions(df.filter(col("p") === "zz")) shouldBe 1
    df.filter(col("p") === "zz").count() shouldBe 0L
    // results identical without the option (pruning is optimization)
    lakeOpt(base).filter(col("p") === "b").count() shouldBe 30L
  }

  test("r12 string-window pruning: range and equality predicates on " +
      "the strStatsCol prune on the log's min_skey/max_skey") {
    val base = java.nio.file.Files.createTempDirectory("graft_lkskey")
      .toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    // three files with DISJOINT skey windows, committed with measured
    // stats through the connector: cluster by range buckets
    val bytes = ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("doc_id", Array(0L)),
      ParquetWrite.StrCol("s2", Array("m999"))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/boot.parquet"), bytes): Unit
    TxLog.commitVersion(s"$base/log", 0L, Seq(
      s"""{"add":{"path":"$base/data/boot.parquet","size":1,""" +
        s""""min_key":0,"max_key":0}}"""))
    // one append per bucket, coalesce(1) -> ONE file with an exact
    // [k<b>_000, k<b>_029] window each (deterministic, unlike a
    // range-partitioner split whose sampled boundaries wander)
    (0 until 3).foreach { b =>
      (0L until 30L).map(i => (b * 30L + i + 1L, f"k${b}%d_$i%03d"))
        .toDF("doc_id", "s2")
        .coalesce(1)
        .write.format("graft-lake").option("path", base)
        .option("strStatsCol", "s2").mode("append").save()
    }
    val df = lakeOpt(base, "strStatsCol" -> "s2")
    partitions(df) shouldBe 4
    // equality inside one window: that file + statless bootstrap
    partitions(df.filter(col("s2") === "k1_015")) shouldBe 2
    df.filter(col("s2") === "k1_015").count() shouldBe 1L
    // range covering one prefix bucket
    partitions(df.filter(col("s2") >= "k1" && col("s2") < "k2"))
      .shouldBe(2)
    df.filter(col("s2") >= "k1" && col("s2") < "k2")
      .count() shouldBe 30L
    // range out of every window: bootstrap only
    partitions(df.filter(col("s2") > "zzz")) shouldBe 1
    df.filter(col("s2") > "zzz").count() shouldBe 0L
    // and the stats survive CHECKPOINTING (the q217 state carries
    // min_skey/max_skey/part through the compaction round trip)
    TxLog.writeCheckpoint(spark, s"$base/log", s"$base/ckpt", 3L)
    val viaCkpt = lakeOpt(base, "strStatsCol" -> "s2")
    partitions(viaCkpt.filter(col("s2") > "zzz")) shouldBe 1
    viaCkpt.count() shouldBe 91L
  }

  // ================================================================
  // r12 aggregate pushdown: COUNT/MIN/MAX from log metadata
  // ================================================================

  test("r12 aggregate pushdown: COUNT(*)/MIN/MAX(statsCol) answer " +
      "from ONE metadata partition with zero data files opened; " +
      "filters or missing stats force the row path") {
    val base = buildTable() // live = files 0, 2, 3 (768 rows)
    val df = lake(base)
    val q = df.agg(count(lit(1)), min(col("doc_id")), max(col("doc_id")))
    val row = q.head()
    row.getLong(0) shouldBe (3 * FileRows).toLong
    row.getLong(1) shouldBe 0L
    row.getLong(2) shouldBe (4 * FileRows - 1).toLong
    // the plan is the metadata scan: one partition, PUSHED-AGG leaf
    val plan = q.queryExecution.executedPlan
    plan.toString should include("PUSHED-AGG")
    val scans = plan.collect {
      case b: BatchScanExec => b
    }
    scans.head.inputRDD.getNumPartitions shouldBe 1
    // a FILTERED aggregate must go through rows (filters are residual
    // here, so Spark never offers the pushdown) — and still be right
    val fq = df.filter(col("doc_id") < 100L).agg(count(lit(1)))
    fq.head().getLong(0) shouldBe 100L
    fq.queryExecution.executedPlan.toString should not include "PUSHED-AGG"
    // MIN/MAX on a non-stats column is not answerable from the log
    val nq = df.agg(min(col("v")))
    nq.queryExecution.executedPlan.toString should not include "PUSHED-AGG"
    nq.head().getLong(0) shouldBe
      (0 until 4).filter(_ != 1).flatMap(expected)
        .flatMap(_._2).min
    // a statless add forces the row path for MIN/MAX but count still
    // pushes (sizes are present)
    val d = new java.io.File(s"$base/log/version=2")
    d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/actions.json"),
      s"""{"add":{"path":"$base/data/part-1.parquet","size":$FileRows}}"""
        .getBytes("UTF-8")): Unit
    val df2 = lake(base)
    val cq = df2.agg(count(lit(1)))
    cq.queryExecution.executedPlan.toString should include("PUSHED-AGG")
    cq.head().getLong(0) shouldBe (4 * FileRows).toLong
    val mq = df2.agg(min(col("doc_id")))
    mq.queryExecution.executedPlan.toString should not include "PUSHED-AGG"
    mq.head().getLong(0) shouldBe 0L
  }

  // ================================================================
  // r12 schema evolution: ADD COLUMN via the metaData action
  // ================================================================

  test("r12 ADD COLUMN: the log's metaData action wins the schema, " +
      "pre-evolution files null-fill, appends carry the column, time " +
      "travel resolves the OLD schema, duplicates reject") {
    val base = buildTable() // 3 files live, cols (doc_id, v, s)
    lake(base).schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s")
    val v = graft.sources.LakeSource.addColumn(base, "score", "double")
    v shouldBe 2L
    val df = lake(base)
    df.schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s", "score")
    df.schema("score").dataType shouldBe
      org.apache.spark.sql.types.DoubleType
    df.schema("score").nullable shouldBe true
    // every pre-evolution row null-fills
    df.count() shouldBe (3 * FileRows).toLong
    df.where(col("score").isNotNull).count() shouldBe 0L
    // an append AFTER the evolution must carry the column — and lands
    Seq((9000L, java.lang.Long.valueOf(1L), "s0",
        java.lang.Double.valueOf(2.5)))
      .toDF("doc_id", "v", "s", "score").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    val got = lake(base).where(col("doc_id") === 9000L).head()
    got.getDouble(3) shouldBe 2.5
    lake(base).where(col("score").isNotNull).count() shouldBe 1L
    // a 3-column append resolves BY NAME against the 4-column log
    // schema: Spark null-pads the missing NULLABLE column before the
    // connector sees the rows (so the file lands with score = null —
    // the same fate as pre-evolution rows; a missing NON-nullable
    // column would fail in Spark's output resolver)
    Seq((9001L, java.lang.Long.valueOf(1L), "s0"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    val padded = lake(base).where(col("doc_id") === 9001L).head()
    padded.isNullAt(3) shouldBe true
    // time travel BEFORE the evolution sees the old 3-column schema
    lake(base, asOf = 1L).schema.fieldNames.toSeq shouldBe
      Seq("doc_id", "v", "s")
    asSet(lake(base, asOf = 1L)) shouldBe
      (expected(0) ++ expected(2) ++ expected(3)).toSet
    // duplicate column rejects before any commit
    val before = TxLog.commitVersions(s"$base/log").max
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.addColumn(base, "score", "double")
    }
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.addColumn(base, "x", "decimal(10,2)")
    }
    TxLog.commitVersions(s"$base/log").max shouldBe before
  }

  test("r13 COLUMN MAPPING: rename is pure metadata (no rewrite), " +
      "appends carry the physical name, drop + re-add never " +
      "resurrects dropped bytes, time travel sees the old names") {
    val base = buildTable() // (doc_id, v, s), files 0/2/3 live
    // RENAME v -> val: data intact, zero file rewrites
    val dataFiles = new java.io.File(s"$base/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap
    graft.sources.LakeSource.renameColumn(base, "v", "val") shouldBe 2L
    val df = lake(base)
    df.schema.fieldNames.toSeq shouldBe Seq("doc_id", "val", "s")
    df.where(col("val").isNotNull).count() shouldBe
      (0 to 3).filter(_ != 1).flatMap(expected).count(_._2.isDefined)
        .toLong
    new java.io.File(s"$base/data").listFiles()
      .map(f => f.getName -> f.lastModified()).toMap shouldBe dataFiles
    // an append binds the LOGICAL name but the file carries the
    // PHYSICAL one — Spark's own parquet reader proves what's on disk
    Seq((9000L, java.lang.Long.valueOf(42L), "s0"))
      .toDF("doc_id", "val", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).where(col("doc_id") === 9000L).head().getLong(1)
      .shouldBe(42L)
    val appended = new java.io.File(s"$base/data").listFiles()
      .map(_.getName).filter(n => !dataFiles.contains(n))
    appended.length shouldBe 1
    spark.read.parquet(s"$base/data/${appended.head}")
      .schema.fieldNames.toSeq shouldBe Seq("doc_id", "v", "s")
    // DROP s, then re-ADD a column named s: fresh physical name, so
    // the old bytes stay buried — every row reads NULL
    graft.sources.LakeSource.dropColumn(base, "s") shouldBe 4L
    lake(base).schema.fieldNames.toSeq shouldBe Seq("doc_id", "val")
    graft.sources.LakeSource.addColumn(base, "s", "string") shouldBe 5L
    val re = lake(base)
    re.schema.fieldNames.toSeq shouldBe Seq("doc_id", "val", "s")
    re.where(col("s").isNotNull).count() shouldBe 0L
    // appends carry the fresh column physically under its mapped name
    Seq((9001L, java.lang.Long.valueOf(1L), "alive"))
      .toDF("doc_id", "val", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).where(col("s") === "alive").count() shouldBe 1L
    lake(base).where(col("s").isNotNull).count() shouldBe 1L
    // pruning on a RENAMED stats column still plans from log windows
    lake(base).filter(col("doc_id") < 256L).rdd
      .getNumPartitions shouldBe 1
    // time travel BEFORE the rename resolves the old logical names
    lake(base, asOf = 1L).schema.fieldNames.toSeq shouldBe
      Seq("doc_id", "v", "s")
    // guards: unknown/duplicate/last-column reject without a commit
    val beforeV = TxLog.commitVersions(s"$base/log").max
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.renameColumn(base, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.renameColumn(base, "val", "s")
    }
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.dropColumn(base, "nope")
    }
    TxLog.commitVersions(s"$base/log").max shouldBe beforeV
  }

  test("r13 GROUP BY partition-column aggregate pushdown: " +
      "per-partition COUNT/MIN/MAX from partitionValues metadata in " +
      "ONE partition; a part-less file forces the row path") {
    val base = buildPartitioned() // boot (no part) + 3 part files
    // the bootstrap file has no part value -> pushdown DECLINES and
    // the row path still answers correctly
    val all = lakeOpt(base, "partitionBy" -> "p")
    val declined = all.groupBy(col("p"))
      .agg(count(lit(1)).as("n"))
    declined.queryExecution.executedPlan.toString should
      not include "PUSHED-AGG"
    declined.collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap shouldBe Map("a" -> 40L, "b" -> 30L, "c" -> 30L)
    // a fully-partitioned snapshot: drop the bootstrap via a remove
    val vmax = TxLog.commitVersions(s"$base/log").max
    TxLog.commitVersion(s"$base/log", vmax + 1, Seq(
      s"""{"remove":{"path":"$base/data/boot.parquet"}}"""))
    val df = lakeOpt(base, "partitionBy" -> "p")
    val q = df.groupBy(col("p")).agg(count(lit(1)).as("n"),
      min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    val plan = q.queryExecution.executedPlan
    plan.toString should include("PUSHED-AGG")
    plan.toString should include("GROUP-BY=[p]")
    val scans = plan.collect { case b: BatchScanExec => b }
    scans.head.inputRDD.getNumPartitions shouldBe 1
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = (10L until 100L)
      .groupBy(i => Seq("a", "b", "c")((i % 3).toInt))
      .map { case (p, is) =>
        (p, is.size.toLong, is.min, is.max)
      }.toSet
    got shouldBe want
    // grouping by a NON-partition column declines
    val ng = df.groupBy(col("s2")).agg(count(lit(1)))
    ng.queryExecution.executedPlan.toString should
      not include "PUSHED-AGG"
    ng.count() shouldBe 90L
  }

  // ================================================================
  // r12 type surface: double / float / array<float> tables
  // ================================================================

  /** Row id: score (null %7), w float, emb with all four list fates. */
  private def fpRow(id: Long): (Long, Option[Double], Float,
      Seq[Option[Float]]) = {
    val emb: Seq[Option[Float]] =
      if (id % 11 == 0) null
      else if (id % 13 == 0) Seq.empty
      else (0 until (1 + id % 4).toInt).map { j =>
        if (j == 2 && id % 5 == 0) None
        else Some((id * 4 + j).toFloat / 8f)
      }
    (id, if (id % 7 == 0) None else Some(id * 0.25 - 30.0),
      (id % 17).toFloat / 4f, emb)
  }

  test("r12 type surface: double/float/array<float> round-trips " +
      "own-write/own-read under Catalyst, Spark's parquet reader " +
      "agrees on the same data files, and all four list fates survive " +
      "the connector write path") {
    val base = java.nio.file.Files.createTempDirectory("graft_lakefp")
      .toFile.getAbsolutePath
    new java.io.File(s"$base/data").mkdirs()
    // bootstrap ids 0..99 as one own-codec file + v0 commit
    val boot = (0L until 100L).map(fpRow)
    val bytes = ParquetWrite.writeFile(Seq(
      ParquetWrite.LongCol("vec_id", boot.map(_._1).toArray),
      ParquetWrite.OptDoubleCol("score", boot.map(r =>
        r._2.map(java.lang.Double.valueOf).orNull).toArray),
      ParquetWrite.FloatCol("w", boot.map(_._3).toArray),
      ParquetWrite.FloatListCol("emb", boot.map(r =>
        if (r._4 == null) null
        else r._4.map(_.map(java.lang.Float.valueOf).orNull).toArray)
        .toArray)),
      rowsPerGroup = 32)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/data/part-0.parquet"), bytes): Unit
    TxLog.commitVersion(s"$base/log", 0L, Seq(
      s"""{"add":{"path":"$base/data/part-0.parquet","size":100,""" +
        s""""min_key":0,"max_key":99}}"""))
    // append ids 100..199 THROUGH the connector (arrays in
    // InternalRow form -> FloatListCol buffers)
    (100L until 200L).map(fpRow).toDF("vec_id", "score", "w", "emb")
      .coalesce(1)
      .write.format("graft-lake").option("path", base)
      .option("statsCol", "vec_id").mode("append").save()
    val back = spark.read.format("graft-lake").option("path", base)
      .option("statsCol", "vec_id").load()
    import org.apache.spark.sql.types._
    back.schema("score").dataType shouldBe DoubleType
    back.schema("w").dataType shouldBe FloatType
    back.schema("emb").dataType shouldBe
      ArrayType(FloatType, containsNull = true)
    def norm(df: DataFrame)
        : Set[(Long, Option[Double], Float, Seq[Option[Float]])] =
      df.select("vec_id", "score", "w", "emb").collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getFloat(2),
          if (r.isNullAt(3)) null
          else r.getSeq[Any](3).map(v =>
            if (v == null) None else Some(v.asInstanceOf[Float])))
      }.toSet
    val want = (0L until 200L).map(fpRow).toSet
    norm(back) shouldBe want
    // the STRONGEST differential: Spark's own parquet reader consumes
    // the SAME data files (bootstrapped + connector-appended) directly
    norm(spark.read.parquet(s"$base/data")) shouldBe want
    // file pruning still plans from the appended file's key stats
    partitions(back.filter(col("vec_id") >= 100L)) shouldBe 1
  }

  test("r13 an EMPTY append commits no version AND runs no checkpoint " +
      "maintenance — the next real commit's rows stay visible") {
    val base = buildTable() // commits 0, 1; ckpt at 0
    // cadence 1: every commit would checkpoint. An empty append lands
    // on the boundary — before the fix it wrote ckpt/version=2 + the
    // pointer for a version that never committed, making the NEXT real
    // append (which then commits as version 2) permanently invisible.
    lake(base).where(col("doc_id") < -1).limit(0)
      .write.format("graft-lake").option("path", base)
      .option("checkpointEvery", 1).mode("append").save()
    TxLog.commitVersions(s"$base/log").max shouldBe 1L
    TxLog.readPointer(s"$base/ckpt") shouldBe Some(0L)
    Seq((77777L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).where(col("doc_id") === 77777L).count() shouldBe 1L
  }

  test("r13 concurrent appends: two racing committers BOTH land " +
      "(optimistic retry on version collision) — never a lost add") {
    val base = buildTable()
    val before = lake(base).count()
    val rowsA = (60000L until 60200L)
      .map(id => (id, java.lang.Long.valueOf(id * 3), "a"))
    val rowsB = (61000L until 61200L)
      .map(id => (id, java.lang.Long.valueOf(id * 3), "b"))
    def append(rows: Seq[(Long, java.lang.Long, String)]): Unit =
      rows.toDF("doc_id", "v", "s").coalesce(1)
        .write.format("graft-lake").option("path", base)
        .mode("append").save()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(append(rowsA))
    val f2 = Future(append(rowsB))
    Await.result(f1, 120.seconds)
    Await.result(f2, 120.seconds)
    // both commits landed as distinct versions; content is the union
    TxLog.commitVersions(s"$base/log").max shouldBe 3L
    lake(base).count() shouldBe before + 400L
    lake(base).where(col("doc_id") >= 60000L).count() shouldBe 400L
  }

  test("r13 addColumn rejects the read-only legacy type 'int' — a " +
      "succeeded evolution must never brick the write path") {
    val base = buildTable()
    intercept[IllegalArgumentException] {
      graft.sources.LakeSource.addColumn(base, "flags", "int")
    }
    // no metaData action landed; appends still work
    TxLog.latestMetaData(s"$base/log", -1L) shouldBe None
    Seq((88888L, java.lang.Long.valueOf(1L), "zz"))
      .toDF("doc_id", "v", "s").coalesce(1)
      .write.format("graft-lake").option("path", base)
      .mode("append").save()
    lake(base).where(col("doc_id") === 88888L).count() shouldBe 1L
  }

  test("r13 startingVersion: a fresh stream skips history before it; " +
      "composes with the changeFeed mode") {
    val base = buildTable() // v0 adds files 0..2, v1 removes 1 adds 3
    def drainFrom(v: Long, cf: Boolean): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      var r = spark.readStream.format("graft-lake")
        .option("path", base).option("startingVersion", v)
      if (cf) r = r.option("changeFeed", "true")
      val q = r.load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp("lake_sv_ckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("doc_id").collect().foreach(r2 => got += r2.getLong(0))
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    // from v1: only part-3's rows (v0's three files skipped)
    val from1 = drainFrom(1L, cf = false)
    from1.size shouldBe FileRows
    from1.toSet shouldBe expected(3).map(_._1).toSet
    // default (0) still drains everything
    drainFrom(0L, cf = false).size shouldBe 4 * FileRows
    // changeFeed + startingVersion: v1's add arrives as inserts
    drainFrom(1L, cf = true).toSet shouldBe
      expected(3).map(_._1).toSet
    // r14 startingTimestamp (the Delta pair): resolves through commit
    // mtimes to the first commit AFTER the timestamp — "changes since
    // yesterday 09:00" without knowing version numbers
    new java.io.File(s"$base/log/version=0").setLastModified(1000000L)
    new java.io.File(s"$base/log/version=1").setLastModified(2000000L)
    def drainTs(ts: Long): Seq[Long] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = spark.readStream.format("graft-lake")
        .option("path", base).option("startingTimestamp", ts)
        .load()
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp("lake_st_ckpt"))
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("doc_id").collect().foreach(r2 => got += r2.getLong(0))
        }
        .start()
      q.awaitTermination()
      got.toSeq
    }
    // between v0 and v1: only v1's add
    drainTs(1500000L).toSet shouldBe expected(3).map(_._1).toSet
    // ADVICE r14 boundary: a commit at EXACTLY the timestamp is
    // included ("changes at or after ts" — the Delta contract)
    drainTs(2000000L).toSet shouldBe expected(3).map(_._1).toSet
    // before all history: everything; after the head: nothing yet
    drainTs(500000L).size shouldBe 4 * FileRows
    drainTs(3000000L).size shouldBe 0
    // an explicit startingVersion wins over a timestamp
    val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format("graft-lake")
      .option("path", base).option("startingTimestamp", "3000000")
      .option("startingVersion", 0)
      .load()
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", tmp("lake_stv_ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("doc_id").collect().foreach(r2 => got2 += r2.getLong(0))
      }
      .start()
    q2.awaitTermination()
    got2.size shouldBe 4 * FileRows
  }

  test("r13 streaming data-file names are collision-proof: two " +
      "writers with identical (partition, task, epoch) coordinates " +
      "never produce the same path") {
    val base = buildTable()
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("v", LongType, nullable = true),
      StructField("s", StringType, nullable = false)))
    val fac = new graft.sources.LakeStreamingWriterFactory(
      base, schema, "doc_id",
      Map("doc_id" -> false, "v" -> true, "s" -> false), None, None)
    def onePath(): String = {
      val w = fac.createWriter(0, 0L, 0L) // identical coordinates
      val row = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](1L, 2L,
          org.apache.spark.unsafe.types.UTF8String.fromString("x")))
      w.write(row)
      w.commit() match {
        case m: graft.sources.LakeCommitMessage => m.adds.head.path
      }
    }
    val p1 = onePath()
    val p2 = onePath() // a restarted app's replay regenerates 0/0/0
    p1 should not be p2
  }
}
