package graft.operators

import org.apache.spark.sql.SparkSession

/** Lakehouse table MAINTENANCE (r11, q228): OPTIMIZE/compaction — the
  * operation every production table needs once streaming appends have
  * littered it with small files. Bin-packs live files below the target
  * into rewritten files of ~`targetRows`, clustering bins by the stats
  * column's key range (so the rewritten files keep TIGHT min/max
  * windows and file pruning stays as selective as before), and commits
  * `remove(old…) + add(new, stats)` in ONE new log version.
  *
  * Old files are NOT deleted — that is VACUUM's job after a retention
  * window; keeping them is what makes `asOf` time travel to
  * pre-compaction versions work (the spec pins it).
  *
  * 100 TB shape: the driver touches only log metadata and bin
  * arithmetic (O(live files)); each BIN is rewritten map-side on an
  * executor — read through our page decoder, re-encoded by our writer
  * — and only (path, rows, min, max) returns. Data never shuffles. */
object LakeMaintenance {

  /** Concatenate one column's slices across a bin's files (r12 — the
    * full own-writer type surface: long/string/double/float flat and
    * `array<T>` list columns). Same-schema files guaranteed by the
    * caller's leaf check. */
  private def concatCols(parts: Seq[ParquetWrite.Col]): ParquetWrite.Col =
    parts.head match {
      case ParquetWrite.LongCol(n, _) => ParquetWrite.LongCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.LongCol].vs).toArray)
      case ParquetWrite.OptLongCol(n, _) => ParquetWrite.OptLongCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.OptLongCol].vs).toArray)
      case ParquetWrite.StrCol(n, _) => ParquetWrite.StrCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.StrCol].vs).toArray)
      case ParquetWrite.OptStrCol(n, _) => ParquetWrite.OptStrCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.OptStrCol].vs).toArray)
      case ParquetWrite.DoubleCol(n, _) => ParquetWrite.DoubleCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.DoubleCol].vs).toArray)
      case ParquetWrite.OptDoubleCol(n, _) =>
        ParquetWrite.OptDoubleCol(n, parts
          .flatMap(_.asInstanceOf[ParquetWrite.OptDoubleCol].vs).toArray)
      case ParquetWrite.FloatCol(n, _) => ParquetWrite.FloatCol(n,
        parts.flatMap(_.asInstanceOf[ParquetWrite.FloatCol].vs).toArray)
      case ParquetWrite.OptFloatCol(n, _) =>
        ParquetWrite.OptFloatCol(n, parts
          .flatMap(_.asInstanceOf[ParquetWrite.OptFloatCol].vs).toArray)
      case ParquetWrite.LongListCol(n, _) =>
        ParquetWrite.LongListCol(n, parts
          .flatMap(_.asInstanceOf[ParquetWrite.LongListCol].rows).toArray)
      case ParquetWrite.FloatListCol(n, _) =>
        ParquetWrite.FloatListCol(n, parts
          .flatMap(_.asInstanceOf[ParquetWrite.FloatListCol].rows).toArray)
      case ParquetWrite.DoubleListCol(n, _) =>
        ParquetWrite.DoubleListCol(n, parts
          .flatMap(_.asInstanceOf[ParquetWrite.DoubleListCol].rows).toArray)
    }

  final case class CompactResult(removed: Int, created: Int,
      version: Long)

  /** Compact `root`'s live files: candidates are files with fewer than
    * `targetRows` rows; consecutive candidates (in key order) pack
    * into bins of ≥ 2 files up to ~`targetRows` rows each. Returns the
    * action counts and the committed version (-1 = nothing to do —
    * idempotent by construction: rewritten files meet the threshold
    * and never re-qualify). */
  def compact(spark: SparkSession, root: String,
      targetRows: Int): CompactResult = {
    require(targetRows > 0, "targetRows must be positive")
    val live = TxLog.resolveLiveLocal(s"$root/log", s"$root/ckpt", -1L)
    val candidates = live.filter(_.size < targetRows)
      .sortBy(_.minKey.getOrElse(Long.MaxValue))
    // greedy key-ordered bin packing
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[Vector[TxLog.LiveFile]]
    var cur = Vector.empty[TxLog.LiveFile]
    var curRows = 0L
    candidates.foreach { f =>
      if (curRows >= targetRows) {
        bins += cur; cur = Vector.empty; curRows = 0L
      }
      cur :+= f; curRows += f.size
    }
    if (cur.nonEmpty) bins += cur
    val work = bins.filter(_.size >= 2).toVector
    if (work.isEmpty) return CompactResult(0, 0, -1L)

    val versions = TxLog.commitVersions(s"$root/log")
    val next = if (versions.isEmpty) 0L else versions.max + 1
    // rewrite each bin on an executor: our reader → our writer
    val results = spark.sparkContext
      .parallelize(work.zipWithIndex, math.min(work.size, 64))
      .map { case (bin, idx) =>
        val perFile = bin.map { f =>
          ParquetFile.readFileColumns(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f.path)))
        }
        val leaves = perFile.head._1
        require(perFile.forall(_._1 == leaves),
          s"bin $idx mixes schemas")
        val cols: Seq[ParquetWrite.Col] = leaves.indices.map { li =>
          concatCols(perFile.map(_._2(li)))
        }
        val bytes = ParquetWrite.writeFile(cols, rowsPerGroup = 1024)
        val p = s"$root/data/compact-$next-$idx.parquet"
        java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes): Unit
        // stats for the new add come from the REWRITTEN file's own
        // footer — the log never trusts the bin arithmetic
        val st = ParquetFile.parse(idx.toLong, bytes)
          .filter(r => r.valid && r.has_stats &&
            r.col_path == leaves.head.path)
        val rows = cols.head.n.toLong
        if (st.isEmpty) (p, rows, None: Option[Long], None: Option[Long])
        else (p, rows, Some(st.map(_.min_long).min),
          Some(st.map(_.max_long).max))
      }
      .collect() // bounded: one row per BIN (metadata)

    val removes = work.flatten.map(f =>
      s"""{"remove":{"path":"${TxLog.requireJsonSafe(f.path)}"}}""")
    val adds = results.map { case (p, rows, mn, mx) =>
      val stats = (mn, mx) match {
        case (Some(a), Some(b)) => s""","min_key":$a,"max_key":$b"""
        case _ => ""
      }
      // dataChange=false (r12, the Delta flag): compaction REWRITES
      // existing rows — a change-feed consumer must not re-emit them
      s"""{"add":{"path":"${TxLog.requireJsonSafe(p)}","size":$rows""" +
        s"""$stats,"dataChange":false}}"""
    }
    TxLog.commitVersion(s"$root/log", next, (removes ++ adds).toSeq)
    CompactResult(work.map(_.size).sum, results.length, next)
  }

  final case class ZorderResult(removed: Int, created: Int,
      version: Long)

  /** Z-ORDER clustering rewrite (r12 — Delta/Iceberg's multi-column
    * OPTIMIZE): rewrites the LIVE set clustered by the bit-interleaved
    * 16-bit buckets of TWO long columns, so range predicates on
    * EITHER column touch a bounded fraction of files/row groups —
    * key-sorted layout makes the second column's per-file windows
    * span the whole domain; Z-layout makes both windows ~√coverage.
    *
    * What the pruning stack then uses: the add's `min_key`/`max_key`
    * (file pruning on `statsCol`) and OUR footer's per-row-group
    * stats on BOTH columns (reader-side row-group pruning — the
    * 1024-row groups inherit the Z locality).
    *
    * The rewrite is ONE Spark job: read through the connector, bucket
    * each column by its own min/max window (one metadata-sized agg),
    * interleave bits (pure Column ops — codegen'd), range-partition
    * by Z into `ceil(rows/targetRows)` output files written map-side
    * by our codec, and commit remove(all live) + add(new, measured
    * stats, dataChange=false — a rewrite, the change feed skips it)
    * in ONE version. Old files stay for time travel; VACUUM reclaims.
    *
    * 100 TB shape: one full-table shuffle (range by Z) — the price
    * every clustering rewrite pays, amortized over all future scans;
    * the commit is one metadata file. */
  def zorder(spark: SparkSession, root: String, colA: String,
      colB: String, targetRows: Int,
      rowsPerGroup: Int = 1024): ZorderResult = {
    require(targetRows > 0, "targetRows must be positive")
    require(colA != colB, "zorder needs two distinct columns")
    val live = TxLog.resolveLiveLocal(s"$root/log", s"$root/ckpt", -1L)
    if (live.isEmpty) return ZorderResult(0, 0, -1L)
    val df = spark.read.format("graft-lake").option("path", root).load()
    val schema = df.schema
    require(Seq(colA, colB).forall(c => schema.fieldNames.contains(c) &&
        schema(c).dataType == org.apache.spark.sql.types.LongType),
      s"zorder columns $colA/$colB must be long columns of the table")
    import org.apache.spark.sql.functions._
    val b = df.agg(min(col(colA)), max(col(colA)),
      min(col(colB)), max(col(colB))).head()
    val (aLo, aHi) = (b.getLong(0), b.getLong(1))
    val (bLo, bHi) = (b.getLong(2), b.getLong(3))
    // 16-bit bucket of v inside [lo, hi] — pure long arithmetic
    def bucket(c: org.apache.spark.sql.Column, lo: Long,
        hi: Long): org.apache.spark.sql.Column =
      if (hi <= lo) lit(0L)
      else ((c - lit(lo)) * lit(65535L) / lit(hi - lo)).cast("long")
    // interleave: bit i of A -> bit 2i+1, bit i of B -> bit 2i
    def interleave(a: org.apache.spark.sql.Column,
        bc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until 16).map { i =>
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
          .bitwiseOR(
            shiftleft(shiftright(bc, i).bitwiseAND(lit(1L)), 2 * i))
      }.reduce(_ bitwiseOR _)
    val total = live.map(_.size).sum
    val nOut = math.max(1, ((total + targetRows - 1) / targetRows).toInt)
    val z = interleave(bucket(col(colA), aLo, aHi),
      bucket(col(colB), bLo, bHi))
    val keyed = df.withColumn("_z", z)
      .repartitionByRange(nOut, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
    val versions = TxLog.commitVersions(s"$root/log")
    val next = if (versions.isEmpty) 0L else versions.max + 1
    val statsCol = colA // file-level window column (the scan option)
    val outSchema = keyed.schema
    val written: Array[(String, Long, Long, Long)] = keyed.rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val rs = rows.toArray
        if (rs.isEmpty) Iterator.empty
        else {
          val cols = rowsToCols(outSchema, rs)
          val bytes = ParquetWrite.writeFile(cols,
            rowsPerGroup = rowsPerGroup)
          val p = s"$root/data/zorder-$next-$pid.parquet"
          java.nio.file.Files.write(
            java.nio.file.Paths.get(p), bytes): Unit
          val st = ParquetFile.parse(pid.toLong, bytes)
            .filter(r => r.valid && r.has_stats && r.col_path == statsCol)
          Iterator.single((p, rs.length.toLong,
            st.map(_.min_long).min, st.map(_.max_long).max))
        }
      }
      .collect() // bounded: one metadata row per OUTPUT file
    val lines =
      live.map(f =>
        s"""{"remove":{"path":"${TxLog.requireJsonSafe(f.path)}"}}""") ++
      written.map { case (p, rows, mn, mx) =>
        s"""{"add":{"path":"${TxLog.requireJsonSafe(p)}","size":$rows""" +
          s""","min_key":$mn,"max_key":$mx,"dataChange":false}}"""
      }
    TxLog.commitVersion(s"$root/log", next, lines.toSeq)
    ZorderResult(live.size, written.length, next)
  }

  /** External-Row → writer-column conversion over the full type
    * surface (the z-order rewrite's map-side builder). */
  private def rowsToCols(schema: org.apache.spark.sql.types.StructType,
      rs: Array[org.apache.spark.sql.Row]): Seq[ParquetWrite.Col] = {
    import org.apache.spark.sql.types._
    schema.fields.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType =>
          if (f.nullable) ParquetWrite.OptLongCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else java.lang.Long.valueOf(r.getLong(i))))
          else ParquetWrite.LongCol(f.name, rs.map(_.getLong(i)))
        case StringType =>
          val vs = rs.map(r =>
            if (r.isNullAt(i)) null else r.getString(i))
          if (f.nullable) ParquetWrite.OptStrCol(f.name, vs)
          else ParquetWrite.StrCol(f.name, vs)
        case DoubleType =>
          if (f.nullable) ParquetWrite.OptDoubleCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else java.lang.Double.valueOf(r.getDouble(i))))
          else ParquetWrite.DoubleCol(f.name, rs.map(_.getDouble(i)))
        case FloatType =>
          if (f.nullable) ParquetWrite.OptFloatCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else java.lang.Float.valueOf(r.getFloat(i))))
          else ParquetWrite.FloatCol(f.name, rs.map(_.getFloat(i)))
        case ArrayType(FloatType, _) =>
          ParquetWrite.FloatListCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else r.getSeq[Any](i).map(v =>
              if (v == null) null
              else java.lang.Float.valueOf(v.asInstanceOf[Float]))
              .toArray))
        case ArrayType(DoubleType, _) =>
          ParquetWrite.DoubleListCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else r.getSeq[Any](i).map(v =>
              if (v == null) null
              else java.lang.Double.valueOf(v.asInstanceOf[Double]))
              .toArray))
        case ArrayType(LongType, _) =>
          ParquetWrite.LongListCol(f.name, rs.map(r =>
            if (r.isNullAt(i)) null
            else r.getSeq[Any](i).map(v =>
              if (v == null) null
              else java.lang.Long.valueOf(v.asInstanceOf[Long]))
              .toArray))
        case t => throw new IllegalArgumentException(s"$t")
      }
    }.toSeq
  }

  final case class MergeResult(rewritten: Int, matched: Long,
      inserted: Long, version: Long, deleted: Long = 0L)

  /** MERGE (upsert + delete, r12) by the key column: rows of `updates`
    * whose key exists in the table REPLACE the stored rows (every
    * occurrence); keys in `deletes` DROP their stored rows (every
    * occurrence — the CDC delete arm; a candidate file whose rows all
    * die commits as a remove-only tombstone, no empty file is ever
    * written); keys present nowhere INSERT as one new key-sorted
    * file; one commit carries remove(rewritten)+add(new).
    *
    * The updates ride as a BROADCAST map — the CDC-batch shape (a
    * bounded changeset against a huge table); candidate files are
    * pre-pruned by their log stats ([min,max] must intersect an
    * update key), each candidate is rewritten map-side through our
    * codecs, and only per-file metadata returns. A billion-row merge
    * would shuffle-join instead of broadcasting — out of this
    * operator's documented scope.
    *
    * `updates`: (key, values…) tuples matching the table's column
    * order; `null` in a value slot stores NULL (the column must be
    * nullable). */
  def merge(spark: SparkSession, root: String,
      updates: Seq[(Long, Array[Any])], keyCol: String,
      maxBroadcast: Int = 1 << 20,
      deletes: Seq[Long] = Seq.empty): MergeResult = {
    require(updates.size + deletes.size <= maxBroadcast,
      s"merge changeset ${updates.size + deletes.size} exceeds the " +
        s"broadcast bound $maxBroadcast — shuffle-join merges are " +
        "out of scope")
    if (updates.isEmpty && deletes.isEmpty)
      return MergeResult(0, 0L, 0L, -1L)
    require(updates.map(_._1).distinct.size == updates.size,
      "duplicate keys in the merge changeset")
    require(deletes.distinct.size == deletes.size,
      "duplicate keys in the delete set")
    require(!updates.exists(u => deletes.contains(u._1)),
      "a key cannot be both updated and deleted in one changeset")
    val live = TxLog.resolveLiveLocal(s"$root/log", s"$root/ckpt", -1L)
    val keys = updates.map(_._1) ++ deletes
    val kLo = keys.min; val kHi = keys.max
    val candidates = live.filter { f =>
      (f.minKey, f.maxKey) match {
        case (Some(mn), Some(mx)) =>
          mx >= kLo && mn <= kHi && keys.exists(k => k >= mn && k <= mx)
        case _ => true // statless files must be checked
      }
    }
    val versions = TxLog.commitVersions(s"$root/log")
    val next = if (versions.isEmpty) 0L else versions.max + 1
    val updMap = updates.toMap
    val bc = spark.sparkContext.broadcast(updMap)
    val bcDel = spark.sparkContext.broadcast(deletes.toSet)

    // (oldPath, newPath ("" = all rows died), rows, minKey, maxKey,
    // matchedKeys, deletedRows) — tuples, not a method-local case
    // class: local classes capture enclosing scope and break task
    // serialization
    val rewritten: Array[(String, String, Long, Long, Long, Seq[Long],
        Long)] =
      if (candidates.isEmpty) Array.empty
      else spark.sparkContext
        .parallelize(candidates.zipWithIndex,
          math.min(candidates.size, 64))
        .map { case (f, idx) =>
          val bytes = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f.path))
          val (leaves, cells) = ParquetFile.readFileCells(bytes)
          val ki = leaves.indexWhere(_.path == keyCol)
          require(ki >= 0 && leaves(ki).ptype == 2 &&
            leaves(ki).maxDef == 0,
            s"merge key $keyCol must be a REQUIRED long column")
          val n = cells(ki).longs.length
          // delete arm: surviving row indices (order preserved)
          val keep = (0 until n)
            .filterNot(i => bcDel.value.contains(cells(ki).longs(i)))
            .toArray
          val matched = scala.collection.mutable.ArrayBuffer.empty[Long]
          var i = 0
          while (i < n) {
            val k = cells(ki).longs(i)
            if (bc.value.contains(k)) matched += k
            i += 1
          }
          if (keep.isEmpty) // every row died: remove-only, no file
            (f.path, "", 0L, 0L, 0L, matched.distinct.toSeq,
              n.toLong)
          else {
            // build per-column output values over the SURVIVING rows,
            // applying the update changeset
            val outCols: Seq[ParquetWrite.Col] =
              leaves.zipWithIndex.map { case (lf, li) =>
                val isBin = lf.ptype == 6
                val nullable = lf.maxDef == 1
                val cc = cells(li)
                def valueAt(i: Int): Any = {
                  val k = cells(ki).longs(i)
                  bc.value.get(k) match {
                    case Some(vals) => vals(li)
                    case None =>
                      if (!cc.defined(i)) null
                      else if (isBin) new String(cc.bins(i), "UTF-8")
                      else java.lang.Long.valueOf(cc.longs(i))
                  }
                }
                if (!isBin && !nullable)
                  ParquetWrite.LongCol(lf.path, keep.map(i =>
                    valueAt(i).asInstanceOf[java.lang.Long].longValue()))
                else if (!isBin)
                  ParquetWrite.OptLongCol(lf.path, keep.map(i =>
                    valueAt(i).asInstanceOf[java.lang.Long]))
                else if (nullable)
                  ParquetWrite.OptStrCol(lf.path, keep.map(i =>
                    valueAt(i).asInstanceOf[String]))
                else
                  ParquetWrite.StrCol(lf.path, keep.map(i =>
                    valueAt(i).asInstanceOf[String]))
              }
            val out = ParquetWrite.writeFile(outCols,
              rowsPerGroup = 1024)
            val p = s"$root/data/merge-$next-$idx.parquet"
            java.nio.file.Files.write(
              java.nio.file.Paths.get(p), out): Unit
            val st = ParquetFile.parse(idx.toLong, out)
              .filter(r => r.valid && r.has_stats &&
                r.col_path == keyCol)
            (f.path, p, keep.length.toLong,
              st.map(_.min_long).min, st.map(_.max_long).max,
              matched.distinct.toSeq, (n - keep.length).toLong)
          }
        }
        .collect()

    val matchedKeys = rewritten.flatMap(_._6).toSet
    val deletedRows = rewritten.map(_._7).sum
    val inserts = updates.filterNot(u => matchedKeys.contains(u._1))
      .sortBy(_._1)
    // insert file: built from the changeset rows, key-sorted; needs
    // the table schema — take it from any live file's footer
    val insertAdd: Option[(String, Long, Long, Long)] =
      if (inserts.isEmpty) None
      else {
        val schemaBytes = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(live.head.path))
        val leaves = ParquetFile.parseFooterMeta(schemaBytes).leaves
        val cols: Seq[ParquetWrite.Col] = leaves.zipWithIndex.map {
          case (lf, li) =>
            val isBin = lf.ptype == 6
            val nullable = lf.maxDef == 1
            if (!isBin && !nullable)
              ParquetWrite.LongCol(lf.path, inserts.map(
                _._2(li).asInstanceOf[java.lang.Long].longValue())
                .toArray)
            else if (!isBin)
              ParquetWrite.OptLongCol(lf.path, inserts.map(
                _._2(li).asInstanceOf[java.lang.Long]).toArray)
            else if (nullable)
              ParquetWrite.OptStrCol(lf.path, inserts.map(
                _._2(li).asInstanceOf[String]).toArray)
            else ParquetWrite.StrCol(lf.path, inserts.map(
              _._2(li).asInstanceOf[String]).toArray)
        }
        val out = ParquetWrite.writeFile(cols, rowsPerGroup = 1024)
        val p = s"$root/data/merge-$next-insert.parquet"
        java.nio.file.Files.write(java.nio.file.Paths.get(p), out): Unit
        Some((p, inserts.size.toLong, inserts.head._1,
          inserts.last._1))
      }
    if (rewritten.isEmpty && insertAdd.isEmpty)
      return MergeResult(0, 0L, 0L, -1L)
    val lines =
      rewritten.map(r =>
        s"""{"remove":{"path":"${TxLog.requireJsonSafe(r._1)}"}}""") ++
      rewritten.filter(_._2.nonEmpty).map(r =>
        s"""{"add":{"path":"${TxLog.requireJsonSafe(r._2)}","size":${r._3}""" +
          s""","min_key":${r._4},"max_key":${r._5}}}""") ++
      insertAdd.map { case (p, rows, mn, mx) =>
        s"""{"add":{"path":"${TxLog.requireJsonSafe(p)}","size":$rows""" +
          s""","min_key":$mn,"max_key":$mx}}"""
      }
    TxLog.commitVersion(s"$root/log", next, lines.toSeq)
    MergeResult(rewritten.length, matchedKeys.size.toLong,
      insertAdd.map(_._2).getOrElse(0L), next, deletedRows)
  }

  final case class VacuumResult(deleted: Int, retainedFiles: Int)

  /** VACUUM: physically delete data files not referenced by ANY
    * snapshot within the retention window (the last
    * `retainVersions + 1` commit versions). Compaction/remove
    * tombstones make files unreferenced; vacuum is what reclaims
    * them — and it also sweeps ORPHANS (files in `data/` the log
    * never learned about: crashed writers' leftovers). After a
    * vacuum, `asOf` time travel BEHIND the horizon is gone — the
    * Delta trade, documented.
    *
    * The orphan sweep carries a MODIFICATION-TIME grace window
    * (`graceMs`, ADVICE r11): an in-flight append's data files exist
    * on disk BEFORE the driver commits the log version that
    * references them, so no `retainVersions` value can protect them —
    * they are referenced by NO version yet. Files younger than
    * `graceMs` are skipped, exactly Delta's modification-time
    * retention; tests that synthesize "old" orphans pass 0
    * explicitly, accepting that no writer is concurrently in flight.
    *
    * 100 TB shape: pure log metadata + a directory listing; the only
    * data-file I/O is the deletes themselves. */
  def vacuum(root: String, retainVersions: Int,
      graceMs: Long = 10L * 60L * 1000L): VacuumResult = {
    require(retainVersions >= 0, "retainVersions must be >= 0")
    require(graceMs >= 0, "graceMs must be >= 0")
    val versions = TxLog.commitVersions(s"$root/log")
    if (versions.isEmpty) return VacuumResult(0, 0)
    val horizon = versions.max - retainVersions
    val keep: Set[String] = versions.filter(_ >= horizon)
      .flatMap(v =>
        TxLog.resolveLiveLocal(s"$root/log", s"$root/ckpt", v)
          .map(_.path))
      .toSet
    val dataDir = new java.io.File(s"$root/data")
    val onDisk = Option(dataDir.listFiles()).toSeq.flatten
      .filter(_.isFile)
    var deleted = 0
    val cutoff = System.currentTimeMillis() - graceMs
    onDisk.foreach { f =>
      if (!keep.contains(f.getAbsolutePath) &&
          !keep.contains(f.getPath) && f.lastModified() <= cutoff) {
        if (f.delete()) deleted += 1
      }
    }
    VacuumResult(deleted, keep.size)
  }
}
