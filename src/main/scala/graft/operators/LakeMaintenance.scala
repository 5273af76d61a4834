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
          ParquetFile.readFileCells(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(f.path)))
        }
        val leaves = perFile.head._1
        require(perFile.forall(_._1 == leaves),
          s"bin $idx mixes schemas")
        val cols: Seq[ParquetWrite.Col] = leaves.zipWithIndex.map {
          case (lf, li) =>
            val isBin = lf.ptype == 6
            val nullable = lf.maxDef == 1
            if (!isBin && !nullable)
              ParquetWrite.LongCol(lf.path,
                perFile.flatMap(_._2(li).longs).toArray)
            else if (!isBin)
              ParquetWrite.OptLongCol(lf.path, perFile.flatMap { p =>
                val cc = p._2(li)
                cc.defined.indices.map(i =>
                  if (cc.defined(i)) java.lang.Long.valueOf(cc.longs(i))
                  else null)
              }.toArray)
            else {
              val vs = perFile.flatMap { p =>
                val cc = p._2(li)
                cc.defined.indices.map(i =>
                  if (cc.defined(i)) new String(cc.bins(i), "UTF-8")
                  else null)
              }.toArray
              if (nullable) ParquetWrite.OptStrCol(lf.path, vs)
              else ParquetWrite.StrCol(lf.path, vs)
            }
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
      s"""{"remove":{"path":"${f.path}"}}""")
    val adds = results.map { case (p, rows, mn, mx) =>
      val stats = (mn, mx) match {
        case (Some(a), Some(b)) => s""","min_key":$a,"max_key":$b"""
        case _ => ""
      }
      s"""{"add":{"path":"$p","size":$rows$stats}}"""
    }
    val d = new java.io.File(s"$root/log/version=$next")
    require(d.mkdirs(), s"commit collision at $d")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$d/actions.json"),
      (removes ++ adds).mkString("\n").getBytes("UTF-8")): Unit
    CompactResult(work.map(_.size).sum, results.length, next)
  }

  final case class VacuumResult(deleted: Int, retainedFiles: Int)

  /** VACUUM: physically delete data files not referenced by ANY
    * snapshot within the retention window (the last
    * `retainVersions + 1` commit versions). Compaction/remove
    * tombstones make files unreferenced; vacuum is what reclaims
    * them — and it also sweeps ORPHANS (files in `data/` the log
    * never learned about: crashed writers' leftovers). After a
    * vacuum, `asOf` time travel BEHIND the horizon is gone — the
    * Delta trade, documented; version-based retention is this
    * format's analog of Delta's modification-time window (an
    * in-flight writer's files join the log with its commit, so a
    * nonzero retention protects them the same way).
    *
    * 100 TB shape: pure log metadata + a directory listing; the only
    * data-file I/O is the deletes themselves. */
  def vacuum(root: String, retainVersions: Int): VacuumResult = {
    require(retainVersions >= 0, "retainVersions must be >= 0")
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
    onDisk.foreach { f =>
      if (!keep.contains(f.getAbsolutePath) &&
          !keep.contains(f.getPath)) {
        if (f.delete()) deleted += 1
      }
    }
    VacuumResult(deleted, keep.size)
  }
}
