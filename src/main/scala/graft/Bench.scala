package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line on stdout.
  *
  * Measurement rules (VERDICT r1 #4):
  *  - results are fully materialized through the `noop` sink — `count()`
  *    lets Catalyst prune computed columns, under-measuring scan-shaped
  *    queries;
  *  - a query that throws is recorded with ok=false and EXCLUDED from the
  *    total (time-to-crash is not a throughput number);
  *  - run via spark-submit, never sbt (JIT/log pollution).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to every core on the box: the driver contract is local[32],
    // and the round-2 driver run silently fell back to this default — at
    // "4" it measured a 4-core run (156 s) instead of the 42 s the same
    // build does on 32 cores.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions) // SQL surface (MERGE INTO)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up outside timing: JIT of the vectorized parquet reader,
    // whole-stage-codegen compile path, shuffle machinery, and noop sink
    // otherwise land on whichever query runs first (~5.5 s of the r1/r2
    // totals was q01 absorbing it). A small scan→agg→shuffle→sink chain
    // touches all four; results are discarded.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      // touch every table once (footer parse + OS page cache) so the
      // first query measured doesn't absorb cold-file I/O that its 68
      // successors never pay — q01 ran ~2s two rounds running purely
      // from first-position noise
      Tables.names.foreach { t =>
        try spark.read.parquet(s"$sfDir/$t.parquet")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // events' nanos ts: shape-only warm
      }
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(50000)
      // decimal aggregation + rank window + broadcast join: the codegen
      // paths q01/q14/q02 would otherwise JIT inside their timed run.
      val dim = spark.range(10).select(col("id").as("k"), (col("id") * 2).as("v"))
      li.select(col("l_returnflag"), col("l_orderkey"),
          col("l_quantity"), (col("l_orderkey") % 10).as("k"))
        .join(broadcast(dim), Seq("k"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("dq"),
          sum(col("l_quantity")).as("q"), max(col("rk")).as("m"), count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    // Optional subset (comma-separated substrings) for perf bisection:
    // SPARK_GRAFT_ONLY=q27,q33 runs just the matching queries.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.contains)) }
    // Memoized-artifact release points are derived from the SELECTED
    // set, not hardcoded names (ADVICE r10: a filtered sweep that
    // omitted the hardcoded releaser kept GBs of checkpoint blocks
    // pinned for the rest of the run — the r10 q198 16 s rebuild was
    // the same bug class from the producer side). The release fires
    // after the last selected consumer in sort order; registries list
    // every consumer of each artifact.
    val pairIndexConsumers = Seq("q00_", "q27_", "q139_")
    val suffixArrayConsumers = Seq("q171_", "q172_", "q174_", "q198_")
    def lastSelected(prefixes: Seq[String]): Option[String] =
      selected.map(_._1)
        .filter(n => prefixes.exists(n.startsWith)).lastOption
    val lastPairConsumer = lastSelected(pairIndexConsumers)
    val lastSaConsumer = lastSelected(suffixArrayConsumers)
    val results = selected.map { case (name, fn) =>
      System.err.println(s"[bench] >>> $name")
      // UNTIMED fixture preparation (r15 — VERDICT r14 #8: q234's sf5
      // record measured its own fixture build): a query that declares
      // a prepare hook gets its memoized fixture built here, so the
      // timed region below holds the operator, not the harness
      SparkEntry.prepare.get(name).foreach { p =>
        spark.sparkContext.setJobDescription(s"$name prepare")
        try p(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name prepare failed: " +
            s"${e.getMessage}")
        }
      }
      // label the timed jobs (guide 1.5) so event-log analysis can
      // attribute every job/stage to its query — thread-local, no
      // timing effect
      spark.sparkContext.setJobDescription(name)
      // Collect the previous query's garbage OUTSIDE the timed region:
      // at 32 in-process executor threads a heavy query's debris
      // otherwise lands as multi-second GC pauses inside whichever query
      // runs next (the r3 q21 7.4 s mystery — a plain scan-agg timed
      // right after the rank queries' quantile passes).
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      val t = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      // Release memoized checkpoint blocks OUTSIDE the timed region,
      // after the last SELECTED consumer (derived above), so the
      // remaining queries don't run with GBs of dead storage pinned
      // (at sf20 the pinned pair-index frame + debris showed up as
      // q01's in-sweep 20× — SCALE.md r9).
      if (lastPairConsumer.contains(name))
        graft.operators.Dedup.releasePostingIndexes(spark)
      if (lastSaConsumer.contains(name))
        graft.operators.SuffixArray.releaseSuffixArrays(spark)
      (name, t, ok)
    }
    // SELF-ADJUDICATING sweep (VERDICT r13 #4; made SYMMETRIC per
    // ADVICE r14 — re-measuring only >2x movers and keeping min()
    // systematically biased totals low vs the single-pass protocol
    // the baselines came from): any query measuring OUTSIDE
    // [0.5x, 2x] of its scored baseline — in either direction — is
    // RE-MEASURED at the END of the sweep, where the JVM is quiet
    // (no cold JIT, no neighboring query's GC debris), and the
    // RE-MEASURED value is what lands in the scored record, slow or
    // fast, with the raw first-pass number recorded beside it. The
    // substitution rule is direction-independent, so it cannot bias
    // the total. Memoized artifacts released after the sweep are
    // REBUILT UNTIMED by re-running the producer query first, so a
    // consumer's re-measure sees the same memoization its in-sweep
    // run did. Baseline ratios only apply when the sweep runs at the
    // baseline's SF.
    val baselinePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE",
      "/root/repo/bench/baseline_per_query.json")
    val baseline: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(baselinePath)), "UTF-8")
        val sfOk = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .map(_.group(1)).forall(sfDir.contains)
        if (!sfOk) Map.empty
        else "\"(q[^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    def runUntimed(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    val producerOf: Seq[(Seq[String], String)] = Seq(
      (pairIndexConsumers, "q00_"), (suffixArrayConsumers, "q171_"))
    val rebuilt = scala.collection.mutable.Set.empty[String]
    val adjudicated: Seq[(String, Double, Double)] = results
      .filter { case (n, t, ok) =>
        ok && baseline.get(n).exists(b => t > 2.0 * b || t < 0.5 * b)
      }
      .map { case (name, first, _) =>
        System.err.println(s"[bench] re-measuring mover $name " +
          f"(first pass $first%.2f s vs baseline ${baseline(name)}%.2f s)")
        // rebuild the memoized artifact OUTSIDE the timed region when
        // the mover consumes one and is not the producer itself
        producerOf.foreach { case (consumers, producer) =>
          if (consumers.exists(name.startsWith) &&
              !name.startsWith(producer) && !rebuilt(producer)) {
            selected.map(_._1).find(_.startsWith(producer))
              .foreach(runUntimed)
            rebuilt.add(producer): Unit
          }
        }
        System.gc()
        val t0 = System.nanoTime()
        val ok =
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save(); true
          } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        (name, first, if (ok) t else first)
      }
    val adjBest = adjudicated.map(a => a._1 -> a._3).toMap
    val scored = results.map { case (n, t, ok) =>
      (n, adjBest.getOrElse(n, t), ok)
    }
    val adjJson = adjudicated.map { case (n, first, scored2) =>
      s"""{"q":"$n","first":$first,"scored":$scored2,"dir":""" +
        s""""${if (first > scored2) "slow_first" else "fast_first"}"}"""
    }.mkString("[", ",", "]")
    val qs = scored.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val failed = scored.collect { case (k, _, false) => s""""$k"""" }.mkString("[", ",", "]")
    val total = scored.collect { case (_, v, true) => v }.sum
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_ok":${scored.count(_._3)},"adjudicated":$adjJson,"sf":"$sfDir"}"""
    // The r6/r7 driver records captured only a bounded stdout TAIL, and
    // the one full JSON line (146 queries ≈ 5 KB) overflowed it — the
    // line's head fell outside the window, so "parsed" came back null
    // two rounds running (VERDICT r7 #5). Durable copy to a file, full
    // line for humans, then a compact line (fits any tail window, with
    // the file pointer) as the LAST stdout this process emits.
    val out = new java.io.File("bench/latest.json")
    out.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(full) finally w.close()
    println(full)
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_ok":${scored.count(_._3)},"n_failed":${scored.count(!_._3)},"failed":$failed,"n_adjudicated":${adjudicated.size},"sf":"$sfDir","queries_file":"${out.getAbsolutePath}"}""")
    System.out.flush()
  }
}
