package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic sampling: rate semantics at the edges (0 and 1000 per
  * mille), reproducibility across evaluations, and exact-n membership. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def df = (1L to 300L).map(i =>
    (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    .toDF("id", "grp")

  test("stratifiedSample: rate 1000 keeps all, rate 0 keeps none") {
    val out = Sampling.stratifiedSample(df, col("grp"), col("id"),
      Seq("a" -> 1000, "b" -> 0), 100, "t")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    out("a") shouldBe 100L
    out.get("b") shouldBe None
    assert(out("c") > 0 && out("c") < 100) // ~10% of 100
  }

  test("stratifiedSample is deterministic across evaluations") {
    def ids = Sampling.stratifiedSample(df, col("grp"), col("id"),
      Seq("a" -> 500), 500, "t2").select("id").as[Long].collect().sorted
    ids shouldBe ids
    // salted differently -> a different (but still deterministic) sample
    val other = Sampling.stratifiedSample(df, col("grp"), col("id"),
      Seq("a" -> 500), 500, "t3").select("id").as[Long].collect().sorted
    assert(!java.util.Arrays.equals(ids, other))
  }

  test("exactNPerStratum: exactly n rows per stratum, stable membership") {
    val got = Sampling.exactNPerStratum(df, col("grp"), col("id"), 5, "t")
      .as[(Long, String)].collect()
    got.groupBy(_._2).view.mapValues(_.length).toMap shouldBe
      Map("a" -> 5, "b" -> 5, "c" -> 5)
    val again = Sampling.exactNPerStratum(df, col("grp"), col("id"), 5, "t")
      .as[(Long, String)].collect()
    got.sortBy(_._1) shouldBe again.sortBy(_._1)
  }

  test("exactNPerStratum with n >= stratum size returns the stratum") {
    val tiny = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp")
    Sampling.exactNPerStratum(tiny, col("grp"), col("id"), 10, "t")
      .count() shouldBe 3
  }

  test("packChunks: offsets are consistent with a sequential per-stratum pack") {
    import graft.operators.Packing
    val weighted = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (i % 7 + 1).toInt)).toDF("id", "grp", "w")
    val out = Packing.packChunks(weighted, col("grp"), col("id"), col("w"),
        budget = 10L, salt = "p")
      .select("id", "grp", "w", "chunk_id", "chunk_off")
      .as[(Long, String, Int, Long, Long)].collect()
    out.length shouldBe 100
    // within each stratum, (chunk_id, chunk_off) must equal the running
    // pre-sum of weights in the hash order the operator defines — verify
    // against an independent sequential pack over the same order
    out.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._5)) // chunk, offset = pack order
      var cum = 0L
      ordered.foreach { case (_, _, w, cid, coff) =>
        cid shouldBe cum / 10
        coff shouldBe cum % 10
        cum += w
      }
    }
    // determinism
    val again = Packing.packChunks(weighted, col("grp"), col("id"), col("w"),
        budget = 10L, salt = "p")
      .select("id", "chunk_id", "chunk_off")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    again shouldBe out.map(r => (r._1, r._4, r._5)).sortBy(_._1)
  }

  test("temperatureResample: exact integral part, hash-decided fraction") {
    // factor 1000 = identity; 0 = drop; 2300 = 2 or 3 copies per row
    // with contiguous 1-based copy indices and a deterministic pick
    val out = Sampling.temperatureResample(df, col("grp"), col("id"),
        Seq("a" -> 1000, "b" -> 0, "c" -> 2300), 1000, "t")
      .select("id", "grp", "copy").as[(Long, String, Long)].collect()
    val byId = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    df.as[(Long, String)].collect().foreach { case (id, grp) =>
      grp match {
        case "a" => byId(id) shouldBe Seq(1L)
        case "b" => byId.get(id) shouldBe None
        case "c" => assert(byId(id) == Seq(1L, 2L) || byId(id) == Seq(1L, 2L, 3L))
      }
    }
    // the c stratum has 100 rows: expected 230 copies, fraction decided
    // by a uniform per-mille slot — bound loosely but non-vacuously
    val cCopies = out.count(_._2 == "c")
    assert(cCopies >= 210 && cCopies <= 250, s"c copies = $cCopies")
    // deterministic across evaluations
    val again = Sampling.temperatureResample(df, col("grp"), col("id"),
        Seq("a" -> 1000, "b" -> 0, "c" -> 2300), 1000, "t")
      .select("id", "grp", "copy").as[(Long, String, Long)].collect()
    again.sortBy(r => (r._1, r._3)) shouldBe out.sortBy(r => (r._1, r._3))
  }

  test("prioritySample: weight-proportional, deterministic, exact-n") {
    import graft.operators.Sampling
    // 500 light rows (w=1) vs 100 heavy rows (w=50): the heavy minority
    // must dominate a 50-row sample under priority sampling.
    val df = ((0 until 500).map(i => (i.toLong, 1L)) ++
      (500 until 600).map(i => (i.toLong, 50L))).toDF("id", "w")
    val out = Sampling.prioritySample(df, col("id"), col("w"), 50, "t1")
      .collect().map(_.getLong(0))
    out.length shouldBe 50
    out.count(_ >= 500) should be > 35 // heavies win ~proportionally
    // partitioning must not change the pick
    val again = Sampling.prioritySample(df.repartition(13), col("id"),
      col("w"), 50, "t1").collect().map(_.getLong(0))
    again.sorted shouldBe out.sorted
  }

  test("proportionalSample: exact total, largest-remainder allocation, " +
      "determinism across partitionings") {
    // strata sizes 100 (a), 100 (b), 100 (c): total 47 -> bases 15/15/15,
    // remainders all equal (47*100 % 300 = 200) -> the 2 top-ups go to
    // the lexicographically first strata: a 16, b 16, c 15
    val out = Sampling.proportionalSample(df, col("grp"), col("id"), 47L, "p")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    out("a") shouldBe 16L
    out("b") shouldBe 16L
    out("c") shouldBe 15L
    // skewed strata: 218/75/7 rows, total 60 -> bases 43/15/1 (sum 59),
    // remainders 180/0/120 -> one top-up to the largest remainder (x)
    val skew = ((1L to 218L).map((_, "x")) ++ (301L to 375L).map((_, "y"))
      ++ (401L to 407L).map((_, "z"))).toDF("id", "grp")
    val got = Sampling.proportionalSample(skew, col("grp"), col("id"), 60L, "p")
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    got shouldBe Map("x" -> 44L, "y" -> 15L, "z" -> 1L)
    // repartitioning must not change the membership
    val a = Sampling.proportionalSample(skew, col("grp"), col("id"), 60L, "p")
      .select("id").as[Long].collect().sorted
    val b = Sampling.proportionalSample(skew.repartition(13), col("grp"),
      col("id"), 60L, "p").select("id").as[Long].collect().sorted
    b shouldBe a
  }

  test("proportionalSample: allocation never deviates from the exact " +
      "share by a full row (Hamilton quota property), fuzzed") {
    val rnd = new scala.util.Random(3)
    for (trial <- 0 until 5) {
      val sizes = (0 until 6).map(i => (s"s$i", 1 + rnd.nextInt(80)))
      val rows = sizes.flatMap { case (g, n) =>
        (0 until n).map(i => (trial * 100000L + g.hashCode.toLong * 1000 + i, g))
      }
      val n = rows.size
      val total = 1 + rnd.nextInt(n)
      val got = Sampling.proportionalSample(rows.toDF("id", "grp"),
          col("grp"), col("id"), total.toLong, s"f$trial")
        .groupBy("grp").count().as[(String, Long)].collect().toMap
      got.values.sum shouldBe total.toLong
      for ((g, sz) <- sizes) {
        val exact = total.toDouble * sz / n
        val q = got.getOrElse(g, 0L).toDouble
        withClue(s"trial $trial stratum $g ($sz of $n, total $total): ") {
          q should be >= math.floor(exact) - 1e-9
          q should be <= math.ceil(exact) + 1e-9
        }
      }
    }
  }

  test("paddingWaste: hand-computed buckets, waste, and efficiency") {
    import graft.operators.Packing
    // lengths 3, 4, 5 with width 4 -> buckets 4, 4, 8
    val docs = Seq((0L, "a b c"), (1L, "a b c d"), (2L, "a b c d e"))
      .toDF("doc_id", "text")
    val out = Packing.paddingWaste(docs, col("doc_id"), col("text"), 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getDouble(5)))).toMap
    out(4L)._1 shouldBe 2L // two docs in bucket 4
    out(4L)._2 shouldBe 7L // real tokens 3+4
    out(4L)._3 shouldBe 1L // waste 8-7
    out(4L)._4 shouldBe 7.0 / 8.0 +- 1e-12
    out(8L)._1 shouldBe 1L
    out(8L)._3 shouldBe 3L // 8-5
  }

  test("contaminationReport finds the planted overlap and honors the cap") {
    import graft.operators.Dedup
    // eval doc 100 shares a 6-token run with train doc 1 (-> 4 common
    // 3-shingles); eval doc 101 is disjoint
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 unique2"),
      (2L, "totally different train content here")).toDF("doc_id", "text")
    val eval_ = Seq(
      (100L, "alpha beta gamma delta epsilon zeta other tail words"),
      (101L, "nothing shared with anyone at all")).toDF("doc_id", "text")
    val full = Dedup.contaminationReport(eval_, train, col("doc_id"),
        col("text"), shingleN = 3, maxDf = 25, minShared = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    full.length shouldBe 1
    full.head shouldBe ((100L, 1L, 4L))
  }
}
