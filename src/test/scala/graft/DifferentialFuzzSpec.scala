package graft

import org.apache.spark.sql.functions.col

import graft.operators.{AsOf, Curation, Dedup}

/** Randomized differential tests: the distributed formulations of the
  * trickiest operators against straightforward O(n²) in-memory
  * references on many random inputs. Fixed seeds keep failures
  * reproducible. */
class DifferentialFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("joinAsOf matches the brute-force at-or-before reference on random event sets") {
    val rnd = new scala.util.Random(47)
    (1 to 5).foreach { _ =>
      val keys = Vector("a", "b", "c")
      val left = Seq.fill(60)((keys(rnd.nextInt(3)), rnd.nextInt(40).toLong,
        rnd.nextLong().abs % 100000))
      val right = Seq.fill(40)((keys(rnd.nextInt(3)), rnd.nextInt(40).toLong,
        rnd.nextLong().abs % 100000, rnd.nextDouble()))

      val l = left.toDF("k", "ts", "lid")
      val r = right.toDF("k", "ts", "rid", "rv")
        .select($"k", $"ts", $"rid", $"rv")
      val got = AsOf.joinAsOf(l, r, "k", "ts", "rid", Seq("rid", "rv"))
        .as[(String, Long, Long, Option[Long], Option[Double])]
        .collect().toSeq.sorted

      // reference: per left row, right rows at-or-before; latest ts wins,
      // max rid breaks same-ts ties, and rv comes from THAT row
      val want = left.map { case (k, ts, lid) =>
        val cands = right.filter(r => r._1 == k && r._2 <= ts)
        if (cands.isEmpty) (k, ts, lid, None, None)
        else {
          val best = cands.maxBy(r => (r._2, r._3))
          (k, ts, lid, Some(best._3), Some(best._4))
        }
      }.sorted
      got shouldBe want
    }
  }

  test("joinAsOf forward/nearest/strict/tolerance match brute force on random event sets") {
    val rnd = new scala.util.Random(61)
    (1 to 4).foreach { _ =>
      val keys = Vector("a", "b", "c")
      val left = Seq.fill(50)((keys(rnd.nextInt(3)), rnd.nextInt(40).toLong,
        rnd.nextLong().abs % 100000))
      val right = Seq.fill(35)((keys(rnd.nextInt(3)), rnd.nextInt(40).toLong,
        rnd.nextLong().abs % 100000, rnd.nextDouble()))
      val l = left.toDF("k", "ts", "lid")
      val r = right.toDF("k", "ts", "rid", "rv")

      // brute-force reference shared by all arms: dedup per (k, ts) by
      // max rid first (the operator contract), then pick per direction
      val dedup = right.groupBy(t => (t._1, t._2)).map { case (_, g) =>
        g.maxBy(_._3)
      }.toSeq
      def ref(direction: String, allowExact: Boolean, tol: Option[Long]) =
        left.map { case (k, ts, lid) =>
          val cands = dedup.filter(_._1 == k).filter { c =>
            val ok = direction match {
              case "backward" => if (allowExact) c._2 <= ts else c._2 < ts
              case "forward"  => if (allowExact) c._2 >= ts else c._2 > ts
              case "nearest"  => allowExact || c._2 != ts
            }
            ok && tol.forall(t => math.abs(c._2 - ts) <= t)
          }
          if (cands.isEmpty) (k, ts, lid, None, None)
          else {
            val best = direction match {
              case "backward" => cands.maxBy(_._2)
              case "forward"  => cands.minBy(_._2)
              case "nearest"  => cands.minBy(c =>
                (math.abs(c._2 - ts), if (c._2 <= ts) 0 else 1))
            }
            (k, ts, lid, Some(best._3), Some(best._4))
          }
        }.sorted
      def got(direction: String, allowExact: Boolean, tol: Option[Long]) =
        AsOf.joinAsOf(l, r, "k", "ts", "rid", Seq("rid", "rv"),
            direction = direction, allowExactMatches = allowExact,
            toleranceMicros = tol)
          .as[(String, Long, Long, Option[Long], Option[Double])]
          .collect().toSeq.sorted
      for {
        dir <- Seq("backward", "forward", "nearest")
        ae <- Seq(true, false)
        tol <- Seq(None, Some(5L))
      } withClue(s"direction=$dir allowExact=$ae tol=$tol: ") {
        got(dir, ae, tol) shouldBe ref(dir, ae, tol)
      }
    }
  }

  test("shingleContainment matches brute-force capped set intersection") {
    val rnd = new scala.util.Random(71)
    (1 to 3).foreach { _ =>
      val docs = (0L until 20L).map { id =>
        val n = 4 + rnd.nextInt(20)
        (id, "s", (0 until n).map(_ => s"t${rnd.nextInt(30)}").mkString(" "))
      }
      val df = docs.toDF("doc_id", "source", "text")
      val maxDf = 6
      val got = Dedup.shingleContainment(df, col("doc_id"), col("source"),
          col("text"), 2, maxDf, minContainment = 0.3)
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq.sorted

      // brute force: shingle sets as distinct token bigrams, then the
      // df cap, then pairwise containment
      def shingles(text: String): Set[String] = {
        val t = text.split("\\s+").toSeq
        t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSet
      }
      val sets = docs.map { case (id, _, t) => id -> shingles(t) }.toMap
      val dfCount = sets.values.flatten.groupBy(identity).map {
        case (s, o) => s -> o.size
      }
      val kept = sets.map { case (id, s) =>
        id -> s.filter(sh => dfCount(sh) <= maxDf)
      }
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        ni = (kept(a) & kept(b)).size if ni > 0
        na = kept(a).size; nb = kept(b).size
        c = ni.toDouble / math.min(na, nb) if c >= 0.3
      } yield {
        val (s, bgd) = if (na <= nb) (a, b) else (b, a)
        (s, bgd, ni.toLong, math.min(na, nb).toLong,
          math.max(na, nb).toLong, c)
      }).sorted
      got shouldBe want
    }
  }

  test("decodeWav round-trips wavPayload on random payloads/rates/junk") {
    import graft.operators.Multimodal
    val rnd = new scala.util.Random(83)
    val rows = (0 until 60).map { i =>
      val dlen = rnd.nextInt(40) * 2 // even, possibly 0
      (i.toLong, Array.fill(dlen)(rnd.nextInt(256).toByte),
        8000L + rnd.nextInt(40000), 1 + rnd.nextInt(4), 1L + rnd.nextInt(9))
    }
    val media = rows.toDF("media_id", "data", "rate", "ch", "junk")
      .select(col("media_id"), Multimodal.wavPayload(col("data"),
        col("rate"), col("ch"), col("junk")).as("payload"))
    val got = Multimodal.decodeWav(media.as[(Long, Array[Byte])])
      .collect().map(w => w.media_id -> w).toMap
    rows.foreach { case (id, data, rate, ch, junk) =>
      val w = got(id)
      withClue(s"media $id: ") {
        w.valid shouldBe true
        w.sample_rate shouldBe rate
        w.channels shouldBe ch
        w.bits shouldBe 16
        w.n_chunks shouldBe 3
        w.data_off shouldBe 52L + junk + junk % 2
        w.n_samples shouldBe data.length / 2
        val energy = data.grouped(2).map { p =>
          val s = ((p(1) << 8) | (p(0) & 0xff)).toLong; s * s
        }.sum
        w.energy shouldBe energy
      }
    }
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new scala.util.Random(53)
    (1 to 4).foreach { _ =>
      val n = 40
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = Dedup.connectedComponents(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap

      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (u, v) =>
        val (ru, rv) = (find(u.toInt), find(v.toInt))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // same membership partition, and the representative is the min id
      touched.foreach { node =>
        val members = touched.filter(m => find(m.toInt) == find(node.toInt))
        got(node) shouldBe members.min
      }
      got.keySet shouldBe touched.toSet
    }
  }

  test("boilerplateReport matches the in-memory reference on random corpora") {
    val rnd = new scala.util.Random(61)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    (1 to 4).foreach { _ =>
      val docs = (0 until 30).map { i =>
        val len = 1 + rnd.nextInt(8)
        (i.toLong, s"s${rnd.nextInt(2)}",
          Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Curation.boilerplateReport(docs.toDF("doc_id", "source", "text"),
          col("doc_id"), col("source"), col("text"), 2, 1, 4)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      // reference: per-source 2-gram doc frequency; boiler iff df*4 ≥ n_src
      val withGrams = docs.map { case (id, src, text) =>
        val toks = text.split("\\s+").toSeq
        (id, src, toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
      }.filter(_._3.nonEmpty)
      val bySrc = withGrams.groupBy(_._2)
      val boiler: Map[String, Set[String]] = bySrc.map { case (src, ds) =>
        val nSrc = ds.size
        val dfs = ds.flatMap(d => d._3.distinct.map(_ -> d._1))
          .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
        src -> dfs.filter { case (_, df) => df * 4 >= nSrc }.keySet.toSet
      }
      val want = withGrams.map { case (id, src, grams) =>
        id -> ((grams.size.toLong, grams.count(boiler(src)).toLong))
      }.toMap
      got shouldBe want
    }
  }

  test("sourceOverlapMatrix matches brute-force set intersections on random corpora") {
    val rnd = new scala.util.Random(71)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    (1 to 4).foreach { _ =>
      val docs = (0 until 40).map { i =>
        val len = 2 + rnd.nextInt(6)
        (i.toLong, s"s${rnd.nextInt(4)}",
          Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val cap = 3
      val got = Dedup.sourceOverlapMatrix(docs.toDF("doc_id", "source", "text"),
          col("source"), col("text"), 2, cap)
        .as[(String, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

      val sets: Map[String, Set[String]] = docs.groupBy(_._2).map { case (src, ds) =>
        src -> ds.flatMap(_._3.split("\\s+").toSeq.sliding(2)
          .filter(_.size == 2).map(_.mkString(" "))).toSet
      }
      val spread = sets.toSeq.flatMap { case (src, gs) => gs.map(_ -> src) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val keptSets = sets.view.mapValues(_.filter(g =>
        spread(g) >= 2 && spread(g) <= cap)).toMap
      val srcs = sets.keys.toSeq.sorted
      val want = (for {
        a <- srcs; b <- srcs if a < b
        shared = (keptSets(a) intersect keptSets(b)).size if shared > 0
      } yield (a, b) -> ((shared.toLong,
        shared.toDouble / math.min(sets(a).size, sets(b).size)))).toMap
      got shouldBe want
    }
  }

  test("rocAuc matches the O(n²) pairwise reference on random scored frames") {
    val rnd = new scala.util.Random(91)
    (1 to 5).foreach { _ =>
      // small score domain forces heavy ties — the hard path
      val rows = Seq.fill(80)((rnd.nextInt(12).toLong, rnd.nextInt(2)))
      val df = rows.zipWithIndex
        .map { case ((s, y), i) => (i.toLong, s, y) }.toDF("id", "s", "y")
      val got = Curation.rocAuc(df, col("s"), col("y"), col("id"))
        .head().getDouble(3)
      // reference: P(score_pos > score_neg) + 0.5 P(equal) over all
      // (pos, neg) pairs — the definition rocAuc's rank algebra encodes
      val pos = rows.filter(_._2 == 1).map(_._1)
      val neg = rows.filter(_._2 == 0).map(_._1)
      if (pos.nonEmpty && neg.nonEmpty) {
        val u = (for { p <- pos; n <- neg } yield
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
        got shouldBe (u / (pos.size.toLong * neg.size)) +- 1e-12
      }
    }
  }

  test("cdcChunks reassembly tiles every document on random corpora") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val docs = (0 until 30).map { i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(50))(s"w${rnd.nextInt(20)}")
          .mkString(" "))
      }
      val out = Curation.cdcChunks(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), 1 + rnd.nextInt(6))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .groupBy(_._1)
      docs.foreach { case (id, text) =>
        val nToks = text.split("\\s+").length.toLong
        val chunks = out(id).sortBy(_._2)
        chunks.head._3 shouldBe 0L // starts at token 0
        chunks.map(_._4).sum shouldBe nToks // sizes tile the doc
        chunks.sliding(2).foreach {
          case Array(a, b) => b._3 shouldBe a._3 + a._4
          case _ => ()
        }
      }
    }
  }

  test("cusumAlarms matches the sequential clamp recurrence on random streams") {
    import graft.operators.Drift
    import java.sql.Timestamp
    val rnd = new scala.util.Random(57)
    (1 to 4).foreach { _ =>
      // random counts over 30 buckets of 10s, some empty
      val counts = Array.fill(30)(if (rnd.nextBoolean()) rnd.nextInt(12) else 0)
      val ts = counts.zipWithIndex.flatMap { case (c, b) =>
        Seq.fill(c)(Tuple1(Timestamp.from(
          java.time.Instant.ofEpochSecond(b * 10L + rnd.nextInt(10)))))
      }
      if (ts.nonEmpty) {
        val got = Drift.cusumAlarms(ts.toSeq.toDF("ts"), col("ts"),
            10L, 3L, 100L)
          .collect().map(r => r.getLong(0) / 10 -> ((r.getLong(2), r.getLong(3))))
          .toMap
        // sequential reference: the textbook clamp recurrence
        val lo = counts.indexWhere(_ > 0)
        val hi = counts.lastIndexWhere(_ > 0)
        val slice = counts.slice(lo, hi + 1)
        val t = slice.length.toLong
        val n = slice.map(_.toLong).sum
        var s = 0L
        slice.zipWithIndex.foreach { case (c, i) =>
          s = math.max(0L, s + (c * t - n))
          val b = (lo + i).toLong
          got(b)._1 shouldBe s
          got(b)._2 shouldBe (if (s * 100L > 3L * n * t) 1L else 0L)
        }
      }
    }
  }

  test("ksStatistic matches the brute-force ECDF reference on random samples") {
    import graft.operators.Drift
    val rnd = new scala.util.Random(83)
    (1 to 4).foreach { _ =>
      val a = Seq.fill(40 + rnd.nextInt(40))(rnd.nextInt(25).toLong)
      val b = Seq.fill(40 + rnd.nextInt(40))(rnd.nextInt(25).toLong + rnd.nextInt(3))
      val got = Drift.ksStatistic(a.map(Tuple1(_)).toDF("v"),
        b.map(Tuple1(_)).toDF("v"), col("v")).head()
      val vals = (a ++ b).distinct.sorted
      val ref = vals.map { v =>
        val fa = a.count(_ <= v).toLong
        val fb = b.count(_ <= v).toLong
        (math.abs(fa * b.size - fb * a.size), v)
      }.max(Ordering.by((x: (Long, Long)) => (x._1, -x._2)))
      got.getLong(2) shouldBe ref._1 // ks_num
      got.getLong(4) shouldBe ref._2 // smallest attaining value
    }
  }

  test("groupQuantiles matches the sorted-seq reference on random groups") {
    val rnd = new scala.util.Random(13)
    (1 to 4).foreach { _ =>
      val rows = (0 until 120).map(i =>
        (s"g${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i.toLong))
      val got = Curation.groupQuantiles(rows.toDF("g", "v", "id"),
          col("g"), col("v"), col("id"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
        def pick(q: Double) =
          sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)
        got(g) shouldBe ((pick(0.5), pick(0.9), pick(0.99)))
      }
    }
  }
}
