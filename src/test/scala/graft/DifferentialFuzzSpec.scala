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
}
