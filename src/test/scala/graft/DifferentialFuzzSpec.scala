package graft

import graft.operators.{AsOf, Dedup}

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
}
