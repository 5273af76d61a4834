package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphRank, Similarity}

/** [[graft.operators.GraphRank]] and [[Similarity.labelPurity]] —
  * structural laws a correct PageRank / centroid-margin must satisfy. */
class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric ring yields uniform ranks summing to ~1") {
    // 6-node ring, unit weights both directions: perfect symmetry means
    // every node's rank is exactly 1/6 at every iteration.
    val n = 6
    val edges = (0 until n).flatMap { i =>
      val j = (i + 1) % n
      Seq((i.toLong, j.toLong, 1L), (j.toLong, i.toLong, 1L))
    }.toDF("u", "v", "w")
    val r = GraphRank.pageRank(edges, iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    r.size shouldBe n
    r.values.foreach(v => v shouldBe (1.0 / n) +- 1e-9)
    r.values.sum shouldBe 1.0 +- 1e-6
  }

  test("pageRank: a hub out-ranks leaves and total mass is conserved") {
    // star: every leaf links to the hub and back — the hub aggregates
    // damping-weighted mass from all leaves.
    val leaves = (1L to 8L)
    val edges = leaves.flatMap(l => Seq((l, 0L, 1L), (0L, l, 1L)))
      .toDF("u", "v", "w")
    val r = GraphRank.pageRank(edges, iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    leaves.foreach(l => assert(r(0L) > r(l), s"hub ${r(0L)} vs leaf ${r(l)}"))
    r.values.sum shouldBe 1.0 +- 1e-6
  }

  test("pageRank: weighted edges shift rank toward the heavy target") {
    // b receives a 9/10 fraction of a's walk, c receives 1/10; b and c
    // route everything back to a.
    val edges = Seq((0L, 1L, 9L), (0L, 2L, 1L), (1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("u", "v", "w")
    val r = GraphRank.pageRank(edges, iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap
    assert(r(1L) > r(2L), r.toString)
  }

  test("pageRank is invariant to input partitioning (exact fixed point math)") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)(
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong, (rnd.nextInt(5) + 1).toLong))
    val df1 = edges.toDF("u", "v", "w").repartition(1)
    val df7 = edges.toDF("u", "v", "w").repartition(7)
    val r1 = GraphRank.pageRank(df1, 3, 0.85).as[(Long, Double)].collect().toMap
    val r7 = GraphRank.pageRank(df7, 3, 0.85).as[(Long, Double)].collect().toMap
    // bit-identical, not approximately equal: quantized contributions
    // make the per-node sum order-independent.
    r1 shouldBe r7
  }

  test("pageRank: broadcast hint flips to shuffle join above the node ceiling") {
    // URL-graph guard: below broadcastMaxNodes the per-iteration rank
    // join is hint-forced BroadcastHashJoin; above it the hints vanish
    // and the SAME code plans shuffle joins. autoBroadcastJoinThreshold
    // is disabled so only the hint can produce a broadcast — the flip is
    // the operator's decision, not the planner's size estimate.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 20L).map(i => (i, (i + 1) % 20, 1L))
        .toDF("u", "v", "w")
      val small = GraphRank.pageRank(edges, iters = 2, damping = 0.85)
      val large = GraphRank.pageRank(edges, iters = 2, damping = 0.85,
        broadcastMaxNodes = 0L)
      assert(small.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "hint must force broadcast below ceiling")
      assert(!large.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"), "no broadcast above ceiling")
      // strategy must not change the math
      small.orderBy("node").collect() shouldBe large.orderBy("node").collect()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("labelPurity: separated clusters -> positive margins; planted swap flags") {
    // two tight clusters on orthogonal axes; vector 99 carries cluster-B
    // coordinates but label 0 — the mislabel the margin must catch.
    val a = (0 until 5).map(i =>
      (i.toLong, 0L, Array(1.0f, 0.0f, 0.1f * i, 0.0f)))
    val b = (10 until 15).map(i =>
      (i.toLong, 1L, Array(0.0f, 1.0f, 0.0f, 0.1f * (i - 10))))
    val planted = Seq((99L, 0L, Array(0.0f, 1.0f, 0.0f, 0.25f)))
    val df = (a ++ b ++ planted).toDF("vec_id", "label", "embedding")
    val out = Similarity.labelPurity(df, col("vec_id"), col("label"),
        col("embedding"))
      .as[(Long, Long, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    (a ++ b).foreach { case (id, _, _) =>
      assert(out(id)._5 > 0, s"clean vector $id margin ${out(id)._5}")
      out(id)._6 shouldBe 0L
    }
    assert(out(99L)._5 < 0, s"planted mislabel margin ${out(99L)._5}")
    out(99L)._6 shouldBe 1L
  }
}
