package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** [[graft.operators.Skew]] — salting is placement-only: salted join and
  * two-phase salted aggregation must equal their plain counterparts, and
  * the partial-phase shuffle must actually key on the salt. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fact = (1 to 400).map { i =>
    (if (i % 10 < 7) 0L else (i % 25).toLong, i.toLong, i * 0.5)
  }.toDF("kk", "id", "v")
  private lazy val dim = (0 until 25)
    .map(k => (k.toLong, s"d$k")).toDF("kk", "name")

  test("saltedJoin equals the plain equi join") {
    val salted = Skew.saltedJoin(fact, dim, Seq("kk"), 4, Seq(col("id")))
      .select("kk", "id", "v", "name")
    val plain = fact.join(dim, Seq("kk")).select("kk", "id", "v", "name")
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("saltedAgg equals the plain aggregation (decimal-exact sums)") {
    val salted = Skew.saltedAgg(fact, Seq("kk"), 4, Seq(col("id")),
      partialAggs = Seq(
        sum(col("v").cast("decimal(18,4)")).as("_ps"), count(lit(1)).as("_pc")),
      finalAggs = Seq(
        sum(col("_ps")).cast("double").as("sv"), sum(col("_pc")).as("n")))
    val plain = fact.groupBy("kk")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("sv"),
        count(lit(1)).as("n"))
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("hot-key stress: salting bounds the max reducer share of a 90%-hot key") {
    // 10,000 rows, 9,000 of them on key 0 — the shape where an unsalted
    // final reducer serializes. The partial phase must spread the hot
    // key over all `numSalts` groups with no group holding more than
    // ~2x its fair share (Murmur3 salt from the unique id is ~uniform).
    val numSalts = 8
    val hot = (1 to 10000).map { i =>
      (if (i <= 9000) 0L else (i % 40 + 1).toLong, i.toLong, i * 0.25)
    }.toDF("kk", "id", "v")
    val shares = Skew.saltedAgg(hot, Seq("kk"), numSalts, Seq(col("id")),
        partialAggs = Seq(count(lit(1)).as("_pc")),
        finalAggs = Seq(max(col("_pc")).as("max_pc"),
          sum(col("_pc")).as("n"), count(lit(1)).as("n_salt_groups")))
    val hotRow = shares.filter(col("kk") === 0L)
      .select("max_pc", "n", "n_salt_groups")
      .as[(Long, Long, Long)].head()
    hotRow._2 shouldBe 9000L            // nothing lost
    hotRow._3 shouldBe numSalts.toLong  // hot key spread over every salt
    // fair share is 9000/8 = 1125; the 2x bound FAILS at numSalts = 1
    // (max_pc would be 9000) and whenever the salt stops spreading
    assert(hotRow._1 <= 2L * 9000 / numSalts,
      s"hot key concentrated: max reducer share ${hotRow._1}")
    // and correctness is untouched by the skew: equals the plain agg
    val salted = Skew.saltedAgg(hot, Seq("kk"), numSalts, Seq(col("id")),
      partialAggs = Seq(
        sum(col("v").cast("decimal(18,4)")).as("_ps"), count(lit(1)).as("_pc")),
      finalAggs = Seq(
        sum(col("_ps")).cast("double").as("sv"), sum(col("_pc")).as("n")))
    val plain = hot.groupBy("kk")
      .agg(sum(col("v").cast("decimal(18,4)")).cast("double").as("sv"),
        count(lit(1)).as("n"))
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
  }

  test("the partial phase shuffles on (key, salt), not the key alone") {
    val salted = Skew.saltedAgg(fact, Seq("kk"), 4, Seq(col("id")),
      partialAggs = Seq(count(lit(1)).as("_pc")),
      finalAggs = Seq(sum(col("_pc")).as("n")))
    val exchanges = salted.queryExecution.executedPlan.toString()
      .linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.exists(l => l.contains("kk") && l.contains("_salt")),
      s"no (kk, _salt) exchange in:\n${exchanges.mkString("\n")}")
  }
}
