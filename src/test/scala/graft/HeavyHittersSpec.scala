package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg
import graft.operators.HeavyHitters

/** [[graft.operators.HeavyHitters]] / [[graft.functions.MisraGriesAgg]] —
  * the two-pass heavy-hitter contract: the final output is the EXACT
  * groupBy-having answer whenever capacity+1 > den, for adversarial key
  * domains larger than the sketch, under any partitioning, on random
  * skewed streams. The sketch alone only promises candidate presence;
  * every test asserts the confirmed output. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: groupBy-having in memory. */
  private def exact(items: Seq[String], den: Long): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * den >= n }.toMap
  }

  private def run(items: Seq[String], capacity: Int, den: Long,
                  parts: Int): Map[String, Long] =
    HeavyHitters.heavyHitters(
      items.toDF("k").repartition(parts), col("k"), capacity, den)
      .as[(String, Long)].collect().toMap

  test("exact output on a domain larger than the sketch (eviction exercised)") {
    // 500 distinct rare keys + 3 heavy ones; capacity 32 << 503 distinct
    val heavy = Seq.fill(300)("h1") ++ Seq.fill(200)("h2") ++ Seq.fill(150)("h3")
    val noise = (0 until 500).map(i => s"n$i")
    val items = new scala.util.Random(7).shuffle(heavy ++ noise)
    val got = run(items, capacity = 32, den = 10L, parts = 4)
    got shouldBe exact(items, 10L)
    got.keySet shouldBe Set("h1", "h2", "h3")
  }

  test("output independent of partitioning and row order") {
    val rnd = new scala.util.Random(13)
    val items = Seq.fill(2000)(s"k${math.min(rnd.nextInt(40), rnd.nextInt(40))}")
    val ref = exact(items, 20L)
    Seq(1, 3, 8).foreach { p =>
      run(rnd.shuffle(items), capacity = 64, den = 20L, parts = p) shouldBe ref
    }
  }

  test("random skewed streams match the exact answer (fuzz)") {
    val rnd = new scala.util.Random(99)
    (1 to 5).foreach { _ =>
      // zipf-ish: key = min of two uniforms, squared skew
      val items = Seq.fill(1500)(
        s"z${math.min(math.min(rnd.nextInt(60), rnd.nextInt(60)), rnd.nextInt(60))}")
      run(items, capacity = 50, den = 40L, parts = 5) shouldBe exact(items, 40L)
    }
  }

  test("null keys are ignored and do not count toward the total") {
    val df = (Seq.fill(40)(Some("a")) ++ Seq.fill(5)(Some("b"))
      ++ Seq.fill(55)(Option.empty[String])).toDF("k")
    val got = HeavyHitters.heavyHitters(df, col("k"), 16, 10L)
      .as[(String, Long)].collect().toMap
    // N = 45 non-null items; b has 5/45 > 1/10 — nulls in N would flip it
    got shouldBe Map("a" -> 40L, "b" -> 5L)
  }

  test("capacity too small for the threshold is rejected") {
    an[IllegalArgumentException] should be thrownBy
      HeavyHitters.heavyHitters(Seq("x").toDF("k"), col("k"), 10, 100L)
  }

  test("sketch presence guarantee: every key above N/(capacity+1) survives") {
    // direct sketch probe (not the confirmed output): adversarial order —
    // all heavy occurrences FIRST, then a flood of distinct noise keys
    // trying to evict them
    val heavy = Seq.fill(200)("H")
    val noise = (0 until 900).map(i => s"x$i")
    val sk = (heavy ++ noise).toDF("k").repartition(3)
      .agg(MisraGriesAgg.misraGries(col("k"), 64).as("s"))
      .select(col("s.n_total"), col("s.keys"))
      .as[(Long, Seq[String])].head()
    sk._1 shouldBe 1100L
    // H has 200 > 1100/65 ≈ 17 — must be present whatever the order
    sk._2 should contain("H")
  }

  test("misra_gries is callable from SQL text (GraftExtensions)") {
    (Seq.fill(30)("hot") ++ Seq("c1", "c2")).toDF("k")
      .createOrReplaceTempView("mg_in")
    val r = spark.sql("SELECT misra_gries(k, 4) AS s FROM mg_in")
      .select("s.n_total", "s.keys").as[(Long, Seq[String])].head()
    r._1 shouldBe 32L
    r._2 should contain("hot")
  }

  test("confirm pass broadcasts the candidates (plan contract)") {
    val p = HeavyHitters.heavyHitters(
      (1 to 100).map(i => s"k${i % 5}").toDF("k"), col("k"), 16, 10L)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    // the sketch aggregate runs as an object hash aggregate
    p should include("misra_gries")
  }
}
