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
}
