package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Curation, Sampling}

/** Randomized laws for the round-6 rank-based operators, checked on
  * generated frames independently of the DuckDB oracle (which pins
  * engine parity, not the math):
  *  - percentileNormalize: range, boundary, within-group monotonicity;
  *  - rocAuc: label-flip antisymmetry (AUC(y) + AUC(1−y) = 1);
  *  - prioritySample: scale-invariance of the pick under uniform
  *    weight scaling (priorities scale linearly; the top-n holds). */
class RankLawsSpec extends SparkSpec {
  import spark.implicits._

  private val frames: Gen[List[(Long, String, Long)]] = for {
    n <- Gen.choose(6, 40)
    vs <- Gen.listOfN(n, Gen.choose(0L, 40L))
    gs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield vs.zip(gs).zipWithIndex.map { case ((v, g), i) => (i.toLong, g, v) }

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("percentileNormalize: pct in [0,1], group extremes at 0/1, monotone in value") {
    check(Prop.forAll(frames) { rows =>
      val out = Curation.percentileNormalize(rows.toDF("id", "g", "v"),
          col("g"), col("v"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
      val inRange = out.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 }
      val groupsOk = out.groupBy(_._1).values.forall { grp =>
        grp.length == 1 || {
          val ps = grp.map(_._3)
          math.abs(ps.min) < 1e-12 && math.abs(ps.max - 1.0) < 1e-12 && {
            val sorted = grp.sortBy(_._3)
            sorted.sliding(2).forall {
              case Array(lo, hi) => lo._2 <= hi._2
              case _ => true
            }
          }
        }
      }
      inRange && groupsOk
    }, 8)
  }

  test("rocAuc: flipping labels reflects AUC around 1/2") {
    check(Prop.forAll(frames) { rows =>
      val pos = rows.count(_._1 % 2 == 1)
      pos == 0 || pos == rows.length || {
        val df = rows.toDF("id", "g", "v")
          .select(col("id"), col("v"), (col("id") % 2).cast("int").as("y"))
        val a = Curation.rocAuc(df, col("v"), col("y"), col("id"))
          .head().getDouble(3)
        val b = Curation.rocAuc(df.withColumn("y", lit(1) - col("y")),
          col("v"), col("y"), col("id")).head().getDouble(3)
        math.abs(a + b - 1.0) < 1e-9
      }
    }, 6)
  }

  test("prioritySample: uniformly scaling weights leaves the pick unchanged") {
    check(Prop.forAll(frames) { rows =>
      val df = rows.toDF("id", "g", "w")
        .select(col("id"), (col("w") + 1).as("w")) // weights > 0
      val k = math.min(10, rows.length)
      val base = Sampling.prioritySample(df, col("id"), col("w"), k, "lw")
        .collect().map(_.getLong(0)).sorted.toSeq
      val scaled = Sampling.prioritySample(
        df.withColumn("w", col("w") * 7), col("id"), col("w"), k, "lw")
        .collect().map(_.getLong(0)).sorted.toSeq
      scaled == base
    }, 6)
  }
}
