package graft

import org.apache.spark.sql.functions._

import graft.functions.VecFns

/** [[graft.functions.DequantizeGrid]] — parity with the column
  * formulation it replaced, null/shape semantics, codegen validity. */
class DequantizeGridSpec extends SparkSpec {
  import spark.implicits._

  private val mins = Array(0.0, -1.0, 2.0)
  private val maxs = Array(1.0, 1.0, 2.0) // dim 2 degenerate: mx == mn

  private def reference(v: Seq[Float]): Seq[Double] =
    v.zipWithIndex.map { case (x, i) =>
      val (mn, mx) = (mins(i), maxs(i))
      if (mx == mn) mn
      else mn + math.floor((x.toDouble - mn) * 254.0 / (mx - mn)) * (mx - mn) / 254.0
    }

  test("matches the scalar reference on random vectors; degenerate dim -> mn") {
    val rnd = new scala.util.Random(61)
    val rows = Seq.fill(200)(Seq(rnd.nextFloat(), rnd.nextFloat() * 2 - 1, 2.0f))
    val got = rows.toDF("embedding")
      .select(VecFns.dequantizeGrid(col("embedding"), mins, maxs, 254.0).as("q"))
      .as[Seq[Double]].collect().toSeq
    got.zip(rows.map(reference)).foreach { case (g, w) => g shouldBe w }
  }

  test("null array, null element and length mismatch all yield null") {
    val df = Seq(
      (1, Some(Seq[Option[Float]](Some(0.5f), Some(0.0f), Some(2.0f)))),
      (2, Some(Seq[Option[Float]](Some(0.5f), None, Some(2.0f)))),
      (3, Some(Seq[Option[Float]](Some(0.5f)))), // wrong length
      (4, Option.empty[Seq[Option[Float]]])).toDF("id", "embedding")
    val out = df.orderBy("id")
      .select(VecFns.dequantizeGrid(col("embedding"), mins, maxs, 254.0).as("q"))
      .collect()
    out(0).isNullAt(0) shouldBe false
    out(1).isNullAt(0) shouldBe true
    out(2).isNullAt(0) shouldBe true
    out(3).isNullAt(0) shouldBe true
  }

  test("evaluates under CODEGEN_ONLY factory mode") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val got = Seq(Seq(1.0f, 1.0f, 2.0f)).toDF("embedding")
        .select(VecFns.dequantizeGrid(col("embedding"), mins, maxs, 254.0).as("q"))
        .as[Seq[Double]].head()
      got shouldBe Seq(1.0, 1.0, 2.0)
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
