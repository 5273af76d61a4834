package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.VecFns
import graft.operators.Similarity

/** [[graft.functions.VecDot]] — bit-parity against the interpreted
  * higher-order-function fold it replaced, null semantics, codegen
  * validity, and the SQL registration path. */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Any): Any = d match {
    case null => null
    case x: Double => java.lang.Double.doubleToRawLongBits(x)
  }

  /** Evaluate vecDot and dotFold on the same pair frame; both must be
    * bit-identical (same left-fold order, same widening). */
  private def parityRows(rows: Seq[(Seq[Float], Seq[Float])]): Unit = {
    val df = rows.toDF("a", "b")
    val out = df.select(
      VecFns.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("hof")).collect()
    out.foreach { r => bits(r.get(0)) shouldBe bits(r.get(1)) }
  }

  test("bit parity with the HOF fold on random float vectors (ScalaCheck)") {
    val finiteF: Gen[Float] = Gen.chooseNum(-1e6f, 1e6f)
    val vecPair: Gen[(List[Float], List[Float])] = for {
      n <- Gen.chooseNum(0, 96)
      a <- Gen.listOfN(n, finiteF)
      b <- Gen.listOfN(n, finiteF)
    } yield (a, b)
    // Batch the property into one Spark job per check-run for speed:
    val pairs = Gen.listOfN(40, vecPair)
    val prop = Prop.forAll(pairs) { ps => parityRows(ps); true }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("parity on non-finite values (NaN / Inf propagate identically)") {
    parityRows(Seq(
      (Seq(1f, Float.NaN, 3f), Seq(1f, 1f, 1f)),
      (Seq(Float.PositiveInfinity, 1f), Seq(1f, 1f)),
      (Seq(Float.PositiveInfinity, 1f), Seq(0f, 1f)),
      (Seq(Float.MaxValue, Float.MaxValue), Seq(Float.MaxValue, -Float.MaxValue))))
  }

  test("null semantics: null array, length mismatch, null element -> null") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val rows = Seq(
      Row(null, Seq(1f, 2f)),
      Row(Seq(1f, 2f, 3f), Seq(1f, 2f)),         // zip_with pads -> null
      Row(Seq(1f, null, 3f), Seq(1f, 2f, 3f)),   // null poisons the fold
      Row(Seq(1f, 2f), Seq(3f, 4f)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(
        Option(r.get(0)).map(_.asInstanceOf[Seq[Any]]).orNull,
        Option(r.get(1)).map(_.asInstanceOf[Seq[Any]]).orNull))), schema)
    val out = df.select(
      VecFns.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("hof")).collect()
    out.take(3).foreach { r => r.isNullAt(0) shouldBe true }
    out.foreach { r => bits(r.get(0)) shouldBe bits(r.get(1)) }
    out.last.getDouble(0) shouldBe 11.0
  }

  test("mixed float x double arrays (the LSH plane-projection shape)") {
    val vals = Seq(0.5f, -2f, 3.25f)
    val w = Similarity.planeWeights(0, 3)
    var acc = 0.0 // same strict left fold, driver-side
    vals.indices.foreach(j => acc += vals(j).toDouble * w(j))
    val got = Seq(vals).toDF("e")
      .select(VecFns.vecDot(col("e"), typedLit(w)).as("d"))
      .as[Double].head()
    bits(got) shouldBe bits(acc)
  }

  test("doGenCode is valid: evaluates under CODEGEN_ONLY factory mode") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      val out = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
        .select(VecFns.vecDot(col("a"), col("b")).as("d")).as[Double].head()
      out shouldBe 32.0
    } finally {
      old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
  }

  test("vec_dot is callable from SQL via GraftExtensions") {
    spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .as[Double].head() shouldBe 11.0
  }

  test("lshBucket over VecDot matches the legacy per-element fold") {
    // The pre-VecDot formulation, inlined as the independent witness.
    def legacyBucket(embCol: org.apache.spark.sql.Column, numPlanes: Int, dim: Int) =
      (0 until numPlanes).map { p =>
        val dot = aggregate(sequence(lit(0), lit(dim - 1)), lit(0.0),
          (acc, j) => acc + element_at(embCol, j + 1).cast("double") *
            ((lit(Similarity.planeA(p)) * (j + 1) + lit(Similarity.planeB(p))) % 1009 - 504).cast("double"))
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)

    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Seq.fill(16)(rnd.nextFloat() * 2 - 1)).toDF("e")
    val out = vecs.select(
      Similarity.lshBucket(col("e"), 8, 16).as("now"),
      legacyBucket(col("e"), 8, 16).as("legacy")).collect()
    out.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
  }
}
