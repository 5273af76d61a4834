package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** [[graft.functions.SimHash32]] — parity with the HOF fold it
  * replaced, null/empty semantics, codegen validity, SQL registration. */
class SimHash32Spec extends SparkSpec {
  import spark.implicits._

  test("parity with the HOF fold on random hash arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(40))(rnd.nextLong() & ((1L << 60) - 1)))
    val out = rows.toDF("hs").select(
      TextFns.simhash32(col("hs")).as("native"),
      TextFns.simhash32Fold(col("hs")).as("hof")).collect()
    out.foreach { r => r.getLong(0) shouldBe r.getLong(1) }
  }

  test("empty array -> 0; null element counts -1 per bit; null array -> null") {
    val df = Seq(
      (1, Some(Seq[Option[Long]]())),
      (2, Some(Seq[Option[Long]](Some(5L), None))), // bits of 5 tie at 0 -> unset
      (3, Option.empty[Seq[Option[Long]]])).toDF("id", "hs")
    val out = df.orderBy("id").select(
      TextFns.simhash32(col("hs")).as("native"),
      TextFns.simhash32Fold(col("hs")).as("hof")).collect()
    out(0).getLong(0) shouldBe 0L
    out(1).getLong(0) shouldBe 0L
    out(2).isNullAt(0) shouldBe true
    out.foreach { r =>
      (if (r.isNullAt(0)) null else r.getLong(0)) shouldBe
        (if (r.isNullAt(1)) null else r.getLong(1))
    }
  }

  test("evaluates under CODEGEN_ONLY factory mode and from SQL") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      // bits of 5 = {0,2}; single element -> counts +1 on {0,2}, -1 rest
      Seq(Seq(5L)).toDF("hs")
        .select(TextFns.simhash32(col("hs")).as("s")).as[Long].head() shouldBe 5L
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    // 5=0b101, 5, 2=0b010: bit0 count +1, bit1 count -1, bit2 count +1 -> 0b101
    spark.sql("SELECT simhash32(array(5L, 5L, 2L)) AS s")
      .as[Long].head() shouldBe 5L
  }
}
