package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** [[graft.functions.ModeCount]] — parity with the nested-HOF fold it
  * replaced, null/empty semantics, codegen validity, SQL registration. */
class ModeCountSpec extends SparkSpec {
  import spark.implicits._

  test("parity with the HOF fold on random token arrays") {
    val rnd = new scala.util.Random(23)
    // small alphabet forces repeated tokens (non-trivial modes)
    val alphabet = Vector("a", "bb", "ccc", "d", "e", "ff", "g")
    val rows = Seq.fill(300)(
      Seq.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.size))))
    val out = rows.toDF("toks").select(
      TextFns.modeCount(col("toks")).as("native"),
      TextFns.modeCountFold(col("toks")).as("hof")).collect()
    out.foreach { r => r.getInt(0) shouldBe r.getInt(1) }
  }

  test("empty array -> 0, null array -> 0, null elements contribute 0") {
    val df = Seq(
      (1, Some(Seq[Option[String]]())),
      (2, Some(Seq[Option[String]](Some("a"), None, Some("a"), None, None))),
      (3, Option.empty[Seq[Option[String]]])).toDF("id", "toks")
    val out = df.orderBy("id").select(
      TextFns.modeCount(col("toks")).as("native"),
      TextFns.modeCountFold(col("toks")).as("hof")).collect()
    out(0).getInt(0) shouldBe 0
    // three nulls outnumber two "a"s, but nulls never count as the mode
    out(1).getInt(0) shouldBe 2
    out(2).getInt(0) shouldBe 0
    // the fold agrees on every row (its null-token count is 0 too)
    out.foreach { r => r.getInt(0) shouldBe r.getInt(1) }
  }

  test("evaluates under CODEGEN_ONLY factory mode and from SQL") {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      Seq(Seq("t", "u", "t", "t")).toDF("toks")
        .select(TextFns.modeCount(col("toks")).as("m")).as[Int].head() shouldBe 3
    } finally old.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    spark.sql("SELECT mode_count(array('x', 'y', 'y')) AS m")
      .as[Int].head() shouldBe 2
  }
}
