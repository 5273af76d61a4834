package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomPrune, Dedup}

/** [[graft.operators.BloomPrune]] — the sketch prunes but never drops:
  * no false negatives (every inserted key passes might_contain), the
  * pruned decontamination scan equals the exact non-bloom computation,
  * and the subquery probe actually lands in the plan as might_contain. */
class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val keys = (0L until 2000L).map(i => i * 2654435761L % 100003L)
    .toDF("h")

  test("sketch has no false negatives over every inserted key") {
    val sketch = BloomPrune.buildSketch(keys, col("h"), 4096L, 1L << 16)
    val missed = keys.where(!BloomPrune.mightContain(sketch, col("h"))).count()
    missed shouldBe 0L
  }

  test("sketch prunes: disjoint probe keys mostly rejected") {
    val sketch = BloomPrune.buildSketch(keys, col("h"), 4096L, 1L << 16)
    // probe keys guaranteed disjoint from the build set (offset past it)
    val probes = (0L until 2000L).map(i => 200007L + i * 2654435761L % 100003L + 100004L)
      .toDF("h")
    val surviving = probes.where(BloomPrune.mightContain(sketch, col("h"))).count()
    // at 16 bits/item the fpp is well under 1%; allow 5% slack
    surviving should be < 100L
  }

  private lazy val docsFixture = Seq(
    // eval docs (src0) — "a b c d", "x y z w"
    (1L, "a b c d e f", "src0"),
    (2L, "x y z w v u", "src0"),
    // train docs: doc 10 contains eval 1's content, doc 11 is clean,
    // doc 12 shares a few shingles with eval 2
    (10L, "a b c d e f g h", "src1"),
    (11L, "p q r s t u0 v0 w0", "src1"),
    (12L, "x y z w n m o k", "src2")
  ).toDF("doc_id", "text", "source")

  test("bloom-pruned contamination equals the exact computation") {
    val ev = docsFixture.where(col("source") === "src0")
    val tr = docsFixture.where(col("source") =!= "src0")
    val pruned = BloomPrune.contaminatedTrainDocs(
      ev, tr, col("doc_id"), col("text"), shingleN = 3, minShared = 2,
      expectedItems = 64L, numBits = 1L << 12)
    // exact reference: distinct-shingle overlap with no bloom anywhere
    val evSh = Dedup.shingleSets(ev, col("doc_id"), col("text"), 3)
      .select(explode(col("shset")).as("h")).distinct()
    val trSh = Dedup.shingleSets(tr, col("doc_id"), col("text"), 3)
      .select(col("doc_id").as("t_id"), explode(col("shset")).as("h"))
    val exact = trSh.join(evSh, "h").groupBy("t_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
    pruned.exceptAll(exact).count() shouldBe 0L
    exact.exceptAll(pruned).count() shouldBe 0L
    // and the expected docs are the contaminated ones
    pruned.select("t_id").as[Long].collect().sorted shouldBe Array(10L, 12L)
  }

  test("subquery probe lands in the plan as a scan-stage might_contain") {
    val ev = docsFixture.where(col("source") === "src0")
    val tr = docsFixture.where(col("source") =!= "src0")
    val plan = BloomPrune.contaminatedTrainDocs(
      ev, tr, col("doc_id"), col("text"), 3, 2, 64L, 1L << 12)
      .queryExecution.executedPlan.toString
    plan should include("might_contain(Subquery subquery")
    // the sketch must NOT be inlined as a hex literal (plan bloat)
    plan.length should be < 100000
  }
}
