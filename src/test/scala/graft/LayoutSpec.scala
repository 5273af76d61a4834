package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** [[graft.operators.Layout.zValue]] — hand-computed Morton values and
  * the locality law the q69 gate demonstrates quantitatively. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("matches hand-computed Morton interleaves") {
    // a=5=0b101 -> even bits 0,4; b=3=0b011 -> odd bits 1,3
    // z = (1<<0)|(0<<2)|(1<<4) | (1<<1)|(1<<3)|(0<<5) = 1+16+2+8 = 27
    val out = Seq((5, 3), (0, 0), (7, 7), (1, 0), (0, 1))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    out shouldBe Seq(27L, 0L, 63L, 1L, 2L)
  }

  test("z >> 2k buckets bound both coordinate spans by 2^k") {
    val k = 3 // 64-cell buckets -> both spans < 8
    val rows = for (a <- 0 until 32; b <- 0 until 32) yield (a, b)
    val spans = rows.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zValue(col("a"), col("b"), 5).as("z"))
      .groupBy(shiftright(col("z"), 2 * k).as("bucket"))
      .agg((max(col("a")) - min(col("a"))).as("sa"),
        (max(col("b")) - min(col("b"))).as("sb"))
      .select(greatest(col("sa"), col("sb"))).as[Int].collect()
    all(spans) should be < (1 << k)
  }
}
