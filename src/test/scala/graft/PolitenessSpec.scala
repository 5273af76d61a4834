package graft

import org.apache.spark.sql.functions._
import graft.operators.Politeness

/** Politeness scheduling (q193): the closed-form prefix-max must equal
  * the sequential recurrence it replaces, and satisfy the queue laws. */
class PolitenessSpec extends SparkSpec {

  /** The recurrence as literally written: a sequential fold. */
  private def sequential(arrivals: Seq[Long], delay: Long): Seq[Long] =
    arrivals.sorted.scanLeft(Long.MinValue) { (prev, arr) =>
      if (prev == Long.MinValue) arr else math.max(arr, prev + delay)
    }.tail

  private def run(rows: Seq[(Long, Long)], delays: Map[Long, Long])
      : Map[(Long, Long), Long] = {
    import spark.implicits._
    val df = rows.zipWithIndex
      .map { case ((h, a), i) => (h, a, i.toLong) }
      .toDF("host", "arr_us", "event_id")
      .withColumn("delay_us",
        delays.foldLeft(lit(0L)) { case (acc, (h, d)) =>
          when(col("host") === h, d).otherwise(acc) })
    Politeness.schedule(df, col("host"), col("arr_us"), col("event_id"),
        col("delay_us"))
      .collect()
      .map(r => (r.getAs[Long]("host"), r.getAs[Long]("arr_us")) ->
        r.getAs[Long]("fetch_at_us")).toMap
  }

  test("closed form equals the sequential fold (randomized)") {
    val rnd = new scala.util.Random(20260815)
    for (_ <- 0 until 20) {
      val hosts = (0L until 4L)
      val delays = hosts.map(h => h -> (1L + rnd.nextInt(5))).toMap
      val rows = for (h <- hosts; _ <- 0 until (3 + rnd.nextInt(12)))
        yield (h, rnd.nextInt(40).toLong)
      // make (host, arr) unique so both orderings agree without ids
      val uniq = rows.groupBy(identity).keys.toSeq
      val got = run(uniq, delays)
      for (h <- hosts) {
        val arr = uniq.filter(_._1 == h).map(_._2).sorted
        val want = sequential(arr, delays(h))
        arr.zip(want).foreach { case (a, t) => got((h, a)) shouldBe t }
      }
    }
  }

  test("queue laws: fetch ≥ arrival; same-host gaps ≥ delay; FIFO order") {
    val delays = Map(0L -> 3L)
    val arrivals = Seq(0L, 1L, 2L, 10L, 11L, 30L)
    val got = run(arrivals.map(a => (0L, a)), delays)
    val fetches = arrivals.map(a => got((0L, a)))
    fetches.zip(arrivals).foreach { case (f, a) => f should be >= a }
    fetches.sliding(2).foreach { case Seq(a, b) => (b - a) should be >= 3L }
    fetches shouldBe fetches.sorted
    // and the exact values: 0,3,6,10,13,30
    fetches shouldBe Seq(0L, 3L, 6L, 10L, 13L, 30L)
  }

  test("hosts are independent: one hot host never delays another") {
    val delays = Map(0L -> 100L, 1L -> 1L)
    val got = run(Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)), delays)
    got((1L, 0L)) shouldBe 0L
    got((1L, 1L)) shouldBe 1L
    got((0L, 1L)) shouldBe 100L
  }
}
