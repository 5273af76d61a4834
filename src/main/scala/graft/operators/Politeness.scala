package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness fetch-time scheduling — the recurrence a crawl queue
  * runs per host: requests are served in arrival order, never less
  * than `delay` apart, and never before they arrive:
  *
  *   t₀ = arr₀,   tₖ = max(arrₖ, tₖ₋₁ + delay)
  *
  * Written like that it is a SEQUENTIAL stateful scan — the shape
  * that does not distribute. But unrolling gives the closed form
  *
  *   tₖ = max_{j ≤ k} (arrⱼ + (k − j)·delay)
  *      = k·delay + max_{j ≤ k} (arrⱼ − j·delay)
  *
  * — a rank and a RUNNING MAX, i.e. two window passes over the same
  * host-partitioned sort: a parallel prefix computation Spark executes
  * with ONE exchange. (The same algebra turns any max-plus linear
  * recurrence into a prefix scan; PolitenessSpec pins closed-form ≡
  * sequential-fold on randomized inputs.)
  *
  * 100 TB shape: the frontier shuffles once on its host key; both
  * windows share that partitioning (host-bounded, never global). */
object Politeness {

  /** Adds `fetch_at_us`: the serve time of each row under per-key
    * FIFO with a per-row `delayUs` minimum gap (delay is constant per
    * key in the crawl use; the algebra only needs it constant per
    * key). Rows are ordered by (`tsUs`, `ordCol`) within `key`. */
  def schedule(df: DataFrame, key: Column, tsUs: Column, ord: Column,
               delayUs: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tsUs, ord)
    val k = row_number().over(w).cast("long") - 1L
    val running = Window.partitionBy(key).orderBy(tsUs, ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_k", k)
      .withColumn("_base", tsUs - col("_k") * delayUs)
      .withColumn("fetch_at_us",
        col("_k") * delayUs + max(col("_base")).over(running))
      .drop("_k", "_base")
  }
}
