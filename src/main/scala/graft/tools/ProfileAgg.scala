package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-off micro-profile: isolate the per-row cost of decimal aggregation
  * vs double/long aggregation on the sf5 lineitem (diagnosing the q01/q15
  * scale constant). */
object ProfileAgg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data/sf5")
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // warm
    li.groupBy(col("l_returnflag")).agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    time("count only") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("sum double") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice"))).write.format("noop").mode("overwrite").save()
    }
    time("sum long (unscaled)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(unscaled_value(col("l_extendedprice").cast(DecimalType(18, 4)))))
        .write.format("noop").mode("overwrite").save()
    }
    time("sum decimal(18,4)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4))))
        .write.format("noop").mode("overwrite").save()
    }
    time("3x sum decimal (q01 shape)") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")),
          sum(col("l_extendedprice").cast(DecimalType(18, 4))),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 4))),
          count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    // the REAL q01 aggregate (davg adds a scale-6 decimal sum), repeated
    // to separate JIT warmup from steady state
    for (i <- 1 to 3) time(s"q01 exact agg, run $i") {
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("sum_base"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 4))).cast("double").as("sum_disc"),
          (sum(col("l_quantity").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }

  private def unscaled_value(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(org.apache.spark.sql.catalyst.expressions.UnscaledValue(
      Bridge.expression(c)))
  }
}
