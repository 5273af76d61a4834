package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Shared local SparkSession for the ScalaTest suite (one JVM-wide
  * session; suites run sequentially in the forked test JVM). */
trait SparkSpec extends AnyFunSuite with Matchers {
  lazy val spark: SparkSession = SparkSpec.session

  /** Collect a 2-D grid frame (line, sample, value) into a dense matrix
    * for golden comparison. */
  def toMatrix(df: DataFrame, rows: Int, cols: Int,
               value: String = "value"): Array[Array[Double]] = {
    val m = Array.fill(rows, cols)(Double.NaN)
    df.select("line", "sample", value).collect().foreach { r =>
      m(r.getAs[Number](0).intValue())(r.getAs[Number](1).intValue()) =
        r.getAs[Number](2).doubleValue()
    }
    m
  }
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
}
