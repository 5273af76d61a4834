package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the r16 optimization-round evidence trail (`plans/r16/<q>_*.txt`).
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  * writes `<outDir>/<query>_<suffix>.txt` per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").toSeq
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t0 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val planSec = (System.nanoTime() - t0) / 1e9
      val phases = df.queryExecution.tracker.phases.map { case (p, s) =>
        f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2fs"
      }.mkString(" ")
      System.err.println(f"[plandump] $n plan-to-executedPlan " +
        f"$planSec%.2f s ($phases)")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(
        s"$outDir/${n}_$suffix.txt", "UTF-8")
      try w.println(txt) finally w.close()
      System.err.println(s"[plandump] wrote $n")
    }
    System.err.println(
      org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent())
    spark.stop()
  }
}
