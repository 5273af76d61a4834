package graft.plans

import org.apache.spark.sql.DataFrame

/** Analyzer-time schema checks (SURVEY.md §4 custom candidate #3).
  *
  * The reference fails fast when a scene file lacks required variables
  * (`check_file_healthiness`, `/root/reference/asip_v2/archive.py:205-214`).
  * Engine mapping: the presence check runs at plan-BUILD time against the
  * resolved schema — before any job is submitted — so a malformed input
  * fails in milliseconds, not after a cluster-wide scan.
  */
object Checks {

  /** P4 presence check: every `required` column must exist (by name).
    * Returns the frame unchanged — compose with `.transform`. */
  def requireColumns(df: DataFrame, required: String*): DataFrame = {
    val have = df.columns.toSet
    val missing = required.filterNot(have)
    require(missing.isEmpty,
      s"missing required columns: ${missing.mkString(", ")} " +
        s"(schema has: ${df.columns.sorted.mkString(", ")})")
    df
  }
}
