package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` bridge graft's SQL command layer needs:
  * turning a resolved [[LogicalPlan]] (e.g. the source side of a
  * `MERGE INTO` statement) back into a [[DataFrame]] so a command can
  * execute it. `Dataset.ofRows` is `private[sql]`, and the supported
  * extension-author technique — used by every production Spark table
  * format — is a minimal shim in a subpackage of
  * `org.apache.spark.sql`. Nothing else in graft lives outside the
  * `graft` package, and nothing here adds behavior. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
}
