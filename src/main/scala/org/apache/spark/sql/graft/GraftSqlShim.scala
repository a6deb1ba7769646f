package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: wrapping a custom
  * LogicalPlan node back into a DataFrame. `Dataset.ofRows` is
  * package-private to org.apache.spark.sql, so this shim lives in a
  * subpackage of it — the standard pattern OSS Spark extensions
  * (connectors, Delta, etc.) use for exactly this call. Everything else
  * in graft goes through public APIs; keep it that way — additions to
  * this file need the same "no public route exists" justification. */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
