package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a library-defined logical operator needs:
  * wrapping a hand-built [[LogicalPlan]] back into a public [[DataFrame]]
  * (`Dataset.ofRows` is sql-private by design; a same-package bridge is the
  * standard extension pattern — everything else in this repo stays on the
  * public API).
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
