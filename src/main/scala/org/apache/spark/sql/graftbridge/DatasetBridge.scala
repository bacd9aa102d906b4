package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Wrap a logical plan in a DataFrame — `Dataset.ofRows` is `private[sql]`.
  * Used by the transparent view rewrites to splice a DSv2 relation over a
  * view store into a replacement plan, so OTHER plan-level rules (the
  * aggregate rewrite composing above the join rewrite) can recognize the
  * spliced scan the same way they recognize a catalog scan. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
