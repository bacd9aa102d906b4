package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters

/** Bridge to the `private[sql]` catalyst-filter pushdown interface the stock
  * file-source scan builders implement, so a wrapping builder can forward
  * converted predicates for parquet row-group/page skipping. No logic. */
object CatalystPushBridge {
  def push(sb: ScanBuilder, exprs: Seq[Expression]): Unit = sb match {
    case c: SupportsPushDownCatalystFilters => c.pushFilters(exprs); ()
    case _ => ()
  }
}
