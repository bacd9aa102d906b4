package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Bridge for V1 streaming sinks: the DataFrame handed to `Sink.addBatch` is
  * bound to the in-flight streaming execution and cannot be re-planned by
  * ordinary DataFrame writes; re-wrap its already-computed rows as a plain
  * batch frame (the same move Spark's own V1 sinks make). Lives under
  * `org.apache.spark.sql` for `private[sql]` access; no logic. */
object StreamSinkBridge {
  def asBatch(data: DataFrame): DataFrame = {
    val classic = data.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
  }
}
