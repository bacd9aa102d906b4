package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Bridge to Spark's `private[sql]` V2 parquet write: a fully-functional
  * distributed `BatchWrite` (executor-side writers + FileCommitProtocol)
  * targeting one staging directory. The graft row-level operations stage
  * their replacement rows through it, then commit the staged files through
  * the TableStore snapshot protocol. Lives under `org.apache.spark.sql`
  * purely for access; no logic. */
object ParquetWriteBridge {
  def stagingWrite(path: String, info: LogicalWriteInfo): Write = {
    val opts = new java.util.HashMap[String, String]()
    info.options().entrySet().forEach(e => opts.put(e.getKey, e.getValue))
    opts.put("path", path)
    val wrapped = new LogicalWriteInfo {
      override def options(): CaseInsensitiveStringMap = new CaseInsensitiveStringMap(opts)
      override def queryId(): String = info.queryId()
      override def schema(): StructType = info.schema()
    }
    ParquetWrite(Seq(path), "Parquet", _ => true, wrapped)
  }
}
