package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-walking helpers for file-skipping verification (shared by the
  * TableStore specs and the dev measurement tools): the FileSourceScanExec
  * nodes of an EXECUTED plan, unwrapping AQE, and their `numFiles` metric. */
object PlanScans {

  def fileScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  /** Executes the frame, then sums `numFiles` across its file scans. A fully
    * pruned scan collapses to an empty local relation under AQE → 0. */
  def filesScanned(q: DataFrame): Long = {
    q.collect()
    fileScans(q.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }
}
