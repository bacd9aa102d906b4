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

  /** Structural probe for the zero-scan metadata serves (r17, VERDICT r16
    * next #8 — replaces the brittle `plan.contains("graft-manifest-agg")` /
    * `!plan.contains("Parquet")` string asserts): EVERY leaf of the
    * executed plan is a local relation — the pushAggregation LocalScan
    * plans as a LocalTableScan, optimizer-spliced LocalRelations likewise,
    * and an AQE-collapsed empty side is an EmptyRelationExec — so the
    * query provably touches zero data files of any format. */
  def metadataOnly(df: DataFrame): Boolean = {
    def leavesLocal(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => leavesLocal(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leavesLocal(s.plan)
      case _: org.apache.spark.sql.execution.LocalTableScanExec => true
      case _: org.apache.spark.sql.execution.EmptyRelationExec => true
      case l if l.children.isEmpty => false
      case other => other.children.forall(leavesLocal)
    }
    leavesLocal(df.queryExecution.executedPlan)
  }
}
