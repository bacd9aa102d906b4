package graft.catalog

import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.Partitioning
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Join-driven runtime file pruning for bucketed snapshots (the DSv2 analog
  * of dynamic partition pruning, SPARK-35779 — what Iceberg does for its
  * partition columns).
  *
  * A star-schema probe — `fact JOIN dim ON fact.k = dim.k WHERE dim.attr =
  * x` — carries no literal predicate on `k`, so static planning cannot
  * bucket-prune the fact scan and at 100 TB it reads the whole table even
  * though the dim side selects a handful of keys. Advertising the bucket
  * keys through [[SupportsRuntimeFiltering]] makes Spark's dynamic-pruning
  * planner build an IN-subquery over the dim side's join keys (reusing the
  * join's own broadcast) and hand the key set to [[filter]] before the scan
  * executes; the key set re-derives the touched buckets exactly as a
  * literal `k IN (...)` would ([[graft.store.TableStore.keyEqualityBuckets]]
  * ∩ file stats), and the scan replans over the surviving files only. The
  * reference pins this access shape as the table's primary one
  * (README.md:81-84 — DynamoDB `Query` on the partition key); runtime
  * pruning extends it from literal point lookups to joins.
  *
  * The wrapper delegates everything to the currently-planned scan and
  * swaps the delegate when a runtime filter arrives; Spark calls `toBatch`
  * again after `filter` (BatchScanExec.filteredPartitions) so the rebuilt
  * plan is the one that executes. Translation is best-effort: a filter
  * shape the store cannot use (or an oversized IN set, [[MaxRuntimeInValues]])
  * leaves the delegate unchanged — runtime pruning is an optimization, and
  * every pushed filter is also re-checked post-scan by the Filter node the
  * scan builder keeps. */
class RuntimePrunableScan(attrs: Seq[String], schema: StructType,
    rebuild: Seq[Expression] => Scan,
    @volatile private var delegate: Scan,
    colStatsProvider: () => java.util.Map[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      () => java.util.Collections.emptyMap(),
    rebuildFiles: Option[Seq[String] => Scan] = None) extends Scan
    with SupportsRuntimeFiltering with SupportsReportStatistics {

  /** Delegate size/row estimates, DECORATED with per-column statistics
    * (r14, CBO feed): min/max/nullCount from the driver-held manifest
    * stats, distinctCount from the analyze-maintained NDV sidecar —
    * Spark's `transformV2Stats` maps these into the relation's
    * `attributeStats`, so with `spark.sql.cbo.enabled` the optimizer
    * prices joins/filters over graft tables from REAL statistics instead
    * of size heuristics. The provider memoizes per scan instance; an
    * empty map (CBO off, or nothing provable) forwards untouched. */
  private lazy val decoratedCols = colStatsProvider()
  override def estimateStatistics(): Statistics = {
    val base = org.apache.spark.sql.graftbridge.KeyGroupedScanBridge
      .forwardStats(delegate)
    if (decoratedCols.isEmpty) base
    else new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = base.sizeInBytes()
      override def numRows(): java.util.OptionalLong = base.numRows()
      override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        decoratedCols
    }
  }
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String =
    s"runtimePrunable[${attrs.mkString(",")}] ${delegate.description()}"
  override def toBatch: Batch = delegate.toBatch
  override def supportedCustomMetrics() = delegate.supportedCustomMetrics()
  override def reportDriverMetrics() = delegate.reportDriverMetrics()
  override def columnarSupportMode() = delegate.columnarSupportMode()

  /** Only attributes present in the PRUNED read schema: Spark's
    * PartitionPruning resolves these against the scan's output and THROWS
    * on a miss (`V2ExpressionUtils.resolveRef`), so advertising a bucket
    * key the query projected away crashed every join that didn't select
    * the fact's primary key (found round 9 by the join-rewrite spec). A
    * key outside the output can't be runtime-filtered anyway. */
  override def filterAttributes(): Array[NamedReference] = {
    val have = readSchema().fieldNames.toSet
    attrs.filter(have).map(Expressions.column).toArray
  }

  override def filter(filters: Array[Filter]): Unit = {
    val exprs0 = filters.toSeq
      .flatMap(V2PredicateTranslator.v1FilterToCatalyst(_, schema))
    if (exprs0.isEmpty) return
    // an oversized IN set used to DROP runtime pruning entirely — a star
    // join whose dim side selects 1M keys stopped file-pruning exactly
    // when the fact was biggest (r15 verdict #4). Summarize instead:
    // fold the key set to its [min, max] range (a strict superset, so
    // pruning stays conservative; the join re-checks rows anyway) and
    // re-plan on that — O(#files) driver cost regardless of key count.
    val exprs =
      if (exprs0.map(RuntimePruning.inValueCount).sum <=
        RuntimePruning.MaxRuntimeInValues) exprs0
      else exprs0.map(RuntimePruning.summarizeOversized)
    if (exprs.map(RuntimePruning.inValueCount).sum <=
        RuntimePruning.MaxRuntimeInValues)
      delegate = rebuild(exprs)
  }

  /** Optimizer-time re-plan under extra catalyst predicates — the
    * monotone-range rewrite's hook (r15): V2 filter pushdown runs BEFORE
    * the user-rule batch, so ranges derived from a truncation predicate
    * arrive after the scan is built; this re-prunes the file list through
    * the same replan the runtime-filter path uses. Sound for any
    * predicate IMPLIED by the plan's residual Filter (rows are still
    * checked row-exact above). */
  private[catalog] def pruneWith(exprs: Seq[Expression]): Unit =
    if (exprs.nonEmpty) delegate = rebuild(exprs)

  /** Optimizer-time re-plan to an EXPLICIT file list — the top-k ×
    * decidable-WHERE composition's hook (r17): the caller has proven
    * every row of `files` matches the plan's Filter (and that the top-n
    * rows live inside them), so the rebuilt scan carries no pushed
    * predicates at all. Returns false when this scan has no file-list
    * rebuild route (the caller then leaves the plan untouched). */
  private[catalog] def pruneToFiles(files: Seq[String]): Boolean =
    rebuildFiles match {
      case Some(rb) => delegate = rb(files); true
      case None => false
    }
}

/** [[RuntimePrunableScan]] for scans that also report their key-grouped
  * (storage-partitioned-join) layout. The partitioning is a property of the
  * table layout, not of the surviving file set, so it is constant across
  * runtime re-plans; BatchScanExec tolerates filtered-out partition values
  * (it backfills empty partitions) but would reject a scan that stopped
  * reporting partitioning mid-plan. */
final class KeyedRuntimePrunableScan(attrs: Seq[String], schema: StructType,
    rebuild: Seq[Expression] => Scan, initial: Scan,
    partitioning: Partitioning,
    colStatsProvider: () => java.util.Map[NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
      () => java.util.Collections.emptyMap(),
    rebuildFiles: Option[Seq[String] => Scan] = None)
    extends RuntimePrunableScan(attrs, schema, rebuild, initial,
      colStatsProvider, rebuildFiles)
    with SupportsReportPartitioning {
  override def outputPartitioning(): Partitioning = partitioning
}

/** Scans whose WHERE was claimed FULLY pushed by the exact-decidability
  * path ([[GraftCatalog]] `pushFilters` returning empty): Spark drops the
  * Filter node, so the scan's output domain is the MATCHING subset, not the
  * table. The materialized-view / vector-index rewrite rules run after
  * pushdown and match bare `DataSourceV2ScanRelation`s — without this
  * registry they would read the scan as "the whole table" and serve an
  * UNFILTERED view for a filtered query (wrong results; found by the r13
  * advisor). `build()` registers the final scan object here and every
  * rewrite rule declines on a hit. Weak keys: entries die with their plans.
  * WeakHashMap keys on `equals`, which for parquet case-class scans can
  * only collide when file list + schema + pushed parquet filters all match
  * — and then the colliding scan reads the same rows, so a false positive
  * merely declines an optimization (never admits a wrong serve). */
object ExactPushedScans {
  private val scans = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Scan, Seq[Expression]]())
  def register(s: Scan, consumed: Seq[Expression]): Unit =
    scans.put(s, consumed)
  def contains(s: Scan): Boolean = scans.containsKey(s)
  /** The predicate the exact pushdown CONSUMED (no residual Filter node
    * remains) — catalyst expressions over the base schema, anchored by
    * column NAME. The view/index rewrites still decline outright (they
    * cannot re-apply a predicate to materialized rows); the hybrid
    * metadata-aggregate rule re-classifies files with it, so a fully
    * decidable WHERE keeps its GROUP BY metadata serve (r14). */
  def consumedOf(s: Scan): Option[Seq[Expression]] = Option(scans.get(s))
}

object RuntimePruning {
  /** An IN set past this size stops paying for itself: bucket derivation
    * hashes every value and stats pruning bounds-checks every (file, value)
    * pair on the driver, while selectivity (and so pruning yield)
    * collapses. Mirrors the spirit of Spark's own DPP benefit heuristics. */
  val MaxRuntimeInValues = 100000

  private[graft] def inValueCount(e: Expression): Int = {
    import org.apache.spark.sql.catalyst.expressions.{And, In, Or}
    e match {
      case In(_, vs) => vs.size
      case And(l, r) => inValueCount(l) + inValueCount(r)
      case Or(l, r) => inValueCount(l) + inValueCount(r)
      case _ => 1
    }
  }

  /** Fold any IN over a bare column whose value list would bust the
    * runtime budget into the enclosing [min, max] range — a strict
    * SUPERSET of the key set, so every pruning consumer stays
    * conservative (bounds checks admit at least the files the exact set
    * would; the join above re-checks rows exactly). NULL members drop
    * (an IN never matches on NULL), an all-NULL or unorderable list
    * degrades to an always-true literal (prunes nothing). */
  private[graft] def summarizeOversized(e: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThanOrEqual, In, LessThanOrEqual, Literal, Or}
    e match {
      case And(l, r) => And(summarizeOversized(l), summarizeOversized(r))
      case Or(l, r) => Or(summarizeOversized(l), summarizeOversized(r))
      case In(a: org.apache.spark.sql.catalyst.expressions.AttributeReference,
          vs) if vs.size > 1 && vs.forall(_.isInstanceOf[Literal]) =>
        val vals = vs.collect { case Literal(v, _) if v != null => v }
        val ord =
          try org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(a.dataType).asInstanceOf[Ordering[Any]]
          catch { case _: Exception => return Literal.TrueLiteral }
        if (vals.isEmpty) Literal.TrueLiteral
        else And(
          GreaterThanOrEqual(a, Literal(vals.min(ord), a.dataType)),
          LessThanOrEqual(a, Literal(vals.max(ord), a.dataType)))
      case other => other
    }
  }

  /** Last planned data-file count per table name — a test probe (specs
    * assert the post-runtime-filter re-plan touched fewer files), updated by
    * the scan builder on every (re-)plan. */
  val lastPlannedFiles = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
