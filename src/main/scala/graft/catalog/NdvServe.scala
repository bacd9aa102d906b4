package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** `approx_count_distinct` served from the analyze NDV sidecar (r16,
  * VERDICT r15 next #2): [[graft.store.TableStore.analyze]] already
  * maintains one global HLL sketch per column incrementally — the
  * sketch's whole reason to exist is answering the cardinality dashboard,
  * yet plain SQL `approx_count_distinct(col)` full-scanned. This rule
  * serves the estimate with ZERO data-file I/O, the Trino/Iceberg-stats
  * precedent: an approximate aggregate answered from approximate
  * statistics of the SAME family (both sides are HLL; the sidecar is
  * datasketches, exact below its set-mode threshold and within ~1.6%
  * rsd at the default lgK=12 above it).
  *
  * Soundness gates (all must hold, else the plan is untouched):
  *  - UNFILTERED, ungrouped aggregate whose every aggregate function is
  *    a non-DISTINCT, FILTER-free `approx_count_distinct(col, rsd)` over
  *    a bare column or a `COUNT(*)` (the mixed cardinality dashboard —
  *    the row total is exact from manifest metadata on both tiers); at
  *    least one HLL must be present, and any other aggregate declines
  *    (those serves belong to pushAggregation/HybridMetaAgg);
  *  - the requested rsd is NO TIGHTER than the sketch's own
  *    (1.04 / √2^lgK, read off the deserialized sketch itself) — a user
  *    who asked for better accuracy than the sidecar carries gets the
  *    scan they asked for;
  *  - the sidecar COVERS the scanned snapshot exactly: every live
  *    non-empty file carries the sidecar's generation marker and the
  *    marked count equals the sidecar's file count (files added since
  *    analyze are unmarked → decline; compaction rewrites change the
  *    count → decline) — the same coverage contract the analyze
  *    incremental merge enforces, checked here per query;
  *  - no delete vectors / equality masks (sketches describe RAW rows),
  *    no branch, no time travel (the sidecar reflects ONE snapshot).
  *
  * The serve is approximate-for-approximate: the result can differ from
  * Spark's own HLL++ estimate (different sketch family) but carries the
  * same accuracy contract the query's rsd declared. Kill switch:
  * `spark.graft.agg.metadata.ndv=false`. */
class NdvServeRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.agg.metadata.ndv", "true")
        .toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate =>
        try rewrite(agg).getOrElse(agg)
        catch { case e: Exception =>
          logWarning(s"NDV metadata serve declined on error: $e")
          agg
        }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    if (agg.groupingExpressions.nonEmpty) return None
    val (rel, residual, _) =
      AggViewRewrite.peelScan(agg.child) match {
        case Some(x) => x
        case None => return None
      }
    // strictly unfiltered: no residual predicate, no exact-pushed WHERE
    // (the sketch is global — any row pruning invalidates it)
    if (residual.nonEmpty) return None
    if (ExactPushedScans.contains(rel.scan)) return None
    val table = rel.relation.table match {
      case t: SnapshotTable => t
      case _ => return None
    }
    val store = table.graftStore
    if (store.branch.nonEmpty) return None
    val m = table.graftManifest
    if (m.hasDeletes) return None
    if (m.version != store.currentVersion()) return None // time travel
    val baseCols = m.schema.fieldNames.toSet

    // every aggregate: approx_count_distinct over a bare live column, or
    // COUNT(*) (r16: the mixed cardinality dashboard `SELECT COUNT(*),
    // approx_count_distinct(x)` — the row total is exact from manifest
    // metadata on both tiers, same gates pushAggregation uses); at least
    // one HLL must be present (a pure-count aggregate belongs to
    // pushAggregation, which serves more shapes)
    val aggExprs = scala.collection.mutable.ArrayBuffer.empty[AggregateExpression]
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression
          if !aggExprs.exists(_.semanticEquals(ae)) => aggExprs += ae
      case _ => ()
    })
    if (aggExprs.isEmpty) return None
    val targets: Seq[Option[(String, Double)]] = aggExprs.toSeq.map { ae =>
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case hll: HyperLogLogPlusPlus => hll.child match {
          case ar: AttributeReference
              if baseCols.contains(ar.name) &&
                !m.droppedCols.contains(ar.name) =>
            Some((ar.name, hll.relativeSD))
          case _ => return None
        }
        case org.apache.spark.sql.catalyst.expressions.aggregate
            .Count(Seq(org.apache.spark.sql.catalyst.expressions
            .Literal(_, _))) => None
        case _ => return None
      }
    }
    if (targets.forall(_.isEmpty)) return None
    // COUNT(*) needs an exact row total: inline per-file rows, or shard
    // totals (a summary with files > 0 but rows == 0 can only come from
    // the unknown-rows fallback — decline)
    lazy val totalRows: Option[Long] =
      if (!m.isSharded) {
        if (m.inlineFiles.forall(m.inlineStats.contains))
          Some(m.inlineFiles.map(m.inlineStats(_).rows).sum)
        else None
      } else if (m.shards.exists(r => r.files > 0 && r.rows == 0)) None
      else Some(m.shards.map(_.rows).sum)
    if (targets.exists(_.isEmpty) && totalRows.isEmpty) return None
    if (agg.aggregateExpressions.exists(_.find(e =>
      e.isInstanceOf[PlanExpression[_]]).isDefined)) return None

    // sidecar present, carries every target column's sketch
    val ndv = store.readNdvState().getOrElse(return None)
    val sketches: Map[String, org.apache.datasketches.hll.HllSketch] =
      targets.flatten.map(_._1).distinct.map { n =>
        val b64 = ndv.cols.getOrElse(n, return None)
        n -> org.apache.datasketches.hll.HllSketch.heapify(
          java.util.Base64.getDecoder.decode(b64))
      }.toMap
    // rsd compatibility: the sketch's relative standard error is
    // 1.04 / sqrt(2^lgK) — serve only when the query accepted at least
    // that much error
    if (targets.flatten.exists { case (n, rsd) =>
      rsd < 1.04 / math.sqrt(math.pow(2, sketches(n).getLgConfigK))
    }) return None
    // coverage: every live non-empty file is marked with the sidecar's
    // generation and the marked count equals its file count — one
    // metadata pass (driver-side inline; distributed on the sharded tier)
    if (!ndvCovers(store, m, ndv)) return None

    val estimates: Map[String, Long] =
      sketches.map { case (n, sk) => n -> math.round(sk.getEstimate) }
    val outNames = targets.indices.map(i => s"_g_ndv_$i")
    val outAttrs = outNames.map(n => AttributeReference(n, LongType,
      nullable = false)())
    val row = InternalRow.fromSeq(targets.map {
      case Some((n, _)) => estimates(n)
      case None => totalRows.get // gated non-empty above
    })
    val local = LocalRelation(outAttrs, Seq(row))
    // splice with the original output exprIds
    val outCols = agg.aggregateExpressions.map { ne =>
      var ok = true
      val t = ne.transformDown {
        case ae: AggregateExpression =>
          aggExprs.indexWhere(_.semanticEquals(ae)) match {
            case -1 => ok = false; ae
            case i => outAttrs(i)
          }
      }
      if (!ok || t.find(e => e.isInstanceOf[AttributeReference] &&
          !outAttrs.contains(e)).isDefined) return None
      t
    }
    logInfo(s"approx_count_distinct served from the NDV sidecar over " +
      s"${store.root}: ${targets.flatten.map(_._1).distinct.mkString(",")}")
    Some(org.apache.spark.sql.catalyst.plans.logical.Project(
      agg.output.zip(outCols).map { case (o, n) =>
        Alias(n.asInstanceOf[Expression], o.name)(exprId = o.exprId,
          qualifier = o.qualifier, explicitMetadata = Some(o.metadata))
      }, local))
  }

  /** Does the sidecar's coverage contract hold for manifest `m`? Every
    * non-empty live file marked with generation `st.gen`, and exactly
    * `st.files` of them (unmarked/foreign-generation files mean rows the
    * sketch never saw or double-counts). */
  private def ndvCovers(store: graft.store.TableStore,
      m: graft.store.TableStore.Manifest,
      st: graft.store.TableStore.NdvState): Boolean = {
    val marker = graft.store.TableStore.NdvMarker
    if (!m.isSharded) {
      var marked = 0L
      m.inlineFiles.foreach { f =>
        val s = m.inlineStats.getOrElse(f, return false)
        if (s.rows > 0L) {
          if (!s.cols.get(marker).exists(_.nulls == st.gen)) return false
          marked += 1
        }
      }
      marked == st.files
    } else {
      val sp = store.spark
      import sp.implicits._
      val g = st.gen
      val mk = marker
      val counts = graft.store.ManifestShards
        .read(sp, m.shards.map(_.path)).mapPartitions { it =>
          var marked = 0L; var uncovered = 0L
          it.foreach { fm =>
            if (fm.rows > 0L) {
              val cs = graft.store.FileStats.colsFromJson(fm.stats)
              if (cs.get(mk).exists(_.nulls == g)) marked += 1
              else uncovered += 1
            }
          }
          Iterator.single((marked, uncovered))
        }.collect()
      counts.map(_._2).sum == 0L && counts.map(_._1).sum == st.files
    }
  }
}

object NdvServe {
  /** Test probe: did the plan take the sidecar serve? */
  def served(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case l: LocalRelation => l.output.exists(_.name.startsWith("_g_ndv_"))
      case _ => false
    }
}
