package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{count => fcount, lit, max => fmax, min => fmin, sum => fsum}
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.LongType

import graft.store.FileStats

/** HYBRID metadata-served filtered aggregates (VERDICT r13 next #2).
  *
  * `SELECT COUNT(*)/COUNT(c)/MIN(c)/MAX(c) FROM t WHERE <pred>` answers
  * with ZERO data-file I/O when every candidate file is provably all-match
  * (the scan builder's exact pushdown + [[graft.catalog.GraftCatalog]]
  * `pushAggregation`). That serve was ALL-OR-NOTHING: one file straddling
  * the predicate dropped the whole query to a full residual scan — and an
  * arbitrary range on a real data layout almost always straddles one file.
  *
  * This rule is the standard engine hybrid: footer stats answer the
  * all-match files, a scan reads ONLY the straddlers (with the predicate
  * re-applied exactly, row by row), and a two-level merge combines them —
  * COUNT as a sum of partial counts, MIN/MAX over partial extrema. At
  * 100 TB a range predicate straddles O(1) boundary files per sorted run,
  * so the scan side is a handful of files where the all-or-nothing path
  * read millions.
  *
  * Soundness gates (all must hold, else the plan is untouched):
  *  - global aggregate (no GROUP BY), every aggregate one of
  *    COUNT(*)/COUNT(col) (non-DISTINCT, no FILTER clause)/MIN/MAX over a
  *    bare column whose type orders exactly in footer bounds
  *    ([[FileStats.minMaxExact]] — strings/floats refuse), or (r14)
  *    SUM over a [[FileStats.sumExact]] column whose all-match files all
  *    carry ANALYZED sums ([[graft.store.TableStore.analyze]]);
  *  - the child peels to a main-store DSv2 graft snapshot scan through
  *    deterministic subquery-free Filters/Projects only
  *    ([[AggViewRewrite.peelScan]], which also screens out scans whose
  *    WHERE was consumed by exact pushdown — those are already fully
  *    metadata-served);
  *  - no delete vectors (footer stats count masked rows);
  *  - file classification is CONSERVATIVE: a file whose stats cannot
  *    prove all-match ([[FileStats.mustMatch]] refuses strings, floats,
  *    null-tainted predicates, …) or that lacks a needed bound is simply
  *    scanned — never served from stats.
  *
  * The classification is driver-side free on the inline tier and ONE
  * distributed metadata sweep on the sharded tier
  * ([[graft.store.TableStore.hybridMatchMeta]] — the same sweep the scan
  * builder runs for exact pushdown, whose per-file verdicts a straddler
  * used to discard). All-match empty (nothing provable) declines — the
  * ordinary scan is already the right plan. Kill switch:
  * `spark.graft.agg.metadata.hybrid=false`. */
class HybridMetaAggRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.agg.metadata.hybrid", "true")
        .toBoolean) return plan
    plan.transformUp {
      case agg: Aggregate if agg.groupingExpressions.isEmpty =>
        try rewrite(agg).getOrElse(agg)
        catch { case e: Exception =>
          logWarning(s"hybrid metadata aggregate declined on error: $e")
          agg
        }
    }
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (rel, conds, _) = AggViewRewrite.peelScan(agg.child) match {
      case Some(x) => x
      case None => return None
    }
    // unfiltered (or exactly-decidable, already consumed) aggregates are
    // pushAggregation's zero-I/O serve — nothing to hybridize
    if (conds.isEmpty) return None
    val table = rel.relation.table match {
      case t: SnapshotTable => t
      case _ => return None
    }
    val store = table.graftStore
    if (store.branch.nonEmpty) return None
    val m = table.graftManifest
    if (m.hasDeletes) return None
    val baseCols = m.schema.fieldNames.toSet
    if (!rel.scan.readSchema().fieldNames.forall(baseCols)) return None
    // conditions must re-anchor by NAME onto the straddler read
    if (!conds.forall(_.references.forall(r =>
      rel.output.exists(_.exprId == r.exprId)))) return None

    // ---- aggregate coverage --------------------------------------------
    val aggExprs = scala.collection.mutable.ArrayBuffer.empty[AggregateExpression]
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression
          if !aggExprs.exists(_.semanticEquals(ae)) => aggExprs += ae
      case _ => ()
    })
    if (aggExprs.isEmpty) return None
    // ('count | 'min | 'max | 'sum, column name or "" for COUNT(*))
    val kinds: Seq[(Char, String)] = aggExprs.toSeq.map { ae =>
      if (ae.isDistinct || ae.filter.nonEmpty) return None
      ae.aggregateFunction match {
        case Count(Seq(Literal(_, _))) => ('c', "")
        case Count(Seq(ar: AttributeReference))
            if baseCols.contains(ar.name) => ('c', ar.name)
        case Min(ar: AttributeReference)
            if baseCols.contains(ar.name) &&
              FileStats.minMaxExact(ar.dataType) => ('n', ar.name)
        case Max(ar: AttributeReference)
            if baseCols.contains(ar.name) &&
              FileStats.minMaxExact(ar.dataType) => ('x', ar.name)
        // SUM (r14): served from per-file ANALYZED sums for the all-match
        // files ([[graft.store.TableStore.analyze]]); any evalMode is
        // sound — an unfitting stats-side partial declines below, so
        // overflow semantics stay the scan's own
        case s: Sum if s.child.isInstanceOf[AttributeReference] && {
          val ar = s.child.asInstanceOf[AttributeReference]
          baseCols.contains(ar.name) && FileStats.sumExact(ar.dataType)
        } => ('s', s.child.asInstanceOf[AttributeReference].name)
        case _ => return None
      }
    }
    // outputs must hang entirely off the covered aggregates (no bare base
    // attributes survive a global aggregate anyway; subqueries decline)
    if (agg.aggregateExpressions.exists(_.find(e =>
      e.isInstanceOf[PlanExpression[_]]).isDefined)) return None

    // cheap shape gate: a predicate [[FileStats.mustMatch]] can never
    // prove (string/float columns, arithmetic like `k % 10 = 3`, UDFs)
    // makes EVERY file straddle — decline before paying the sharded
    // classification sweep. Sound either way: the sweep would just come
    // back all-straddle.
    def provable(e: Expression): Boolean = {
      import org.apache.spark.sql.catalyst.expressions._
      e match {
        case And(l, r) => provable(l) && provable(r)
        case Or(l, r) => provable(l) && provable(r)
        case b: BinaryComparison => (b.left, b.right) match {
          case (ar: AttributeReference, v) if v.foldable =>
            FileStats.minMaxExact(ar.dataType)
          case (v, ar: AttributeReference) if v.foldable =>
            FileStats.minMaxExact(ar.dataType)
          case _ => false
        }
        case In(ar: AttributeReference, vs) if vs.forall(_.foldable) =>
          FileStats.minMaxExact(ar.dataType)
        case IsNull(_: AttributeReference) => true
        case IsNotNull(_: AttributeReference) => true
        case _ => false
      }
    }
    if (!conds.forall(provable)) return None

    // ---- three-way file classification ---------------------------------
    val exactCap = store.spark.conf
      .getOption("spark.graft.exact.maxFiles").map(_.toLong)
      .getOrElse(200000L)
    val (allMatch0, straddle0):
        (Seq[(String, Long, Map[String, FileStats.ColStat])], Seq[String]) =
      if (!m.isSharded) {
        val am = Seq.newBuilder[(String, Long, Map[String, FileStats.ColStat])]
        val st = Seq.newBuilder[String]
        m.inlineFiles.foreach { f =>
          m.inlineStats.get(f).map(m.usableStat) match {
            case Some(s) if !FileStats.mightMatch(s, m.schema, conds) => ()
            case Some(s) if FileStats.mustMatch(s, m.schema, conds) =>
              am += ((f, s.rows, s.cols))
            case _ => st += f
          }
        }
        (am.result(), st.result())
      } else {
        if (m.nFiles > exactCap) return None
        store.hybridMatchMeta(m, conds)
      }
    if (allMatch0.isEmpty) return None // nothing provable: scan is right

    // a kept file missing a needed bound moves to the scan side — stats
    // only ever serve what they can prove
    def statsServable(meta: (String, Long, Map[String, FileStats.ColStat]))
        : Boolean = kinds.forall {
      case ('c', "") => true
      case ('c', n) => meta._3.contains(n)
      case ('n', n) =>
        meta._3.get(n).exists(c => c.min.isDefined || c.nulls == meta._2)
      case ('x', n) =>
        meta._3.get(n).exists(c => c.max.isDefined || c.nulls == meta._2)
      case ('s', n) =>
        meta._3.get(n).exists(c => c.sum.isDefined || c.nulls == meta._2)
      case _ => false
    }
    val (statFiles, moved) = allMatch0.partition(statsServable)
    if (statFiles.isEmpty) return None
    val scanFiles = (straddle0 ++ moved.map(_._1)).sorted

    // ---- stats-side partial row ----------------------------------------
    // partial column type per kind: counts are LONG; sums accumulate in
    // the exact domain (LONG for integrals — an unfitting stats-side
    // partial declines below; DECIMAL(38, s) for decimals) and cast to
    // the query's SUM result type at the merge; min/max ride the column
    // type itself
    def partialType(k: Char, n: String): org.apache.spark.sql.types.DataType =
      k match {
        case 'c' => LongType
        case 's' => m.schema(n).dataType match {
          case d: org.apache.spark.sql.types.DecimalType =>
            org.apache.spark.sql.types.DecimalType(38, d.scale)
          case _ => LongType
        }
        case _ => m.schema(n).dataType
      }
    val partialNames = kinds.indices.map(i => s"_g_pc_$i")
    val partialVals: Seq[Any] = kinds.map {
      case ('c', "") => statFiles.map(_._2).sum
      case ('c', n) =>
        statFiles.map(f => f._2 - f._3(n).nulls).sum
      case ('s', n) =>
        val sums = statFiles.flatMap(_._3(n).sum).map(BigDecimal(_))
        if (sums.isEmpty) null
        else {
          val total = sums.foldLeft(BigDecimal(0))(_ + _)
          partialType('s', n) match {
            case LongType =>
              if (total.isValidLong) java.lang.Long.valueOf(total.toLong)
              else return None // can't carry the partial exactly: decline
            case d: org.apache.spark.sql.types.DecimalType =>
              val dec = org.apache.spark.sql.types.Decimal(total)
              if (dec.changePrecision(d.precision, d.scale)) dec
              else return None
            case _ => return None
          }
        }
      case (k, n) =>
        val dt = m.schema(n).dataType
        val bs = statFiles.flatMap(f =>
          (if (k == 'n') f._3(n).min else f._3(n).max)
            .map(FileStats.parseBound(_, dt)))
        if (bs.isEmpty) null
        else if (k == 'n') bs.minBy(v => BigDecimal(v.toString))
        else bs.maxBy(v => BigDecimal(v.toString))
    }
    val partialAttrs = kinds.zip(partialNames).map { case ((k, n), pn) =>
      AttributeReference(pn, partialType(k, n))()
    }
    val statsDF = DatasetBridge.ofRows(store.spark, LocalRelation(
      partialAttrs, Seq(InternalRow.fromSeq(partialVals))))

    // ---- scan-side partial row (straddlers only, predicate exact) ------
    val merged =
      if (scanFiles.isEmpty) statsDF
      else {
        val cond = ColumnBridge.column(conds.reduce(
          org.apache.spark.sql.catalyst.expressions.And).transformUp {
            case ar: AttributeReference => UnresolvedAttribute.quoted(ar.name)
          })
        def byName(n: String) =
          ColumnBridge.column(UnresolvedAttribute.quoted(n))
        val partials = kinds.zip(partialNames).map {
          case (('c', ""), pn) => fcount(lit(1)).as(pn)
          case (('c', n), pn) => fcount(byName(n)).as(pn)
          case (('n', n), pn) => fmin(byName(n)).as(pn)
          case (('s', n), pn) =>
            // cast BEFORE summing so the straddler partial lands in the
            // same exact domain as the stats-side partial column
            fsum(byName(n).cast(partialType('s', n))).cast(partialType('s', n))
              .as(pn)
          case ((_, n), pn) => fmax(byName(n)).as(pn)
        }
        store.readFiles(m, scanFiles).filter(cond)
          .agg(partials.head, partials.tail: _*)
          .union(statsDF)
      }
    val mergeCols = kinds.zip(partialNames).zipWithIndex.map {
      case ((('c', _), pn), i) =>
        fsum(ColumnBridge.column(UnresolvedAttribute.quoted(pn)))
          .as(s"_g_out_$i")
      case ((('n', _), pn), i) =>
        fmin(ColumnBridge.column(UnresolvedAttribute.quoted(pn)))
          .as(s"_g_out_$i")
      case ((('s', n), pn), i) =>
        // merged exact partials cast to the query's SUM result type —
        // a total that does not fit lands exactly where the scan's own
        // sum would (NULL / ANSI error), never a silently-wrong value
        fsum(ColumnBridge.column(UnresolvedAttribute.quoted(pn)))
          .cast(FileStats.sumResultType(m.schema(n).dataType))
          .as(s"_g_out_$i")
      case (((_, _), pn), i) =>
        fmax(ColumnBridge.column(UnresolvedAttribute.quoted(pn)))
          .as(s"_g_out_$i")
    }
    val mergedAgg = merged.agg(mergeCols.head, mergeCols.tail: _*)

    // ---- splice with the original output exprIds -----------------------
    val outCols = agg.aggregateExpressions.map { ne =>
      var ok = true
      val t = (ne match {
        case Alias(c, _) => c
        case o => o
      }).transformUp {
        case ae: AggregateExpression =>
          aggExprs.indexWhere(_.semanticEquals(ae)) match {
            case -1 => ok = false; ae
            case i => UnresolvedAttribute.quoted(s"_g_out_$i")
          }
      }
      if (!ok || t.find(e => e.isInstanceOf[AttributeReference] ||
          e.isInstanceOf[AggregateExpression]).isDefined) return None
      ColumnBridge.column(t).as(ne.name)
    }
    val repPlan = mergedAgg.select(outCols: _*).queryExecution.optimizedPlan
    if (repPlan.output.size != agg.output.size ||
      repPlan.output.zip(agg.output).exists {
        case (n, o) => n.dataType != o.dataType
      }) return None
    logInfo(s"hybrid metadata aggregate over ${store.root}: " +
      s"${statFiles.size} files from stats, ${scanFiles.size} scanned")
    Some(org.apache.spark.sql.catalyst.plans.logical.Project(
      agg.output.zip(repPlan.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
          explicitMetadata = Some(o.metadata))
      }, repPlan))
  }
}

object HybridMetaAgg {
  /** Test probe: did the plan take the hybrid serve (a union of a
    * straddler-only scan with a stats LocalRelation)? Recognized by the
    * single-row local partial relation's column naming. */
  def served(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.exists {
      case l: LocalRelation => l.output.exists(_.name.startsWith("_g_pc_"))
      case _ => false
    }
}
