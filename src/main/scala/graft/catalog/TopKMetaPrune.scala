package graft.catalog

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{DataType, StringType}

/** The pushTopN bound walk over per-file stats, shared by the scan
  * builder's `pushTopN` and the logical top-k × decidable-WHERE
  * composition rule (r17, VERDICT r16 next #7). Entries are (path, rows,
  * stat-of-leading-sort-column); every entry's rows must all be CANDIDATE
  * rows — all-match under any WHERE in play (the callers' contract) —
  * because the walk counts them as top-n guarantees. Returns the kept
  * paths when the walk PROVES the global top-`limit` rows live in a
  * STRICT subset; None when nothing is provable or nothing is pruned. */
private[catalog] object TopKFileWalk {

  def keep(entries: Seq[(String, Long, Option[graft.store.FileStats.ColStat])],
      dt: DataType, desc: Boolean, nullsTop: Boolean, limit: Int)
      : Option[Seq[String]] = {
    // key ordering oriented so SMALLER = closer to the top whatever the
    // direction: numerics through BigDecimal, strings bytewise
    val ord: Ordering[Any] = {
      val base: Ordering[Any] = dt match {
        case StringType => new Ordering[Any] {
          def compare(a: Any, b: Any): Int =
            a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
              .compareTo(
                b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
        }
        case _ => Ordering.by((v: Any) => v.asInstanceOf[BigDecimal])
      }
      if (desc) base.reverse else base
    }
    // (path, rows, nulls, bestKey, worstKey): undefined = unusable
    // bounds, file always kept and contributing no guarantee
    final case class FB(path: String, rows: Long, nulls: Long,
      best: Option[Any], worst: Option[Any],
      allNull: Boolean)
    def fb(path: String, rows: Long,
        cs: Option[graft.store.FileStats.ColStat]): FB = cs match {
      case Some(c) =>
        def key(s: String): Any = dt match {
          case StringType =>
            graft.store.FileStats.parseBound(s, dt) // UTF8String
          case _ => BigDecimal(
            graft.store.FileStats.parseBound(s, dt).toString)
        }
        (c.min.map(key), c.max.map(key)) match {
          case (Some(a), Some(b)) =>
            FB(path, rows, c.nulls, Some(ord.min(a, b)), Some(ord.max(a, b)),
              allNull = false)
          case _ => FB(path, rows, c.nulls, None, None,
            allNull = c.nulls == rows && rows > 0)
        }
      case None => FB(path, rows, 0L, None, None, allNull = false)
    }
    val fbs = entries.map { case (p, r, cs) => fb(p, r, cs) }
    // rows guaranteed at-or-above the top: nulls (when they sort first,
    // from any kept file) plus non-null rows of files wholly ≤ t
    val nullGuarantee = if (nullsTop) fbs.map(_.nulls).sum else 0L
    var acc = nullGuarantee
    var t: Option[Any] = None
    if (acc < limit) {
      val it = fbs.filter(_.worst.isDefined).sortBy(_.worst.get)(ord).iterator
      while (t.isEmpty && it.hasNext) {
        val f = it.next()
        acc += f.rows - f.nulls
        if (acc >= limit) t = Some(f.worst.get)
      }
      if (t.isEmpty) return None // table can't guarantee n rows: no win
    }
    val kept = fbs.filter(f =>
      (nullsTop && f.nulls > 0) ||
      // a provably ALL-NULL file matters only when nulls sort first
      (f.best.isEmpty && !(f.allNull && !nullsTop)) ||
      f.best.exists(b => t.exists(ord.lteq(b, _)))).map(_.path)
    if (kept.size >= fbs.size) None // nothing pruned
    else Some(kept)
  }
}

/** Top-k × decidable-WHERE composition (r17, VERDICT r16 next #7):
  * `SELECT … WHERE E(col) = lit ORDER BY k LIMIT n` on a period-chunked
  * layout should plan the ONE chunk that can hold the top rows — but the
  * WHERE is an expression V1 filter pushdown cannot carry, so a residual
  * Filter sits between the Sort and the scan and Spark never calls the
  * builder's `pushTopN`. This rule closes the gap at the logical layer:
  * when EVERY file is decidable under the Filter (all-match or no-match —
  * the same per-file `mightMatch`/`mustMatch` verdicts the exact filter
  * pushdown uses, periodic chains included via
  * [[graft.store.ExprBounds]]), the Filter is row-redundant over the kept
  * subset, so the rule
  *
  *  1. runs the [[TopKFileWalk]] over the kept files' leading-sort-key
  *     bounds (exactly the builder's pushTopN walk),
  *  2. re-plans the scan to the walked subset through the same replan
  *     hook the runtime-filter path uses, and
  *  3. REMOVES the Filter node (sound: every surviving row provably
  *     matches), leaving `Limit(Sort(scan))` for Spark's TakeOrdered.
  *
  * Declines (plan untouched, ordinary scan): masked snapshots, a
  * non-attribute leading sort key, a partition-column sort key, files
  * above the exact cap, any undecidable file, bucket-key equality
  * conjuncts (hash-bucketed bounds never all-match — the bucket-pruned
  * path serves those), or a walk that prunes nothing. Sharded tiers run
  * the decidability sweep as the ONE distributed `exactMatchMeta` job.
  * Kill switch: `spark.graft.topk.metadata=false`. */
class TopKMetaPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.topk.metadata", "true").toBoolean)
      return plan
    plan.transformUp {
      case l @ Limit(le @ IntegerLiteral(n),
          sort @ Sort(orders, true, child, _)) if n > 0 && orders.nonEmpty =>
        try rewrite(n, orders, child) match {
          case Some(newChild) =>
            GlobalLimit(le, LocalLimit(le, sort.copy(child = newChild)))
          case None => l
        } catch { case e: Exception =>
          logWarning(s"topk metadata prune declined on error: $e")
          l
        }
    }
  }

  /** The Filter-dropped child when the composition applies. */
  private def rewrite(n: Int, orders: Seq[SortOrder], child: LogicalPlan)
      : Option[LogicalPlan] = {
    // peel an optional pure-column Project between Sort and Filter (the
    // usual shape: the WHERE column is pruned away above the Filter)
    val (rebuildChild, cond, rel)
        : (LogicalPlan => LogicalPlan, Expression, DataSourceV2ScanRelation) =
      child match {
        case f @ Filter(c, r: DataSourceV2ScanRelation) =>
          (nc => nc, c, r)
        case p @ Project(pl, f @ Filter(c, r: DataSourceV2ScanRelation))
            if pl.forall(_.isInstanceOf[AttributeReference]) =>
          (nc => p.copy(child = nc), c, r)
        case _ => return None
      }
    val table = rel.relation.table match {
      case t: SnapshotTable => t
      case _ => return None
    }
    val store = table.graftStore
    val m = table.graftManifest
    if (m.hasDeletes) return None
    // leading sort key: a bare live column of an exactly-ordered (or
    // string) type, not a partition column — pushTopN's own gates
    val sortAttr = orders.head.child match {
      case ar: AttributeReference => ar
      case _ => return None
    }
    val colName = rel.output.find(_.exprId == sortAttr.exprId)
      .map(_.name).getOrElse(return None)
    if (m.partitionBy.contains(colName)) return None
    val dt = m.schema.fields.find(_.name == colName)
      .map(_.dataType).getOrElse(return None)
    if (!graft.store.FileStats.minMaxExact(dt) && dt != StringType)
      return None
    val desc = orders.head.direction == Descending
    val nullsTop = orders.head.nullOrdering == NullsFirst
    // anchor the condition's attributes by NAME against the base schema
    // (the verdicts key on names); any non-relation reference declines
    val conjuncts = splitAnd(cond).map { c =>
      var ok = true
      val t = c.transformUp {
        case ar: AttributeReference =>
          rel.output.find(_.exprId == ar.exprId) match {
            case Some(o) if m.schema.fieldNames.contains(o.name) =>
              AttributeReference(o.name, m.schema(o.name).dataType,
                m.schema(o.name).nullable)()
            case _ => ok = false; ar
          }
      }
      if (!ok || t.exists(_.isInstanceOf[PlanExpression[_]])) return None
      t
    }
    val exactCap = store.spark.conf
      .getOption("spark.graft.exact.maxFiles").map(_.toLong)
      .getOrElse(200000L)
    // per-file decidability → the kept (all-match) entries with the sort
    // column's stats; any undecidable file declines the whole rewrite
    val entries: Seq[(String, Long, Option[graft.store.FileStats.ColStat])] =
      if (!m.isSharded) {
        if (!m.inlineFiles.forall(m.inlineStats.contains)) return None
        val out = Seq.newBuilder[
          (String, Long, Option[graft.store.FileStats.ColStat])]
        m.inlineFiles.foreach { f =>
          val st = m.usableStat(m.inlineStats(f))
          if (graft.store.FileStats.mightMatch(st, m.schema, conjuncts)) {
            if (!graft.store.FileStats.mustMatch(st, m.schema, conjuncts))
              return None
            out += ((f, st.rows, st.cols.get(colName)))
          }
        }
        out.result()
      } else {
        if (m.nFiles > exactCap) return None
        if (graft.store.TableStore.keyEqualityBuckets(conjuncts, m)
            .nonEmpty) return None
        store.exactMatchMeta(m, conjuncts) match {
          case scala.Right(metas) =>
            metas.map { case (p, r, cols) => (p, r, cols.get(colName)) }
          case scala.Left(_) => return None
        }
      }
    val kept = TopKFileWalk.keep(entries, dt, desc, nullsTop, n)
      .getOrElse(return None)
    // re-plan the scan to exactly the walked subset (the runtime-filter
    // replan machinery, file-list-targeted), then drop the Filter
    rel.scan match {
      case rp: RuntimePrunableScan if rp.pruneToFiles(kept) =>
        logInfo(s"top-$n under a decidable WHERE planned ${kept.size} of " +
          s"${entries.size} all-match files over ${store.root}")
        Some(rebuildChild(rel))
      case _ => None
    }
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}
