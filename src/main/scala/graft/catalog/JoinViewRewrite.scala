package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, ExprId, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.store.{MaterializedJoin, TableStore}

/** Transparent JOIN-VIEW REWRITE: a user's `fact JOIN dim ON l.k = r.k`
  * over the catalog tables answers from a fresh [[MaterializedJoin]]
  * materialization with the query text unchanged — the denormalized read
  * path without anyone asking for it. Runs next to
  * [[AggViewRewriteRule]] in `spark.experimental.extraOptimizations`.
  *
  * Soundness gates:
  *  - both sides peel to graft snapshot scans (main stores, no pushed
  *    aggregates), and a registered view connects EXACTLY these two
  *    stores at EXACTLY the two scanned snapshot versions (stale views
  *    never answer);
  *  - the equality conjuncts of the join condition are exactly the view's
  *    key pairing; EXTRA conjuncts survive only where they commute to a
  *    post-view filter (INNER and — with a keyed dim, where a fact row
  *    has at most one match — LEFT SEMI; never LEFT OUTER, where an extra
  *    conjunct changes matching, not filtering);
  *  - every referenced dim column is projected into the view; a dim JOIN
  *    KEY reference maps to the fact's join column (equal under INNER /
  *    SEMI; declined under LEFT OUTER, where the dim key is NULL for
  *    unmatched rows but the fact key is not);
  *  - fact-side filters commute always; dim-side filters commute under
  *    INNER/SEMI only;
  *  - INNER and LEFT SEMI are served by an `inner` view, LEFT OUTER by a
  *    `left` view (an inner view has already dropped the unmatched rows).
  *
  * The spliced subtree restores the Join's output exprIds, so the plan
  * above is untouched; any surprise declines, never fails. Shares the
  * `spark.graft.agg.rewrite` kill switch (one flag disarms the whole
  * transparent-view layer). */
class JoinViewRewriteRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.agg.rewrite", "true").toBoolean)
      return plan
    plan.transformUp {
      // a Project above the join narrows what must map: the join node's
      // own output always carries BOTH sides' columns (the dim key
      // survives for the condition even when unselected), which under
      // LEFT OUTER can be unmappable while the selected columns map fine
      case p @ Project(list, j: Join) =>
        dbg(s"considering ${j.joinType} join (projected)")
        try rewrite(j, list, p.output).getOrElse(p)
        catch { case e: Exception =>
          logWarning(s"join-view rewrite declined on error: $e"); p
        }
      case j: Join =>
        dbg(s"considering ${j.joinType} join")
        try rewrite(j, j.output, j.output).getOrElse(j)
        catch { case e: Exception =>
          logWarning(s"join-view rewrite declined on error: $e"); j
        }
    }
  }

  private def dbg(msg: => String): Unit =
    if (conf.getConfString("spark.graft.agg.rewrite.debug", "false")
        .toBoolean)
      logWarning(s"[join-rewrite] $msg")

  /** `targets` are the expressions the replacement must emit (the Join's
    * raw output, or the projection directly above it); `origOutput` the
    * attributes whose exprIds the splice restores. */
  private def rewrite(j: Join, targets: Seq[NamedExpression],
      origOutput: Seq[Attribute]): Option[LogicalPlan] = {
    if (j.condition.isEmpty) return None
    val semi = j.joinType == LeftSemi
    val outer = j.joinType == LeftOuter
    if (!(j.joinType == Inner || semi || outer)) return None
    val (lRel, lConds, lSubst) = AggViewRewrite.peelScan(j.left) match {
      case Some(x) => x
      case None => dbg(s"left side does not peel: ${j.left.nodeName}")
        return None
    }
    val (rRel, rConds, rSubst) = AggViewRewrite.peelScan(j.right) match {
      case Some(x) => x
      case None => dbg(s"right side does not peel: ${j.right.nodeName}")
        return None
    }
    val (lTable, rTable) = (lRel.relation.table, rRel.relation.table) match {
      case (a: SnapshotTable, b: SnapshotTable) => (a, b)
      case other => dbg(s"not snapshot tables: $other"); return None
    }
    val lStore = lTable.graftStore; val rStore = rTable.graftStore
    if (lStore.branch.nonEmpty || rStore.branch.nonEmpty) {
      dbg("branch store"); return None
    }
    val lm = lTable.graftManifest; val rm = rTable.graftManifest
    if (!lRel.scan.readSchema().fieldNames
        .forall(lm.schema.fieldNames.toSet)) {
      dbg(s"left readSchema outside base: ${lRel.scan.readSchema()}")
      return None
    }
    if (!rRel.scan.readSchema().fieldNames
        .forall(rm.schema.fieldNames.toSet)) {
      dbg(s"right readSchema outside base: ${rRel.scan.readSchema()}")
      return None
    }

    // the join condition with BOTH sides' peeled projects inlined (so a
    // conjunct over a hoisted alias lands back on scan attributes), split
    // into conjuncts
    val subst = lSubst ++ rSubst
    def expand(e: Expression): Expression = e.transformUp {
      case ar: AttributeReference => subst.getOrElse(ar.exprId, ar)
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val lIds: Set[ExprId] =
      (lRel.output ++ j.left.output).map(_.exprId).toSet
    val rIds: Set[ExprId] =
      (rRel.output ++ j.right.output).map(_.exprId).toSet
    def sideOf(a: AttributeReference): Option[Boolean] = // true = left
      if (lIds(a.exprId)) Some(true)
      else if (rIds(a.exprId)) Some(false) else None
    val cs = conjuncts(expand(j.condition.get))
    // key-equality conjuncts as (leftName, rightName); the rest are extras
    val keyPairs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val extras = scala.collection.mutable.ArrayBuffer.empty[Expression]
    cs.foreach {
      case eq @ EqualTo(a: AttributeReference, b: AttributeReference) =>
        (sideOf(a), sideOf(b)) match {
          case (Some(true), Some(false)) => keyPairs += ((a.name, b.name))
          case (Some(false), Some(true)) => keyPairs += ((b.name, a.name))
          case _ => extras += eq
        }
      case other => extras += other
    }
    if (extras.exists(e => !e.deterministic ||
        e.find(_.isInstanceOf[PlanExpression[_]]).isDefined)) {
      dbg(s"nondeterministic/subquery extras: $extras"); return None
    }
    if (outer && (extras.nonEmpty || rConds.nonEmpty)) {
      dbg(s"left-outer with extras=$extras rConds=$rConds"); return None
    }

    val res = conf.resolver
    val wantType = if (outer) "left" else "inner"
    val candidates = MaterializedJoin.viewMetas(lStore).filter { vm =>
      vm.rRoot == rStore.root && vm.joinType == wantType &&
      vm.lVersion == lm.version && vm.rVersion == rm.version &&
      keyPairs.size == vm.lKeys.size &&
      vm.lKeys.zip(vm.rKeys).forall { case (lk, rk) =>
        keyPairs.exists(p => res(p._1, lk) && res(p._2, rk))
      }
    }

    if (candidates.isEmpty)
      dbg(s"no candidate view: keyPairs=$keyPairs want=$wantType " +
        s"lv=${lm.version} rv=${rm.version} views=" +
        MaterializedJoin.viewMetas(lStore))
    candidates.view.flatMap(vm =>
      rewriteWith(targets, origOutput, vm, lStore, lConds, rConds,
        extras.toSeq, lm.schema.fieldNames.toSeq, lIds, rIds, semi,
        outer)).headOption
  }

  private def rewriteWith(targets: Seq[NamedExpression],
      origOutput: Seq[Attribute], vm: MaterializedJoin.ViewMeta,
      lStore: TableStore, lConds: Seq[Expression], rConds: Seq[Expression],
      extras: Seq[Expression], lCols: Seq[String], lIds: Set[ExprId],
      rIds: Set[ExprId], semi: Boolean,
      outer: Boolean): Option[LogicalPlan] = {
    val res = conf.resolver
    // map any referenced attribute to a VIEW column name: fact columns
    // keep their names; projected dim columns too; a dim JOIN KEY maps to
    // the fact's join column under INNER/SEMI (value-equal) and declines
    // under LEFT OUTER (NULL for unmatched rows on the dim side only)
    def viewName(a: AttributeReference): Option[String] =
      if (lIds(a.exprId)) lCols.find(res(_, a.name))
      else if (rIds(a.exprId))
        vm.rCols.find(res(_, a.name)).orElse {
          vm.rKeys.zipWithIndex.collectFirst {
            case (rk, i) if res(rk, a.name) && !outer => vm.lKeys(i)
          }
        }
      else None
    def toView(e: Expression): Option[Expression] = {
      var ok = true
      val t = e.transformUp { case a: AttributeReference =>
        viewName(a) match {
          case Some(n) => UnresolvedAttribute.quoted(n)
          case None => ok = false; a
        }
      }
      if (ok) Some(t) else None
    }
    val allConds = lConds ++ rConds ++ extras
    val viewConds = allConds.map(toView)
    if (viewConds.exists(_.isEmpty)) {
      dbg(s"cond does not map to view cols: $allConds"); return None
    }
    // every target expression must land on view columns (subqueries and
    // unmappable attrs decline)
    val outCols = targets.map { ne =>
      val (inner, name) = ne match {
        case Alias(c, n) => (c, n)
        case a => (a, a.name)
      }
      if (inner.find(_.isInstanceOf[PlanExpression[_]]).isDefined) None
      else toView(inner).map(t => ColumnBridge.column(t).as(name))
    }
    if (outCols.exists(_.isEmpty)) {
      dbg(s"target does not map: $targets"); return None
    }

    val raw0 = MaterializedJoin.viewStore(lStore, vm.name)
      .readSnapshot(vm.viewVersion)
    val raw = viewConds.flatten.foldLeft(raw0)((df, c) =>
      df.filter(ColumnBridge.column(c)))
    val rep: DataFrame = raw.select(outCols.flatten: _*)
    val repPlan = rep.queryExecution.optimizedPlan
    if (repPlan.output.size != origOutput.size ||
        repPlan.output.zip(origOutput).exists {
          case (n, o) => n.dataType != o.dataType
        }) {
      logWarning(s"join-view rewrite declined: output shape drifted " +
        s"(view '${vm.name}')")
      return None
    }
    logInfo(s"rewrote join over ${lStore.root} to view '${vm.name}'" +
      (if (semi) " (semi)" else if (outer) " (left)" else ""))
    Some(Project(origOutput.zip(repPlan.output).map { case (o, n) =>
      Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier,
        explicitMetadata = Some(o.metadata))
    }, repPlan))
  }
}
