package graft.store

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** Whitelisted deterministic unary chains E(col) and their FILE-BOUND
  * proofs (r16, VERDICT r15 next #3) — the shared classifier behind both
  * sides of the expression dashboard family:
  *
  *  - GROUP BY E(col): [[graft.catalog.HybridMetaAggRule]] proves a
  *    file's group key from bounds (r15) — monotone chains by
  *    E(min) == E(max), anything by a per-file-constant input;
  *  - WHERE E(col) cmp lit (this round): the same proofs drive per-file
  *    might/must verdicts in [[FileStats]], so `WHERE month(ts) = 5` on a
  *    month-chunked layout prunes ≠-month files and metadata-serves the
  *    all-match ones — closing the WHERE/GROUP asymmetry from statistics
  *    the manifest already held.
  *
  * The r16 addition for PERIODIC extractions: `month`/`day`/`hour`/… are
  * not monotone (they wrap at their enclosing period), but each reads its
  * input at a fixed CALENDAR GRANULARITY — two timestamps in the same
  * calendar month have the same `month()` whatever the year layout of the
  * file. So every periodic node carries a granularity TRUNCATION P (a
  * monotone calendar floor): P(min) == P(max), both non-null, proves the
  * file's whole [min, max] range lies inside one granularity period and
  * pins E constant across it — exactly the month-chunked ingest, where
  * `min == max` never holds but the month does not change inside a file.
  *
  * Everything here must be sound when evaluated on EXECUTORS (the sharded
  * manifest sweep): classification and eval use only the expressions'
  * own resolved state (timezones ride `timeZoneId`), never the session. */
object ExprBounds {

  /** Granularity record for the LOWEST periodic node of a chain:
    * `proof` = the calendar floor P over the base column (P(min) == P(max)
    * pins the extraction constant); `child` = the periodic node's input
    * expression over the base (the domain period starts live in);
    * `unit`/`tz` step one period forward for the bounded ENUMERATION
    * proof (a file spanning k ≤ [[ExprBounds.MaxPeriods]] periods has its
    * extraction values ⊆ {E at each covered period start} — a
    * month-boundary straddler proves `month(ts) = 5` false when neither
    * covered month is May). */
  final case class Gran(proof: Expression, child: Expression,
      unit: String, tz: Option[String])

  /** One classified chain: `base` the single input column, `monotone`
    * whether x ≤ y ⇒ E(x) ≤ E(y) over the whole domain, `gran` the
    * granularity record for the LOWEST periodic node (absent when the
    * chain is fully monotone or carries an un-proofable node). A chain
    * with `monotone = false` and no `gran` still proves on
    * per-file-constant input (min == max). */
  final case class Chain(base: AttributeReference, monotone: Boolean,
      gran: Option[Gran])

  /** Enumeration cap: a file spanning more covered periods than this
    * stays conservative (the per-file eval cost is bounded at
    * 2 × MaxPeriods tiny interpreter calls). 40 covers a month of days
    * and several years of months/quarters. */
  val MaxPeriods = 40

  private def posLit(x: Expression): Boolean = x match {
    case Literal(v: Byte, _) => v > 0
    case Literal(v: Short, _) => v > 0
    case Literal(v: Int, _) => v > 0
    case Literal(v: Long, _) => v > 0
    case Literal(v: Decimal, _) => v.toBigDecimal.signum > 0
    case _ => false
  }
  private def nonZeroLit(x: Expression): Boolean = x match {
    case Literal(v: Byte, _) => v != 0
    case Literal(v: Short, _) => v != 0
    case Literal(v: Int, _) => v != 0
    case Literal(v: Long, _) => v != 0
    case Literal(v: Decimal, _) => v.toBigDecimal.signum != 0
    case _ => false
  }

  /** Is `tz` a fixed-offset zone (no DST / historic wall-clock jumps)?
    * Any cast crossing the instant↔wall-clock boundary is monotone only
    * then: a DST fall-back repeats local times, and historic MIDNIGHT
    * transitions (Brazil's DST end) even step the local DATE backwards. */
  private def fixedOffset(tz: Option[String]): Boolean = tz.exists { z =>
    z == "UTC" ||
      (try java.time.ZoneId.of(z).getRules.isFixedOffset
       catch { case _: Exception => false })
  }

  /** Order-preserving casts only: widening integrals, date↔timestamp.
    * Narrowing integral casts WRAP under non-ANSI eval and are refused;
    * LTZ-crossing casts are gated on the cast's own resolved fixed-offset
    * zone (executor-safe — no session lookup). */
  private def castMonotone(c: Cast): Boolean =
    (c.child.dataType, c.dataType) match {
      case (DateType, TimestampNTZType) => true
      case (TimestampNTZType, DateType) => true
      case (DateType, TimestampType) => fixedOffset(c.timeZoneId)
      case (TimestampType, DateType) => fixedOffset(c.timeZoneId)
      case (TimestampType, TimestampNTZType) => fixedOffset(c.timeZoneId)
      case (TimestampNTZType, TimestampType) => fixedOffset(c.timeZoneId)
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case _ => false
    }

  /** The calendar granularity of a periodic node: (unit, timezone).
    * Date-read extractions are constant within a DAY of their date input;
    * time-read ones within their own unit. */
  private def periodicUnit(x: Expression): Option[(String, Option[String])] =
    x match {
      case Quarter(_) => Some(("QUARTER", None))
      case Month(_) => Some(("MONTH", None))
      case DayOfMonth(_) | DayOfYear(_) | DayOfWeek(_) | WeekDay(_) =>
        Some(("DAY", None))
      case WeekOfYear(_) => Some(("WEEK", None))
      case h: Hour => Some(("HOUR", h.timeZoneId))
      case mi: Minute => Some(("MINUTE", mi.timeZoneId))
      case sec: Second => Some(("SECOND", sec.timeZoneId))
      case _ => None
    }

  /** Classify `e` as a whitelisted pure unary chain over one column:
    * every node deterministic, NULL-intolerant (E(NULL) = NULL), and
    * evaluable on a literal bound. Base columns are the exactly-ordered
    * stat encodings plus strings (whose only chain is the identity —
    * no whitelisted node takes a string input). */
  def classify(e: Expression): Option[Chain] = {
    // a periodic node: all inputs within one `unit` period of its child
    // domain share the node's output — record the floor P(child) for the
    // constancy proof and (child, unit, tz) for the period enumeration
    def periodic(x: Expression, unit: String, tz: Option[String])
        : Option[Chain] =
      x match {
        case u: UnaryExpression => classify(u.child).map { c =>
          Chain(c.base,
            monotone = false,
            // the LOWEST periodic node's proof wins; a periodic node over
            // an already-periodic child keeps the child's (proving the
            // lowest constant pins everything above)
            gran =
              if (!c.monotone) c.gran
              else {
                val proof = u.child.dataType match {
                  case DateType =>
                    if (unit == "DAY") u.child
                    else TruncDate(u.child, Literal(unit))
                  // sub-day units over INSTANT timestamps are gated on a
                  // fixed-offset zone (ADVICE r16): across a DST
                  // fall-back, TruncTimestamp resolves both ambiguous
                  // wall-clock instants to the earlier offset, so
                  // P(min) == P(max) can hold while minute()/second()
                  // vary for rows between them — the constancy proof
                  // would mis-serve. Calendar-day-and-above units are
                  // safe (a repeated wall-clock hour stays inside its
                  // day/month/quarter), and TimestampNTZ carries no zone
                  // at all, so both stay ungated.
                  case TimestampType
                      if Set("HOUR", "MINUTE", "SECOND")(unit) &&
                        !fixedOffset(tz) =>
                    return Some(Chain(c.base, monotone = false,
                      gran = None))
                  case TimestampType | TimestampNTZType =>
                    TruncTimestamp(Literal(unit), u.child, tz)
                  case _ => return Some(Chain(c.base, monotone = false,
                    gran = None))
                }
                Some(Gran(proof, u.child, unit, tz))
              })
        }
        case _ => None
      }
    if (!e.deterministic) return None
    e match {
      case ar: AttributeReference =>
        if (FileStats.minMaxExact(ar.dataType) || ar.dataType == StringType)
          Some(Chain(ar, monotone = true, None))
        else None
      // monotone: truncation to a period start / year extraction.
      // TruncTimestamp over an INSTANT input is monotone only in a
      // fixed-offset zone (same family as the ADVICE r16 periodic gate:
      // a midnight DST fall-back — Brazil's, historically — steps the
      // local DATE backwards, so day-level trunc over instants can
      // DECREASE); outside one the chain keeps only the constant-input
      // proof. TimestampNTZ has no zone and stays ungated.
      case t @ TruncTimestamp(Literal(_, _), c, _) =>
        classify(c).map { ch =>
          if (c.dataType != TimestampType || fixedOffset(t.timeZoneId)) ch
          else Chain(ch.base, monotone = false, gran = None)
        }
      case TruncDate(c, Literal(_, _)) => classify(c)
      case Year(c) => classify(c)
      case cast: Cast if castMonotone(cast) => classify(cast.child)
      case IntegralDivide(c, d, _) if posLit(d) => classify(c)
      // periodic (deterministic, NOT monotone): each carries the calendar
      // granularity its value is constant within
      case p if periodicUnit(p).isDefined =>
        val (unit, tz) = periodicUnit(p).get
        periodic(p, unit, tz)
      // pmod: constant-input proof only (trunc-toward-zero `div` windows
      // do NOT pin pmod around zero, so no granularity companion)
      case Pmod(c, d, _) if nonZeroLit(d) =>
        classify(c).map(ch => Chain(ch.base, monotone = false, gran = None))
      case _ => None
    }
  }

  /** Evaluate `e` with its single attribute replaced by literal `v` of
    * the base column's type; None on eval error (ANSI overflow, …) — an
    * unevaluable bound proves nothing. Null results stay as Some(null)
    * for callers that must distinguish. */
  def evalOn(e: Expression, baseDt: DataType, v: Any): Option[Any] =
    try Some(e.transformUp {
      case _: AttributeReference => Literal(v, baseDt)
    }.eval(null))
    catch { case _: Exception => None }

  // ------------------------------------------------- per-file WHERE proofs

  /** What E provably takes on a file with column bounds [mn, mx]:
    * Left((lo, hi)) an inclusive INTERVAL (constant-input or monotone
    * proofs; lo == hi for constants), Right(values) an enumerated value
    * SET (periodic chains over a file spanning ≤ [[MaxPeriods]] covered
    * periods — the extraction is constant within each period, so its
    * file-wide values are a subset of {E at each covered period start}),
    * None when nothing is provable. */
  private def outDomain(ch: Chain, e: Expression, mn: Any, mx: Any)
      : Option[Either[(Any, Any), Seq[Any]]] = {
    def ev(v: Any): Option[Any] =
      evalOn(e, ch.base.dataType, v).filter(_ != null)
    if (mn == mx) return ev(mn).map(v => scala.Left((v, v)))
    if (ch.monotone)
      return (for { lo <- ev(mn); hi <- ev(mx) } yield scala.Left((lo, hi)))
    val g = ch.gran.getOrElse(return None)
    val pl = evalOn(g.proof, ch.base.dataType, mn)
      .filter(_ != null).getOrElse(return None)
    val ph = evalOn(g.proof, ch.base.dataType, mx)
      .filter(_ != null).getOrElse(return None)
    if (pl == ph) return ev(mn).map(v => scala.Left((v, v)))
    // ENUMERATION: step period starts pl → ph in the periodic node's
    // child domain, evaluating the chain FROM that node up at each start
    // (the tail is the original expression with the node's child replaced
    // by a hole — everything below the node is the all-monotone child
    // chain the starts already live in)
    val childDt = g.child.dataType
    val pNode = e.find {
      case u: UnaryExpression =>
        periodicUnit(u).isDefined && u.child.semanticEquals(g.child)
      case _ => false
    }.getOrElse(return None)
    val hole = AttributeReference("_g_hole", childDt)()
    val eHole = e.transformUp {
      case n if n eq pNode =>
        n.asInstanceOf[UnaryExpression].withNewChildren(Seq(hole))
    }
    def evAt(start: Any): Option[Any] =
      try Option(eHole.transformUp {
        case a: AttributeReference if a eq hole => Literal(start, childDt)
      }.eval(null))
      catch { case _: Exception => None }
    def step(cur: Any): Option[Any] = {
      val l = Literal(cur, childDt)
      val se = (childDt, g.unit) match {
        case (DateType, "DAY") => DateAdd(l, Literal(1))
        case (DateType, "WEEK") => DateAdd(l, Literal(7))
        case (DateType, "MONTH") => AddMonths(l, Literal(1))
        case (DateType, "QUARTER") => AddMonths(l, Literal(3))
        case (TimestampType | TimestampNTZType, u) =>
          TimestampAdd(u, Literal(1L), l, g.tz)
        case _ => return None
      }
      try Option(se.eval(null)) catch { case _: Exception => None }
    }
    val vals = Seq.newBuilder[Any]
    var cur = pl
    var steps = 0
    while (steps <= MaxPeriods) {
      vals += evAt(cur).getOrElse(return None)
      if (cur == ph) return Some(scala.Right(vals.result().distinct))
      cur = step(cur).getOrElse(return None)
      steps += 1
    }
    None // spans more periods than the cap: conservative
  }

  /** Normalize a conjunct into (chain expr, op-as-range-test, literal).
    * Ops are encoded by two functions over the interpreted ordering:
    * mightTest(lo, hi, v) / mustTest(lo, hi, v). */
  private def recognize(e: Expression): Option[(Expression, Chain,
      (Ordering[Any], Any, Any, Any) => Boolean,
      (Ordering[Any], Any, Any, Any) => Boolean)] = {
    def lit(x: Expression): Option[Any] =
      if (x.foldable) try Option(x.eval(null)) catch {
        case _: Exception => None
      } else None
    // a bare attribute comparison is FileStats' own (exact-bound) case —
    // this module only takes genuine chains
    def chainOf(x: Expression): Option[(Expression, Chain)] = x match {
      case _: AttributeReference => None
      case _ => classify(x).map(c => (x, c))
    }
    type T = (Ordering[Any], Any, Any, Any) => Boolean
    val eqMight: T = (o, lo, hi, v) => o.lteq(lo, v) && o.lteq(v, hi)
    val eqMust: T = (o, lo, hi, v) => o.equiv(lo, v) && o.equiv(hi, v)
    def of(x: Expression, v: Option[Any], might: T, must: T) =
      for { vv <- v; (ex, ch) <- chainOf(x) }
        yield (ex, ch, might.asInstanceOf[T], must): (Expression, Chain, T, T)
    e match {
      case EqualTo(a, b) =>
        of(a, lit(b), eqMight, eqMust).orElse(of(b, lit(a), eqMight, eqMust))
      case EqualNullSafe(a, b) =>
        of(a, lit(b).filter(_ != null), eqMight, eqMust)
          .orElse(of(b, lit(a).filter(_ != null), eqMight, eqMust))
      case GreaterThan(a, b) =>
        of(a, lit(b), (o, _, hi, v) => o.lt(v, hi),
          (o, lo, _, v) => o.lt(v, lo))
        .orElse(of(b, lit(a), (o, lo, _, v) => o.lt(lo, v),
          (o, _, hi, v) => o.lt(hi, v)))
      case GreaterThanOrEqual(a, b) =>
        of(a, lit(b), (o, _, hi, v) => o.lteq(v, hi),
          (o, lo, _, v) => o.lteq(v, lo))
        .orElse(of(b, lit(a), (o, lo, _, v) => o.lteq(lo, v),
          (o, _, hi, v) => o.lteq(hi, v)))
      case LessThan(a, b) =>
        of(a, lit(b), (o, lo, _, v) => o.lt(lo, v),
          (o, _, hi, v) => o.lt(hi, v))
        .orElse(of(b, lit(a), (o, _, hi, v) => o.lt(v, hi),
          (o, lo, _, v) => o.lt(v, lo)))
      case LessThanOrEqual(a, b) =>
        of(a, lit(b), (o, lo, _, v) => o.lteq(lo, v),
          (o, _, hi, v) => o.lteq(hi, v))
        .orElse(of(b, lit(a), (o, _, hi, v) => o.lteq(v, hi),
          (o, lo, _, v) => o.lteq(v, lo)))
      case _ => None
    }
  }

  private def ordering(dt: DataType): Option[Ordering[Any]] =
    try Some(org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(dt).asInstanceOf[Ordering[Any]])
    catch { case _: Exception => None }

  private def verdict(stat: FileStats.FileStat, schema: StructType,
      e: Expression, wantMust: Boolean): Option[Boolean] = {
    // IN over a chain: any member might / single-point must
    e match {
      case In(x, vs) if vs.forall(_.foldable) && recognize(
          EqualTo(x, vs.headOption.getOrElse(return None))).isDefined =>
        val per = vs.map(v => verdict(stat, schema, EqualTo(x, v), wantMust))
        if (per.exists(_.isEmpty)) return None
        return Some(per.flatten.exists(identity))
      case _ => ()
    }
    val (ex, ch, mightT, mustT) = recognize(e).getOrElse(return None)
    val cs = stat.cols.get(ch.base.name).getOrElse(return None)
    if (!schema.fields.exists(f => f.name == ch.base.name &&
      f.dataType == ch.base.dataType)) return None
    // all-NULL column: E(NULL) = NULL, the (null-rejecting) predicate
    // matches no row — prune, and never all-match (unless zero rows,
    // handled by mustMatch's top-level gate)
    if (stat.rows > 0 && cs.nulls >= stat.rows) return Some(false)
    if (wantMust && cs.nulls != 0) return Some(false)
    val dt = ch.base.dataType
    val bounds = for {
      mnS <- cs.min; mxS <- cs.max
      mn = FileStats.parseBound(mnS, dt)
      mx = FileStats.parseBound(mxS, dt)
    } yield (mn, mx)
    val (mn, mx) = bounds.getOrElse(
      return Some(!wantMust)) // no bounds: might yes, must no
    // literal value: recognize() validated foldability; the chain side is
    // `ex`, so the OTHER side is the literal
    val v = (e match {
      case EqualTo(a, b) => if (a eq ex) Some(b) else Some(a)
      case EqualNullSafe(a, b) => if (a eq ex) Some(b) else Some(a)
      case GreaterThan(a, b) => if (a eq ex) Some(b) else Some(a)
      case GreaterThanOrEqual(a, b) => if (a eq ex) Some(b) else Some(a)
      case LessThan(a, b) => if (a eq ex) Some(b) else Some(a)
      case LessThanOrEqual(a, b) => if (a eq ex) Some(b) else Some(a)
      case _ => None
    }).flatMap(l => try Option(l.eval(null)) catch {
      case _: Exception => None
    }).getOrElse(return Some(!wantMust)) // NULL literal: no row matches
    val ord = ordering(ex.dataType).getOrElse(return Some(!wantMust))
    outDomain(ch, ex, mn, mx) match {
      case Some(scala.Left((lo, hi))) =>
        Some(if (wantMust) mustT(ord, lo, hi, v) else mightT(ord, lo, hi, v))
      case Some(scala.Right(vals)) =>
        // enumerated SET: each member is a point; the file's rows take a
        // SUBSET of these values, so might = any member could match and
        // must = every member provably matches (over-approximation only
        // strengthens must and keeps might conservative)
        Some(if (wantMust) vals.forall(s => mustT(ord, s, s, v))
             else vals.exists(s => mightT(ord, s, s, v)))
      case None => Some(!wantMust) // unprovable: might yes, must no
    }
  }

  /** Does this module model `e` at all? — the gate callers use before
    * paying a replan/classification sweep on its account. */
  def prunable(e: Expression): Boolean = e match {
    case In(x, vs) if vs.nonEmpty && vs.forall(_.foldable) => x match {
      case _: AttributeReference => false // FileStats' own case
      case other => classify(other).isDefined
    }
    case other => recognize(other).isDefined
  }

  /** Conservative one-file MIGHT verdict for a chain conjunct: Some(false)
    * ONLY when bounds PROVE no row can satisfy it; None when the shape is
    * not a chain comparison (caller defaults true). */
  def might(stat: FileStats.FileStat, schema: StructType,
      e: Expression): Option[Boolean] =
    try verdict(stat, schema, e, wantMust = false)
    catch { case _: Exception => None }

  /** Conservative one-file MUST verdict: Some(true) ONLY when bounds PROVE
    * every row satisfies it; None when unrecognized (caller defaults
    * false). */
  def must(stat: FileStats.FileStat, schema: StructType,
      e: Expression): Option[Boolean] =
    try verdict(stat, schema, e, wantMust = true)
    catch { case _: Exception => None }
}
