package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Count, Max}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite keyless point-in-interval joins into the
  * binned equi-join of `graft.operators.RangeJoin` — automatically.
  *
  * A join whose condition is only range predicates (`p.v >= i.lo AND
  * p.v <= i.hi`, no cross-side equality) gives Spark nothing to hash
  * or sort on, so it plans a BroadcastNestedLoopJoin / cartesian —
  * the O(n·m) shape that does not survive scale. Users of the manual
  * API call `RangeJoin.pointInInterval`; this rule lets the NAIVE
  * spelling (`points.join(intervals, v >= lo && v <= hi)`) get the
  * same plan: quantize the point axis into fixed-width bins, explode
  * each interval over the bins it covers, equi-join on the bin id,
  * and re-apply the exact original condition inside the matched
  * buckets. Each qualifying pair appears exactly once (a point has
  * one bin), so the rewrite is semantics-preserving for any inner
  * join — extra conjuncts are kept verbatim in the new condition.
  *
  * Opt-in via `spark.graft.rangeJoin.binWidth`:
  *
  *   - `<positive long>` — fixed width in units of the point column.
  *     Pick it near the typical interval length: interval rows
  *     replicate by ~(len/width)+1 while buckets stay selective.
  *   - `auto` — the rule derives the width at planning time with one
  *     cheap pre-job over the INTERVAL side (the small side of every
  *     sane range join): width = p90 interval length, so ≥90% of
  *     intervals replicate ≤ 2x and the tail is bounded by the bin
  *     cap below. The pre-job result is cached per canonicalized
  *     interval subplan, so the optimizer's fixed-point batches run
  *     it once per query. Streaming interval sides fall back to the
  *     untouched join (a batch pre-job cannot run there).
  *   - unset / `0` / unparsable — rule disabled (default).
  *
  * Interval-length SKEW guard (`spark.graft.rangeJoin.maxBinsPerRow`,
  * default 4096): in auto mode the same pre-job measures the MAX
  * interval length; if the widest interval would explode over more
  * bins than the cap (e.g. an open-end `Long.MaxValue` sentinel
  * row — astronomically many bins, a guaranteed runtime failure in
  * `Sequence`), the rule declines the rewrite and leaves the
  * nested-loop plan: correct, and exactly what the user had before
  * opting in. With a fixed width the engine cannot see the data, so a
  * sentinel-bearing interval table fails loudly at runtime in
  * `Sequence` ("too long sequence") — use `auto` when interval
  * lengths are not known to be bounded.
  *
  * Scope guards: inner joins; integral point/bound types (bin
  * arithmetic is exact integer floor-division — doubles would
  * mis-bin at |v| >= 2^53); deterministic expressions; bails if any
  * cross-side equality conjunct exists (hash joins already handle
  * those, and the guard also makes the rule idempotent — its own
  * output joins on the bin id). Bin arithmetic is overflow-safe over
  * the FULL long range: floor-division is expressed as truncating
  * division with a negative-remainder adjustment, never as
  * `v - pmod(v, w)` (which wraps for v within w of Long.MinValue and
  * would silently mis-bin).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  /** auto-mode width cache: canonicalized (interval plan, lo, hi) →
    * derived width (None = declined). Bounded — cleared when it
    * outgrows a working set no real session reaches. */
  private val widthCache = new java.util.concurrent.ConcurrentHashMap[
    (LogicalPlan, Expression, Expression), Option[Long]]()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString("spark.graft.rangeJoin.binWidth", "0").trim
    val auto = raw.equalsIgnoreCase("auto")
    // a malformed width must disable the rewrite, not fail every
    // query compiled in the session
    val w = if (auto) 0L else scala.util.Try(raw.toLong).getOrElse(0L)
    if (!auto && w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond,
          if (auto) None else Some(w)).getOrElse(j)
    }
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType => true
    case _ => false
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** One inequality conjunct read as a bound on a candidate point
    * expression: `point` lives entirely on one side (pointOnLeft),
    * `bound` entirely on the other.
    */
  private case class Bound(point: Expression, pointOnLeft: Boolean,
      bound: Expression, lower: Boolean)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, fixedWidth: Option[Long]): Option[LogicalPlan] = {
    val conj = splitConj(cond)

    // side(e) = Some(true) iff e references only the left output,
    // Some(false) iff only the right
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    val hasCrossEqui = conj.exists {
      case EqualTo(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case EqualNullSafe(a, b) => side(a).isDefined && side(b).isDefined &&
        side(a) != side(b)
      case _ => false
    }
    if (hasCrossEqui) return None

    // a >= b: lower bound if a is the point; a <= b: upper bound.
    val comps: Seq[(Expression, Expression, Boolean)] = conj.collect {
      case GreaterThanOrEqual(a, b) => (a, b, true)
      case GreaterThan(a, b) => (a, b, true)
      case LessThanOrEqual(a, b) => (a, b, false)
      case LessThan(a, b) => (a, b, false)
    }
    val bounds = comps.flatMap { case (a, b, aLower) =>
      (side(a), side(b)) match {
        case (Some(pa), Some(pb)) if pa != pb =>
          Seq(Bound(a, pa, b, aLower), Bound(b, pb, a, !aLower))
        case _ => Nil
      }
    }.filter(x => integral(x.point) && integral(x.bound) &&
      x.point.deterministic && x.bound.deterministic)

    bounds.groupBy(b => (b.point.canonicalized, b.pointOnLeft)).collectFirst {
      case (_, bs) if bs.exists(_.lower) && bs.exists(!_.lower) =>
        val lo = bs.find(_.lower).get
        val hi = bs.find(!_.lower).get
        val iSide = if (lo.pointOnLeft) right else left
        fixedWidth.orElse(deriveWidth(iSide, lo.bound, hi.bound)).map { w =>
          build(j, left, right, lo.point, lo.pointOnLeft, lo.bound,
            hi.bound, w)
        }
    }.flatten
  }

  /** auto mode: one pre-job over the interval side — p90 length picks
    * the width, max length checks the bin cap. Returns None (decline
    * the rewrite) for streaming/empty interval sides or when the
    * widest interval would exceed `maxBinsPerRow` bins.
    */
  private def deriveWidth(iSide: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = {
    if (iSide.isStreaming) return None
    val key = (iSide.canonicalized, lo.canonicalized, hi.canonicalized)
    val hit = widthCache.get(key)
    if (hit != null) return hit
    val spark = SparkSession.getActiveSession.getOrElse(return None)
    val cap = scala.util.Try(conf.getConfString(
      "spark.graft.rangeJoin.maxBinsPerRow", "4096").toLong)
      .getOrElse(4096L).max(1L)
    // lengths in double: monotone, overflow-free for the full long
    // range, and only a width ESTIMATE is needed — binning itself
    // stays exact integer arithmetic.
    val len = Add(Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)),
      Literal(1.0))
    val agg = Aggregate(Nil, Seq(
      Alias(new ApproximatePercentile(len, Literal(0.9), Literal(10000))
        .toAggregateExpression(), "p90")(),
      Alias(Max(len).toAggregateExpression(), "mx")(),
      Alias(Count(Literal(1)).toAggregateExpression(), "n")(),
      Alias(aggregate.Min(Cast(lo, DoubleType)).toAggregateExpression(),
        "min_lo")(),
      Alias(Max(Cast(hi, DoubleType)).toAggregateExpression(), "max_hi")()),
      Filter(LessThanOrEqual(Cast(lo, LongType), Cast(hi, LongType)),
        iSide))
    val derived: Option[Long] = try {
      val row = spark.sessionState.executePlan(agg)
        .executedPlan.executeCollect().headOption.getOrElse(return None)
      if (row.isNullAt(0) || row.getLong(2) == 0L) None
      else {
        val w = math.max(1L, math.round(row.getDouble(0)))
        val maxBins = row.getDouble(1) / w
        // span/w ≈ how many distinct buckets the join can spread over:
        // when a sentinel-dominated p90 inflates the width until
        // everything lands in a handful of bins, the "equi-join" is a
        // single hot bucket — worse than the nested loop it replaces.
        val spanBins = (row.getDouble(4) - row.getDouble(3) + 1.0) / w
        if (maxBins > cap) {
          logWarning(s"rangeJoin auto-binning declined: widest interval " +
            s"spans ~${maxBins.toLong} bins at width $w (cap $cap) — " +
            s"leaving the nested-loop plan")
          None
        } else if (spanBins < 4.0) {
          logWarning(s"rangeJoin auto-binning declined: derived width $w " +
            s"leaves only ~${spanBins.toLong} buckets over the interval " +
            s"span — binning would not distribute the join")
          None
        } else Some(w)
      }
    } catch { case e: Throwable =>
      logWarning(s"rangeJoin auto-binning pre-job failed: ${e.getMessage}")
      None
    }
    if (widthCache.size > 64) widthCache.clear()
    widthCache.put(key, derived)
    derived
  }

  private def build(j: Join, left: LogicalPlan, right: LogicalPlan,
      point: Expression, pointOnLeft: Boolean, lo: Expression,
      hi: Expression, w: Long): LogicalPlan = {
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    // floor(e / w) as truncating division adjusted when the remainder
    // is negative: exact for the FULL long range. The naive
    // `(e - pmod(e, w)) div w` wraps (non-ANSI) or throws (ANSI) for
    // e within w of Long.MinValue.
    def bin(e0: Expression): Expression = {
      val e = toLong(e0)
      Add(IntegralDivide(e, Literal(w)),
        If(LessThan(Remainder(e, Literal(w)), Literal(0L)),
          Literal(-1L), Literal(0L)))
    }
    val (pSide, iSide) = if (pointOnLeft) (left, right) else (right, left)
    val pAlias = Alias(bin(point), "__graft_bin")()
    val pPlan = Project(pSide.output :+ pAlias, pSide)
    val iAttr = AttributeReference("__graft_bin_g", LongType,
      nullable = false)()
    // empty intervals (lo > hi) match nothing; filtering them keeps
    // Sequence ascending. Null bounds yield a null sequence -> the
    // non-outer Generate emits no rows, matching join-null semantics.
    // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until
    // the timezone is filled in. The analyzer's ResolveTimeZone pass
    // already ran, so an optimizer rule must set it explicitly.
    val iPlan = Generate(
      Explode(Sequence(bin(lo), bin(hi), None,
        Some(conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(iAttr),
      child = Filter(LessThanOrEqual(toLong(lo), toLong(hi)), iSide))
    val newCond = And(EqualTo(pAlias.toAttribute, iAttr), j.condition.get)
    val (nl, nr) = if (pointOnLeft) (pPlan, iPlan) else (iPlan, pPlan)
    Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
  }
}
