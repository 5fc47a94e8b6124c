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

    val pointRewrite = bounds
      .groupBy(b => (b.point.canonicalized, b.pointOnLeft)).collectFirst {
      case (_, bs) if bs.exists(_.lower) && bs.exists(!_.lower) =>
        val lo = bs.find(_.lower).get
        val hi = bs.find(!_.lower).get
        val iSide = if (lo.pointOnLeft) right else left
        fixedWidth.orElse(deriveWidth(iSide, lo.bound, hi.bound)).map { w =>
          build(j, left, right, lo.point, lo.pointOnLeft, lo.bound,
            hi.bound, w)
        }
    }.flatten
    pointRewrite.orElse(
      rewriteOverlap(j, left, right, comps, side, fixedWidth))
  }

  /** Interval×interval OVERLAP detection — the range×range shape
    * (`l.lo <= r.hi AND r.lo <= l.hi`, strict variants included) the
    * point path cannot see: neither side expression is bounded both
    * ways. Mirrors `RangeJoin.intervalOverlap`, with one twist the
    * manual operator documents away but an automatic rewrite MUST
    * preserve: the raw predicate can match INVERTED intervals
    * (lo > hi), e.g. a=(5,3) against b=(0,10). So each side explodes
    * over its NORMALIZED span [least(lo,hi), greatest(lo,hi)] — a raw
    * match always implies normalized-span overlap (raw gives
    * min_l <= l.lo <= r.hi <= max_r and min_r <= r.lo <= l.hi <=
    * max_l) — and the ORIGINAL condition runs verbatim inside matched
    * buckets, so no false positives. Exactly-once: a pair is claimed
    * only at bin max(bin(min_l), bin(min_r)), the first bin both
    * normalized spans provably cover. Null bounds explode a few
    * harmless rows (Least/Greatest skip nulls) that the raw condition
    * then rejects; all-null bounds yield a null sequence and the
    * non-outer Generate drops the row.
    *
    * Auto width derives from BOTH sides (each is an interval table —
    * either may carry the sentinel/skew that must decline the
    * rewrite) and takes the larger p90, per the manual operator's
    * cost model.
    */
  private def rewriteOverlap(j: Join, left: LogicalPlan,
      right: LogicalPlan, comps: Seq[(Expression, Expression, Boolean)],
      side: Expression => Option[Boolean],
      fixedWidth: Option[Long]): Option[LogicalPlan] = {
    // normalize to (small <= big) pairs
    val leqs = comps.map { case (a, b, aLower) =>
      if (aLower) (b, a) else (a, b)
    }.filter { case (s, b) =>
      integral(s) && integral(b) && s.deterministic && b.deterministic &&
        side(s).isDefined && side(b).isDefined && side(s) != side(b)
    }
    val pair = (for {
      (s1, b1) <- leqs
      (s2, b2) <- leqs
      if side(s1) != side(s2) && side(s1) == side(b2)
    } yield (s1, b2, s2, b1)).headOption
    pair.flatMap { case (lLo0, lHi0, rLo0, rHi0) =>
      // orient to the join's left/right
      val (lLo, lHi, rLo, rHi) =
        if (side(lLo0) == Some(true)) (lLo0, lHi0, rLo0, rHi0)
        else (rLo0, rHi0, lLo0, lHi0)
      val w = fixedWidth.orElse {
        for {
          wl <- deriveWidth(left, Least(Seq(lLo, lHi)),
            Greatest(Seq(lLo, lHi)))
          wr <- deriveWidth(right, Least(Seq(rLo, rHi)),
            Greatest(Seq(rLo, rHi)))
        } yield math.max(wl, wr)
      }
      w.map(buildOverlap(j, left, right, lLo, lHi, rLo, rHi, _))
    }
  }

  private def buildOverlap(j: Join, left: LogicalPlan,
      right: LogicalPlan, lLo: Expression, lHi: Expression,
      rLo: Expression, rHi: Expression, w: Long): LogicalPlan = {
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    def bin(e0: Expression): Expression = {
      val e = toLong(e0)
      Add(IntegralDivide(e, Literal(w)),
        If(LessThan(Remainder(e, Literal(w)), Literal(0L)),
          Literal(-1L), Literal(0L)))
    }
    def nLo(lo: Expression, hi: Expression) =
      Least(Seq(toLong(lo), toLong(hi)))
    def nHi(lo: Expression, hi: Expression) =
      Greatest(Seq(toLong(lo), toLong(hi)))
    def leg(p: LogicalPlan, lo: Expression, hi: Expression,
        attr: AttributeReference): LogicalPlan =
      Generate(
        Explode(Sequence(bin(nLo(lo, hi)), bin(nHi(lo, hi)), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(attr), child = p)
    val lAttr = AttributeReference("__graft_bin_l", LongType,
      nullable = false)()
    val rAttr = AttributeReference("__graft_bin_r", LongType,
      nullable = false)()
    val lPlan = leg(left, lLo, lHi, lAttr)
    val rPlan = leg(right, rLo, rHi, rAttr)
    // first-shared-bin ownership + the ORIGINAL condition verbatim
    val own = EqualTo(lAttr,
      Greatest(Seq(bin(nLo(lLo, lHi)), bin(nLo(rLo, rHi)))))
    val cond = And(And(EqualTo(lAttr, rAttr), own), j.condition.get)
    Project(j.output, Join(lPlan, rPlan, Inner, Some(cond), j.hint))
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
