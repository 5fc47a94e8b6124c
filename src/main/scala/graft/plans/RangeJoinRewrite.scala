package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

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
  * Opt-in by setting the bin width (in units of the point column):
  *
  *   spark.graft.rangeJoin.binWidth = <positive long>
  *
  * Pick it near the typical interval length: interval rows replicate
  * by ~(len/width)+1 while buckets stay selective. Disabled (0) by
  * default — the width is a data-scale decision the engine cannot
  * guess, and a misfit width only costs speed, never correctness.
  *
  * Scope guards: inner joins; integral point/bound types (bin
  * arithmetic is exact integer floor-division — doubles would
  * mis-bin at |v| >= 2^53); deterministic expressions; bails if any
  * cross-side equality conjunct exists (hash joins already handle
  * those, and the guard also makes the rule idempotent — its own
  * output joins on the bin id).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString("spark.graft.rangeJoin.binWidth", "0").toLong
    if (w <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, w).getOrElse(j)
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
      cond: Expression, w: Long): Option[LogicalPlan] = {
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
        build(j, left, right, lo.point, lo.pointOnLeft, lo.bound,
          hi.bound, w)
    }
  }

  private def build(j: Join, left: LogicalPlan, right: LogicalPlan,
      point: Expression, pointOnLeft: Boolean, lo: Expression,
      hi: Expression, w: Long): LogicalPlan = {
    def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    // (v - pmod(v, w)) div w: exact floor-bin for the full long range
    // (same arithmetic as RangeJoin.pointInInterval)
    def bin(e0: Expression): Expression = {
      val e = toLong(e0)
      IntegralDivide(Subtract(e, Pmod(e, Literal(w))), Literal(w))
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
