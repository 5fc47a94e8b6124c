package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite #2: a self-join against one's OWN aggregate
  * becomes a single-scan window.
  *
  * The naive spelling of "compare each row to its group's statistic"
  * is everywhere in analyst SQL:
  *
  *   SELECT … FROM t JOIN (SELECT k, avg(x) a FROM t GROUP BY k) USING (k)
  *
  * Spark plans it as written: TWO scans of `t` and a join — at 100 TB
  * that is a second full pass plus a shuffle the query does not need.
  * The equivalent window form (`avg(x) OVER (PARTITION BY k)`) is one
  * scan and one exchange. This rule detects the pattern on the
  * ANALYZED plan (injected post-hoc, before column pruning makes the
  * two subtrees structurally diverge) and rewrites when ALL hold:
  *
  *   - inner join whose condition is EXACTLY one equality per group
  *     key, pairing the aggregate's group-key output with the left
  *     side's positional counterpart column;
  *   - the join's left subtree and the aggregate's child canonicalize
  *     identically (same data, modulo self-join dedup exprIds);
  *   - every aggregate is a plain deterministic Count / Sum / Min /
  *     Max / Average — no DISTINCT, no FILTER (those don't map 1:1
  *     onto an unordered window frame);
  *   - the shared subtree is deterministic — a rand()/uuid()-bearing
  *     subtree canonicalizes equal while the naive plan's two scans
  *     produce different rows, so collapsing it would change results.
  *
  * Known asymmetry: only `Join(left, Aggregate, …)` (aggregate as the
  * RIGHT child) matches — the mirrored spelling `agg.join(t, keys)`
  * keeps the two-scan plan. The window rewrite itself would be
  * symmetric, but the inner-equi-join output column ORDER differs
  * between the two spellings and the rewrite preserves `j.output`
  * positionally from the left subtree; the right-child shape is the
  * overwhelmingly common analyst spelling, so the mirror arm is
  * deliberately not implemented.
  *
  * Equivalence: group keys are unique on the aggregate side, so the
  * inner equi-join matches each left row with non-null keys exactly
  * once (keys with nulls match nothing) — the rewrite therefore adds
  * `IsNotNull(key…)` filters (window partitioning would otherwise
  * group nulls together) and computes each aggregate over the ENTIRE
  * partition (rows-unbounded frame), which is precisely the group
  * multiset each row joined against. Output attribute ids are
  * preserved (group-key outputs re-aliased from the left columns,
  * aggregate outputs re-aliased onto the window expressions), so
  * parent operators resolve unchanged.
  *
  * Opt-in via `spark.graft.aggJoinToWindow=true` (same posture as
  * `RangeJoinRewrite`). Exercised by the `join_agg_auto` query; result
  * equivalence, bail-out corners, and the one-scan/no-join plan shape
  * are pinned in AggJoinToWindowSpec.
  */
object AggJoinToWindow extends Rule[LogicalPlan] with PredicateHelper {

  private val frame = SpecifiedWindowFrame(RowFrame,
    UnboundedPreceding, UnboundedFollowing)

  private def supported(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.deterministic &&
      (ae.aggregateFunction match {
        case _: Count | _: Sum | _: Min | _: Max | _: Average => true
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.aggJoinToWindow", "false")
        .equalsIgnoreCase("true")) return plan
    plan.transformUp {
      case j @ Join(left,
          agg @ Aggregate(groupExprs, aggExprs, aggChild, _), Inner,
          Some(cond), _)
          if j.resolved && groupExprs.nonEmpty &&
            groupExprs.forall(_.isInstanceOf[Attribute]) &&
            left.output.length == aggChild.output.length &&
            // A non-deterministic shared subtree (rand(), uuid(), …)
            // canonicalizes equal yet produces DIFFERENT rows on the
            // naive plan's two scans — collapsing it to one scan would
            // silently change results vs the query as written.
            left.deterministic && aggChild.deterministic &&
            left.canonicalized == aggChild.canonicalized =>
        rewrite(j, left, agg, aggChild,
          groupExprs.map(_.asInstanceOf[Attribute]), aggExprs, cond)
          .getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, agg: Aggregate,
      aggChild: LogicalPlan, groupAttrs: Seq[Attribute],
      aggExprs: Seq[NamedExpression], cond: Expression): Option[LogicalPlan] = {
    // positional bridge between the two copies of the shared subtree
    val toLeft = AttributeMap(aggChild.output.zip(left.output))
    if (groupAttrs.exists(g => !toLeft.contains(g))) return None

    // condition must be exactly {leftCounterpart(g) = g | g ∈ keys}
    val conjuncts = splitConjunctivePredicates(cond)
    val wanted: Set[(ExprId, ExprId)] = groupAttrs.map(g =>
      (toLeft(g).exprId, g.exprId)).toSet
    val seen = conjuncts.map {
      case EqualTo(a: Attribute, b: Attribute)
          if wanted.contains((a.exprId, b.exprId)) => (a.exprId, b.exprId)
      case EqualTo(a: Attribute, b: Attribute)
          if wanted.contains((b.exprId, a.exprId)) => (b.exprId, a.exprId)
      case _ => return None
    }.toSet
    if (seen != wanted) return None

    val partitionKeys: Seq[Expression] = groupAttrs.map(toLeft(_))
    val spec = WindowSpecDefinition(partitionKeys, Nil, frame)

    // one window expression per aggregate output, original exprIds
    val windowed = aggExprs.flatMap {
      case a @ Alias(ae: AggregateExpression, name) =>
        if (!supported(ae)) return None
        val overLeft = ae.transform {
          case att: Attribute => toLeft.getOrElse(att, return None)
        }.asInstanceOf[AggregateExpression]
        Some(Alias(WindowExpression(overLeft, spec), name)(
          exprId = a.exprId))
      case g: Attribute if groupAttrs.exists(_.exprId == g.exprId) =>
        None // group keys re-emerge from the left side in the project
      case _ => return None
    }

    val win = Window(windowed, partitionKeys, Nil,
      Filter(groupAttrs.map(g => IsNotNull(toLeft(g)))
        .reduce[Expression](And), left))
    val winOut = windowed.map(_.toAttribute)
    val project = j.output.map { out =>
      winOut.find(_.exprId == out.exprId).getOrElse {
        val g = groupAttrs.find(_.exprId == out.exprId)
        if (g.isDefined) Alias(toLeft(g.get), out.name)(exprId = out.exprId)
        else out // a left-side attribute: passes through the window
      }
    }
    Some(Project(project, win))
  }
}
