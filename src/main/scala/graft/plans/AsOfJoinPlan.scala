package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Ascending, Attribute, GenericInternalRow, JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the full custom-operator path (logical node →
  * strategy → physical operator), for the one relational shape the
  * built-in operators cannot express as a single pass: "for every
  * left row, the LATEST right row with the same key and time ≤ the
  * left time".
  *
  * The composition fallback (`operators/AsOfJoin.lastEarlier`) unions
  * both sides and runs a running `last(ignoreNulls)` window — correct
  * and one shuffle, but it materializes left+right in one sorted
  * window partition and carries the payload struct through the
  * union. This operator instead sort-merges the two sides the way
  * `SortMergeJoinExec` does: each side is hash-clustered on its key
  * and sorted (key, time), and one forward pass per partition joins
  * them with O(1) state — no union row blow-up, no window buffer, no
  * payload through the left's shuffle. Both shapes are
  * 1000-executor-safe; the merge halves the shuffled bytes and drops
  * the window state entirely.
  *
  * Contract (enforced by [[AsOfJoinNative]], the public wrapper):
  * column 0 of each child is the join key as LONG, column 1 is the
  * time as LONG, both non-null. The exec sorts the right side by ALL
  * its columns, making the tie order total: backward mode keeps the
  * LAST consumed row of an equal-(key, time) run (max payload —
  * `lastEarlier`'s max-struct rule), forward mode matches the merge
  * HEAD (min payload — `firstLater`'s first-in-frame rule).
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    direction: String = "backward", tolerance: Long = -1L)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // The operator's child contract is POSITIONAL (column 0 = key,
  // column 1 = time). Declaring every child column as referenced
  // stops ColumnPruning from pushing an upper projection through the
  // node and silently deleting/reordering the key columns — the exec
  // would then read a payload column as the join key.
  override def references: org.apache.spark.sql.catalyst.expressions
      .AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown THROUGH the custom operator: Catalyst's
  * `PushDownPredicates` knows nothing about [[AsOfJoinNode]], so
  * without this rule any filter a user applies after the as-of join
  * evaluates above it — the 100 TB cost being a full-table merge
  * whose output is then mostly discarded, with nothing reaching the
  * scan's PushedFilters. Left-only conjuncts commute with the join
  * (each output row is one left row + a looked-up payload; dropping
  * left rows cannot change any other row's match), so they move into
  * the left child, where the standard rules — running in the SAME
  * operator-optimization fixed point — carry them down to the scan.
  * Right-side conjuncts must NOT move: the join is left-outer-shaped
  * (null payload on no match) and filtering the right side would
  * change which version matches. Bails entirely on any
  * non-deterministic conjunct (pushing past it would change how often
  * it evaluates).
  *
  * One right-side exception, mirroring what Spark's
  * `InferFiltersFromConstraints` does for standard equi-joins:
  * a pushed conjunct that constrains ONLY the left KEY is additionally
  * COPIED (not moved) to the right child. A right version whose key
  * fails the predicate can only ever match a left row that the same
  * predicate just eliminated, so dropping it is invisible — and it
  * shrinks the right-side scan + shuffle by the key selectivity.
  * "Constrains only the key" means the conjunct's sole reference is
  * either the node-level key attribute (child col 0) or the integral
  * source attribute it was `cast(... as long)` from (the wrapper's
  * `__k = cast(userKey)` shape, traced through the child Project).
  * In the traced case the mirrored predicate rewrites that source to
  * `try_cast(rightKey AS sourceType)`: for any right row that could
  * match a surviving left row the key equals a widened in-range value,
  * so the narrowing round-trip is exact; an out-of-range right key
  * try-casts to NULL and is dropped — correct, since it can never
  * equal any in-range left key. Injected by `GraftExtensions`.
  */
object AsOfJoinFilterPushdown extends Rule[LogicalPlan]
    with PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeSet, Cast, EvalMode, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.Project
  import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

  private def integral(dt: org.apache.spark.sql.types.DataType) =
    dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType

  /** The integral attribute the child's col-0 key is an identity or
    * widening cast of, traced through Filters and one Project. */
  private def col0Source(plan: LogicalPlan): Option[Attribute] =
    plan match {
      case Filter(_, c) => col0Source(c)
      case p: Project => p.projectList.head match {
        case a: Attribute if integral(a.dataType) => Some(a)
        case Alias(a: Attribute, _) if integral(a.dataType) => Some(a)
        case Alias(c: Cast, _) if c.evalMode != EvalMode.TRY =>
          c.child match {
            case a: Attribute if integral(a.dataType) => Some(a)
            case _ => None
          }
        case _ => None
      }
      case _ => Some(plan.output.head).filter(a => integral(a.dataType))
    }

  private def mirrorOf(conjunct: Expression, j: AsOfJoinNode)
      : Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, In}
    val rKey = j.right.output.head
    val lKey = j.left.output.head
    val srcOpt = (
      if (conjunct.references == AttributeSet(lKey)) Some(lKey)
      else col0Source(j.left)
        .filter(s => conjunct.references == AttributeSet(s))
    ).filter(s => integral(s.dataType))
    srcOpt.map { src =>
      if (src.dataType == rKey.dataType)
        conjunct.transform {
          case a: Attribute if a.semanticEquals(src) => rKey }
      else {
        // src is a NARROWER integral the key was widened from. For
        // comparisons against literals, widen the LITERAL side (exact
        // + monotonic for integrals) so the bare rKey attribute can
        // travel through the right Project and unwrap into the scan's
        // PushedFilters; for any other shape, narrow rKey back with a
        // TRY cast (NULL → dropped, and an out-of-range right key can
        // never equal an in-range left key, so dropping is correct).
        def widen(e: Expression): Expression = Cast(e, LongType)
        conjunct.transform {
          case cmp @ BinaryComparison(a: Attribute, other)
              if a.semanticEquals(src) && other.foldable =>
            cmp.withNewChildren(Seq(rKey, widen(other)))
          case cmp @ BinaryComparison(other, a: Attribute)
              if a.semanticEquals(src) && other.foldable =>
            cmp.withNewChildren(Seq(widen(other), rKey))
          case In(a: Attribute, list)
              if a.semanticEquals(src) && list.forall(_.foldable) =>
            In(rKey, list.map(widen))
          case a: Attribute if a.semanticEquals(src) =>
            Cast(rKey, src.dataType, None, EvalMode.TRY)
        }
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, j: AsOfJoinNode) if cond.deterministic =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(_.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val mirror = push.flatMap(mirrorOf(_, j))
        val pushed = j.copy(
          left = Filter(push.reduce(And), j.left),
          right = mirror.reduceOption(And)
            .map(Filter(_, j.right)).getOrElse(j.right))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Column pruning THROUGH the custom operator: [[AsOfJoinNode]]
  * declares every child column referenced (the positional key/time
  * contract would otherwise be destroyed by Catalyst's generic
  * `ColumnPruning`), which has the side effect that an as-of join
  * against a WIDE dimension reads and shuffles every payload column
  * even when the query uses two. This rule restores pruning safely:
  * under a direct Project, child columns at positions ≥ 2 (payloads —
  * the key/time at 0/1 always stay) that the projection never
  * references are dropped via an inner Project, which the standard
  * rules then push into the scan's ReadSchema.
  *
  * The two sides have different safety envelopes, because the exec's
  * tie-break sorts the RIGHT side by all its columns:
  *
  *  - LEFT payloads prune freely. Every left row maps 1:1 to an
  *    output row whose match depends only on its own (key, time);
  *    left-side order never reaches the output.
  *  - RIGHT payloads prune only as a contiguous TRAILING suffix of
  *    unused columns. The sort order over the kept columns is then a
  *    prefix of the original total order, so a dropped column can
  *    only reorder rows that are EQUAL on every kept column — rows
  *    whose kept (visible) values are identical, making the winner
  *    swap output-invariant. Dropping an unused column that precedes
  *    a kept one is NOT safe: tie rows (t, p1=5, p2=1) vs
  *    (t, p1=1, p2=9) with p1 unused output p2=1 under the original
  *    order but p2=9 once p1 stops participating in the sort.
  *
  * Injected by `GraftExtensions`.
  */
object AsOfJoinColumnPruning extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, j: AsOfJoinNode) if j.resolved =>
      val used = AttributeSet(projList.flatMap(_.references))
      def keep(child: LogicalPlan) =
        child.output.take(2) ++ child.output.drop(2).filter(used.contains)
      // right: keep everything up to (and including) the LAST used
      // payload — only the all-unused tail may go (tie-break safety).
      def keepTrailing(child: LogicalPlan) = {
        val payloads = child.output.drop(2)
        child.output.take(2) ++
          payloads.take(payloads.lastIndexWhere(used.contains) + 1)
      }
      val (kl, kr) = (keep(j.left), keepTrailing(j.right))
      if (kl.length == j.left.output.length &&
          kr.length == j.right.output.length) p
      else Project(projList, j.copy(
        left = if (kl.length == j.left.output.length) j.left
               else Project(kl, j.left),
        right = if (kr.length == j.right.output.length) j.right
                else Project(kr, j.right)))
  }
}

/** Plans [[AsOfJoinNode]] as [[AsOfJoinExec]]. Injected by
  * `GraftExtensions` (and defensively by the wrapper via
  * `spark.experimental.extraStrategies`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), dir, tol) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join (backward by default, forward on flag).
  *
  * Distribution/ordering requirements mirror `SortMergeJoinExec`:
  * both children hash-clustered on their key column, left sorted by
  * (key, time), right sorted by every column (key, time, payload…) so
  * the tie order is total. `EnsureRequirements` inserts the
  * exchanges/sorts and equalizes partition counts, after which
  * `zipPartitions` pairs co-clustered partitions.
  *
  * The merge itself is the textbook one-pass. Backward: advance the
  * right iterator while its (key, time) ≤ the current left
  * (key, time), remembering only the last right row seen for the
  * CURRENT left key. Forward: discard right rows strictly before the
  * probe; the buffered head IS the match, peeked not consumed so
  * successive lefts can share it. Either way O(1) state per
  * partition, no buffering, rows stream straight
  * into an unsafe projection. Not codegen'd: the operator holds
  * cross-row iterator state that whole-stage codegen's produce/consume
  * protocol cannot express without a full sort-merge template; the
  * single interpreted projection per output row is the same cost
  * profile as `SortMergeJoinExec`'s fallback path.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    direction: String = "backward", tolerance: Long = -1L)
    extends SparkPlan with BinaryExecNode {
  require(Seq("backward", "forward", "nearest").contains(direction),
    s"unknown as-of direction: $direction")
  // Staleness bound (pandas merge_asof `tolerance`): negative = none.
  // Applied per CANDIDATE before the nearest pick — a backward
  // candidate beyond the bound never shadows an in-bound forward one
  // — which for backward/forward degenerates to the same post-check
  // the composition operators use. The merge state machine is
  // untouched: candidates are still tracked unconditionally (a stale
  // candidate for THIS left row may be in-bound for a later one).

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(left.output.head)),
      ClusteredDistribution(Seq(right.output.head)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(left.output.head, Ascending),
      SortOrder(left.output(1), Ascending)),
    right.output.map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(left.output.head, Ascending),
      SortOrder(left.output(1), Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  // Real exec-node observability (what SortMergeJoinExec reports):
  // output rows == probe rows by the left-outer contract, so the
  // interesting number is matchedRows — the SQL UI shows at a glance
  // whether an as-of enrichment actually found payloads or silently
  // nulled everything (the classic mis-keyed-join symptom).
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "matchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rightWidth = right.output.length
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val matchedRows = longMetric("matchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      // bind against the NULLABLE output attrs — binding to
      // right.output's non-null attrs would skip the null check and
      // read garbage zeros from the all-null no-match row
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      if (direction == "forward") {
        // forward: the match is the right HEAD once everything
        // strictly before (k, t) is discarded — head = smallest
        // (key, time, payload) >= the probe, i.e. the earliest
        // matching time with the MIN payload tuple (firstLater's tie
        // rule). The head is peeked, never consumed: later left rows
        // may match it again. Zero copies — the row is projected
        // before the iterator advances.
        lIter.map { l =>
          val k = l.getLong(0)
          val t = l.getLong(1)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val h = rBuf.head
            val hk = h.getLong(0)
            if (hk < k || (hk == k && h.getLong(1) < t)) rBuf.next()
            else advancing = false
          }
          val hit = rBuf.hasNext && rBuf.head.getLong(0) == k &&
            (tolerance < 0 || rBuf.head.getLong(1) - t <= tolerance)
          numOutputRows += 1
          if (hit) matchedRows += 1
          outProj(joined(l, if (hit) rBuf.head else nullRight))
        }
      } else {
      // backward and nearest share the consuming state machine: the
      // last right row consumed for the current left key is the
      // backward candidate (.copy() because unsafe rows are reused);
      // nearest ALSO peeks the unconsumed head — the first strictly
      // later right — and picks by |Δt|, ties to the backward side
      // (AsOfJoin.nearest's distB <= distF rule).
      val isNearest = direction == "nearest"
      var lastKey = 0L
      var lastT = 0L
      var lastRow: InternalRow = null
      lIter.map { l =>
        val k = l.getLong(0)
        val t = l.getLong(1)
        if (lastRow != null && lastKey != k) lastRow = null
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val h = rBuf.head
          val hk = h.getLong(0)
          if (hk < k || (hk == k && h.getLong(1) <= t)) {
            if (hk == k) { lastKey = k; lastT = h.getLong(1)
              lastRow = h.copy() }
            rBuf.next()
          } else advancing = false
        }
        val back = if (lastRow != null && lastKey == k &&
          (tolerance < 0 || t - lastT <= tolerance)) lastRow else null
        val pick =
          if (!isNearest) back
          else {
            val fwd = if (rBuf.hasNext && rBuf.head.getLong(0) == k &&
              (tolerance < 0 || rBuf.head.getLong(1) - t <= tolerance))
              rBuf.head else null
            if (back == null) fwd
            else if (fwd == null) back
            else if (t - lastT <= fwd.getLong(1) - t) back else fwd
          }
        numOutputRows += 1
        if (pick != null) matchedRows += 1
        outProj(joined(l, if (pick != null) pick else nullRight))
      }
      }
    }
  }
}
