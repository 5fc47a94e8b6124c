package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components by iterative min-label propagation — the pass
  * that turns a near-duplicate PAIR list into dedup GROUPS (each doc
  * labeled with the smallest id reachable from it).
  *
  * Each round: (1) one-hop propagation — every node takes the min of
  * its own and its neighbors' labels (one keyed join + partial
  * aggregate); (2) pointer jumping — every node re-reads its LABEL's
  * label, doubling propagation distance, so convergence is O(log
  * diameter) rounds, not O(diameter) (a 30-node chain converges in ~5
  * rounds). `localCheckpoint` truncates lineage so plans stay O(1) per
  * round instead of nesting. Label state is (id, label) longs —
  * negligible shuffle payload at any scale.
  *
  * Round-shape study (round-5 ask: would 2-hop propagation — a second
  * `sym` join before the jump — halve rounds?): measured at sf0.1
  * (256 near-dup edges / 477 nodes, local[32], warm, min of 3, edges
  * pre-materialized) BOTH shapes converge in 2 rounds — dedup
  * components are shallow (pairs/short chains), so the jump already
  * reaches everything — and 2-hop is ~18% slower (1.13s vs 1.33s for
  * the full run) because the third join+shuffle per round buys
  * nothing. Identical outputs (exceptAll both ways = 0). 2-hop only
  * pays on deep-chain graphs where rounds, not per-round cost,
  * dominate; near-dup dedup is not that graph, so the simpler shape
  * stays. (The dedup_groups query's remaining cost is the pair
  * MINING, not this loop: the loop is ~1.1s of the 4.2s query.)
  */
object ConnectedComponents {

  /** @param edges (id_a, id_b) undirected edge list
    * @return (id, label) for every endpoint id; label = min id of its
    *         component (deterministic).
    */
  def labels(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // Symmetrized edges PLUS self-loops: every node then receives its
    // own label in the propagation join, so each round is a pure
    // join + aggregate — no in-loop Union (Union over join-derived
    // children trips Catalyst's union constraint rewriting).
    val bidir = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    // The edge-producing plan (often corpus-sized pair MINING) runs
    // under this eager checkpoint with the session's normal AQE.
    val sym = bidir
      .union(bidir.select(col("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // r18: the label loop runs on the CALLER'S session under normal
    // AQE. The r17 loop-conf scope (AQE off + derived partitions) was
    // re-measured with same-window A/Bs after the r18 isolation
    // rewrite and REVERTED for this loop: unlike the pipelined graph
    // loops (PageRank/BFS/k-core/label-prop, which materialize many
    // rounds under ONE action and keep IterConf), the CC loop runs a
    // convergence ACTION every round either way, so the scope saves no
    // jobs — and the adaptive per-round plans (runtime broadcasts of
    // the skinny label relation) measured consistently faster:
    // dedup_groups 2.5 vs 3.2 s, dedup_embed_ann_groups 1.9 vs 3.7 s,
    // dedup_survivors 2.9 vs 3.4 s, pipeline_split_leakfree 2.6 vs
    // 3.5 s (warm min-of-3, control-normalized). Also one action fewer
    // (the loop-sizing count is gone).
    labelLoop(sym, maxIter)
  }

  private def labelLoop(sym: DataFrame, maxIter: Int): DataFrame = {
    // FUSED one-hop seed (r17): with identity initial labels, round
    // 1's propagation is exactly min(src) grouped by dst — so seed
    // with that aggregate directly (one exchange, no join) instead of
    // an identity-label distinct plus a full first round. Same
    // fixpoint: seed labels sit between identity and the component
    // min (label(v) = min(N(v) ∪ {v}) — self-loops put every node in
    // its own neighborhood), min-propagation is monotone
    // non-increasing and preserves label(v) ∈ v's component, and the
    // component-min node m keeps label m (its neighbors' ids all
    // exceed its component min = m). Shallow near-dup graphs now
    // converge one Σ-checked round earlier.
    var labels = sym.groupBy(col("dst").as("id"))
      .agg(min(col("src")).as("label"))
      .localCheckpoint(false)
    // Convergence detection piggybacks on the checkpoint job: per-node
    // labels are monotonically non-increasing (min-propagation with
    // self-loops, then least() in the jump), so Σlabel strictly
    // decreases while any node improves and is stable exactly at
    // convergence. Summing in DECIMAL(38,0) keeps the total exact at
    // any node count. Each lazy checkpoint materializes under the same
    // action as its sum — ONE Spark job per round (was two: eager
    // checkpoint + a join-with-old-labels count). Seeding prevSum with
    // the initial Σlabel (same job that materializes the seed labels)
    // lets an already-converged input exit after round 0.
    def labelSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("label").cast(DecimalType(38, 0)))).first()
        .getDecimal(0))
    var prevSum: Option[java.math.BigDecimal] = labelSum(labels)
    var iter = 0
    var done = prevSum.isEmpty // no nodes at all
    while (!done && iter < maxIter) {
      val prop = sym.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min("label").as("label"))
        .select(col("dst").as("id"), col("label"))
      // pointer jump: follow one more level of indirection (labels are
      // themselves node ids, so every label has a row in `prop`).
      val jumped = prop.as("p")
        .join(prop.select(col("id").as("lid"), col("label").as("llab"))
          .as("q"), col("p.label") === col("lid"))
        .select(col("p.id").as("id"),
          least(col("p.label"), col("llab")).as("label"))
        .localCheckpoint(false)
      val sumNow = labelSum(jumped)
      labels = jumped
      // A null Σ mid-loop cannot mean "no rows" — the node set is
      // fixed after seeding — so (with ANSI off) its only source is
      // DECIMAL(38,0) sum overflow (~1e19 nodes). Fail loudly instead
      // of silently reporting convergence with wrong labels.
      if (sumNow.isEmpty)
        throw new IllegalStateException(
          "connected-components: label sum overflowed DECIMAL(38,0)")
      done = sumNow == prevSum
      prevSum = sumNow
      iter += 1
    }
    labels
  }

  /** Incremental fold of NEW edges into a committed (id, label)
    * groups table — the batch-append CC shared by the MinHash and ANN
    * groups lifecycles. New edges can only (a) join existing groups,
    * (b) form new ones, or (c) MERGE groups they bridge, so CC runs
    * over the SUPER-NODE graph (each endpoint replaced by its
    * committed label, or itself when unlabeled — bounded by the new
    * edges' reach, never corpus-sized) and members of merged groups
    * relabel through the resulting label map. Equal to a full
    * rebuild's labels: existing components stay internally connected,
    * and the min of a merged component is the min over its super-node
    * ids since every member id >= its group's label.
    *
    * @param groups committed (id, label) — label = min id of group
    * @param newPairs new undirected edges (id_a, id_b), self-loops
    *                 allowed (dropped)
    * @return the updated (id, label), lazily planned — callers
    *         materialize before overwriting the groups table
    */
  def foldIncrement(groups: DataFrame, newPairs: DataFrame)
      : DataFrame = {
    val g = groups.localCheckpoint(false)
    val superEdges = newPairs
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"))
      .join(g.select(col("id").as("id_a"), col("label").as("__la")),
        Seq("id_a"), "left")
      .join(g.select(col("id").as("id_b"), col("label").as("__lb")),
        Seq("id_b"), "left")
      .select(coalesce(col("__la"), col("id_a")).as("id_a"),
        coalesce(col("__lb"), col("id_b")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val comp = labels(superEdges).localCheckpoint(true)
    // members of touched groups relabel through the (old label ->
    // final label) map; super-nodes that were never members (batch
    // ids, previously-unpaired ids) enter as fresh rows
    val relabeled = g
      .join(comp.select(col("id").as("label"),
        col("label").as("__nl")), Seq("label"), "left")
      .select(col("id"),
        coalesce(col("__nl"), col("label")).as("label"))
    val freshRows = comp
      .join(g.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("label"))
    relabeled.unionByName(freshRows)
  }

  /** The delete-fold relabel shared by the groups lifecycles: given
    * the committed (id, label) groups, the TOUCHED group labels (those
    * that lost a member), and the freshly recomputed (id, label)
    * components over the touched groups' survivors, produce the
    * updated groups — untouched rows keep their label, touched rows
    * take their re-mined label or DROP when left unpaired (the
    * "unpaired docs are absent" contract; deleted ids are touched and
    * never re-mined, so they drop too). One join-based relabel over
    * `groups` — NOT a union of the untouched and re-mined halves
    * (Union over those join-derived children trips Catalyst's union
    * constraint rewriting even behind checkpoints). Lazily planned —
    * callers materialize before overwriting the groups table.
    */
  def foldDelete(groups: DataFrame, touchedLabels: DataFrame,
      relabeled: DataFrame): DataFrame =
    groups
      .join(touchedLabels.select(col("label"))
        .withColumn("__t", lit(true)), Seq("label"), "left")
      .join(relabeled.select(col("id"), col("label").as("__nl")),
        Seq("id"), "left")
      .filter(col("__t").isNull || col("__nl").isNotNull)
      .select(col("id"),
        when(col("__t").isNotNull, col("__nl"))
          .otherwise(col("label")).as("label"))
}
