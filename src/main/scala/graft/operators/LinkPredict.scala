package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor link prediction (Liben-Nowell & Kleinberg 2003's
  * baseline) — for every NON-adjacent vertex pair at distance 2,
  * count shared neighbors and rank the strongest candidate links:
  * the related-page / co-citation suggestion pass over a link
  * corpus, and the integer-exact core of Adamic-Adar style scoring.
  *
  * Wedge enumeration through a center c is inherently O(Σ deg(c)²) —
  * unlike triangle counting, EVERY wedge matters, so degree
  * orientation cannot bound it. The scale lever is the one real
  * pipelines use: hub exclusion. Centers with degree > `maxDeg` are
  * dropped before the wedge self-join (a supernode's neighborhood
  * pairs are near-meaningless as link evidence and quadratically
  * dominant as work — the LSH mega-bucket guard's analog here), so
  * per-center fan-out is bounded by maxDeg² and no task can
  * degenerate. Scores are then undercounts THROUGH hubs only,
  * which is the standard tradeoff and is documented at the call
  * site.
  *
  * Plan shape: distinct undirected edges → degree aggregate →
  * center-filtered symmetric adjacency → wedge self-join on the
  * center → pair count aggregate → anti join against existing edges
  * → top-k as TakeOrderedAndProject (bounded per-partition heaps,
  * never a global sort). All integer counts — exact, no seams.
  */
object LinkPredict {

  /** @param edges (id_a, id_b) undirected edge list (dups/self-loops
    *              tolerated)
    * @param maxDeg hub-exclusion cap on wedge-center degree
    * @param minCommon minimum shared-neighbor count to report
    * @param k number of predictions, ranked (cn desc, u, v)
    * @return (u, v, cn) with u < v, non-adjacent, cn = common
    *         neighbors counted through non-hub centers
    */
  def commonNeighbors(edges: DataFrame, maxDeg: Int, minCommon: Int,
      k: Int): DataFrame = {
    val und = edges
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false) // degree agg + adjacency + anti join
    val deg = und.select(col("u").as("x"))
      .union(und.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val adj = und.select(col("u").as("c"), col("v").as("n"))
      .union(und.select(col("v").as("c"), col("u").as("n")))
      .join(deg.filter(col("d") <= maxDeg).select(col("x").as("c")),
        Seq("c"), "left_semi")
      .localCheckpoint(false) // both wedge legs
    val pairs = adj.as("a")
      .join(adj.as("b"),
        col("a.c") === col("b.c") && col("a.n") < col("b.n"))
      .groupBy(col("a.n").as("u"), col("b.n").as("v"))
      .agg(count(lit(1)).as("cn"))
    pairs
      .join(und, Seq("u", "v"), "left_anti")
      .filter(col("cn") >= minCommon)
      .orderBy(col("cn").desc, col("u"), col("v"))
      .limit(k)
  }
}
