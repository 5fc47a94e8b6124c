package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BFS / single-source shortest hop count over an
  * undirected edge list — fixed-depth frontier relaxation (the Pregel
  * primitive behind reachability, radius probes, and "within k hops"
  * features).
  *
  * Round k relaxes every edge once: dist(v) = min(dist(v),
  * min over neighbours(dist(u) + 1)). After `maxDepth` rounds the
  * result holds exact hop counts for every node within `maxDepth` of
  * the source; unreached nodes are absent (no sentinel row).
  *
  * Scale shape: per round one keyed join (dists ⋈ edges) + one
  * min-aggregate by node — the same two-words-per-node shuffle as
  * PageRank/LabelPropagation, lineage truncated by localCheckpoint.
  * Min is associative/commutative, so partial aggregation applies and
  * partition order cannot drift the result — bit-exact replay in any
  * engine.
  */
object Bfs {

  /** @param edges undirected as directed pairs — symmetrized
    *              internally
    * @param source   the single source node id
    * @param maxDepth fixed relaxation rounds = max hop distance
    * @return (id, dist) for nodes with dist ≤ maxDepth */
  def hops(edges: DataFrame, source: Long, maxDepth: Int = 5): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    // edge materialization under normal AQE; the fixed-shape
    // relaxation loop runs + materializes under IterConf (scaladoc)
    val edgeRows = und.count()
    IterConf.materializeLoop(und.sparkSession, edgeRows,
        Seq(und)) { case Seq(u) =>
      var dists = u.sparkSession.range(1)
        .select(lit(source).as("id"), lit(0L).as("dist"))
      for (i <- 1 to maxDepth) {
        val relaxed = u
          .join(dists, col("src") === col("id"))
          .select(col("dst").as("id"), (col("dist") + 1L).as("dist"))
        val next = dists.union(relaxed)
          .groupBy("id").agg(min(col("dist")).as("dist"))
        dists = if (i % 5 == 0 || i == maxDepth)
          next.localCheckpoint(false)
        else next
      }
      dists
    }
  }
}
