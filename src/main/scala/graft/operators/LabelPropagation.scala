package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Synchronous label-propagation community detection (Raghavan et al.
  * 2007) over an undirected edge list — fixed iteration count.
  *
  * Each round every node adopts the most frequent label among its
  * neighbours, ties broken by the SMALLEST label — with synchronous
  * updates and a total tie order the result is a pure function of the
  * graph, unlike the usual async/random-order formulation, so a
  * fixed-unroll SQL oracle replays it exactly.
  *
  * Scale shape mirrors PageRank: per round one keyed join (labels ⋈
  * edges on dst) + one hash aggregate (count by node, label) + one
  * per-node window (partitioned by node id — never global); label
  * state is (id, label), two words per node through every shuffle;
  * `localCheckpoint` keeps the plan O(1) per round. The per-node
  * neighbour-label count table is bounded by degree, so a hub node
  * costs one skewed aggregate key, not a cartesian.
  */
object LabelPropagation {

  /** @param edges undirected as directed pairs — symmetrized +
    *              dedup'd internally, so pass each edge once in
    *              either direction
    * @param iterations fixed synchronous rounds
    * @return (id, label) — nodes sharing a label are one community */
  def propagate(edges: DataFrame, iterations: Int = 5): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(false)
    // edge materialization under normal AQE; the fixed-shape rounds
    // run + materialize under IterConf (see its scaladoc)
    val edgeRows = und.count()
    IterConf.materializeLoop(und.sparkSession, edgeRows,
        Seq(und)) { case Seq(u) =>
      var labels = u.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label"))
        .localCheckpoint(false)
      val byFreqThenMin = Window.partitionBy("nid")
        .orderBy(col("cnt").desc, col("label").asc)
      for (i <- 1 to iterations) {
        val next = u
          .join(labels, col("dst") === col("id"))
          .groupBy(col("src").as("nid"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(byFreqThenMin))
          .filter(col("rn") === 1)
          .select(col("nid").as("id"), col("label"))
        labels = if (i % 5 == 0 || i == iterations)
          next.localCheckpoint(false)
        else next
      }
      labels
    }
  }
}
