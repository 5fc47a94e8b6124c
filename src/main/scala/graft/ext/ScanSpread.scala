package graft.ext

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan spreading (r17, guide §2.5 "input skew: one
  * huge unsplittable file", §6 input split sizing).
  *
  * The corpus tables arrive as parquet whose split count is bytes /
  * maxPartitionBytes — a 600 kB single-row-group documents.parquet is
  * ONE scan task no matter how many cores the cluster has. That is
  * correct for scan-bound queries, but the dedup/text operators
  * amplify each input row ~300x (shingle/gram explodes, one md5 per
  * gram) INSIDE the scan stage: measured at sf0.1/local[32], the
  * map leg of dedup_ngram's gram-distinct ran 2.3 s in a single task
  * while 31 cores idled — half the query.
  *
  * `spread` repartitions the input up to the cluster's default
  * parallelism ONLY when the planned scan has fewer partitions — the
  * decision derives from the actual input layout, not a constant: at
  * production scale the corpus scan already has >= cores splits and
  * this is the identity (no extra corpus shuffle); on a small or
  * badly-packed input it buys the amplification work full
  * parallelism for the price of shuffling the (small by premise)
  * input once. Streaming frames pass through untouched.
  *
  * Partitioning is round-robin (`repartition(n)`): deterministic
  * under retries (sort-before-repartition, SPARK-23207) and safe
  * here because every caller feeds a key-agnostic explode +
  * aggregation — no operator downstream depends on row placement.
  */
object ScanSpread {
  /** Partition count for WORK-heavy exchanges the operator knows are
    * compute-bound (quadratic pair generation, per-row vector math):
    * the larger of the cluster's core parallelism and its configured
    * shuffle width. AQE's coalescing is byte-based and collapses a
    * sub-MB shuffle to one partition — right for byte-bound stages,
    * wrong when each row fans out quadratic work (guide §2.5: size
    * partitions for the work, not the bytes, when you know better
    * than the planner). Scales with the deployment (both inputs are
    * cluster-sized confs), never a local constant.
    */
  def workParts(df: DataFrame): Int = {
    val spark = df.sparkSession
    math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "1").toInt)
  }

  /** Frames whose `.rdd` peek cannot run a job: a leaf relation under
    * projections/filters (and non-shuffle coalesce) only — no Exchange
    * anywhere, so there is no AQE query stage to materialize. Anything
    * else (joins, aggregates, shuffle repartitions, generators) is NOT
    * probed: under AQE, `.rdd` on an exchange-bearing frame finalizes
    * the adaptive plan and EXECUTES the upstream shuffle stages as
    * real jobs (ADVICE r17) — a silent double execution of the
    * caller's own work.
    */
  private def scanShaped(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Boolean = p match {
    case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
    case pr: org.apache.spark.sql.catalyst.plans.logical.Project =>
      scanShaped(pr.child)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
      scanShaped(f.child)
    // coalesce (shuffle = false) narrows partitions without an
    // exchange; a shuffle repartition does not match (r.shuffle)
    case r: org.apache.spark.sql.catalyst.plans.logical.Repartition
        if !r.shuffle => scanShaped(r.child)
    case _ => false
  }

  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    // documented opt-out (spark.graft.scan.spread=false): restores
    // the pre-r17 never-reshuffle plans — PlanShapeSpec uses it to
    // keep pinning that the operators themselves add no corpus
    // round-robin; ScanSpreadSpec pins the identity-on-wide-scans
    // behavior that makes this a no-op at production scale.
    if (df.sparkSession.conf.getOption("spark.graft.scan.spread")
        .exists(_.equalsIgnoreCase("false"))) return df
    val sc = df.sparkSession.sparkContext
    val target = sc.defaultParallelism
    // r18 guard (ADVICE r17 / VERDICT r17 #7): only probe PURE SCAN
    // shapes, where planning the RDD runs no job; derived frames pass
    // through untouched (the pre-r17 plan) instead of risking an eager
    // upstream execution just to read a partition count. Catches are
    // NonFatal so a genuine VM error propagates.
    val plan =
      try df.queryExecution.optimizedPlan
      catch { case scala.util.control.NonFatal(_) => return df }
    if (!scanShaped(plan)) return df
    // .rdd on a scan-shaped frame plans the scan without running a
    // job (no exchange => no AQE stage materialization); partition
    // count == what the query's own scan stage would get.
    val have = try df.rdd.getNumPartitions
      catch { case scala.util.control.NonFatal(_) => return df }
    if (have < target) df.repartition(target) else df
  }
}
