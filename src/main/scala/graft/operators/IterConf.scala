package graft.operators

import org.apache.spark.sql.SparkSession

/** Session-conf scope for fixed-shape iteration bodies (CC, PageRank,
  * k-core, label-prop, BFS): runs `body` with AQE disabled and the
  * shuffle partition count derived from the loop's OWN state size,
  * restoring both after.
  *
  * Why (r17 optimization round, guide §1.2/§2.2/§2.4): AQE executes
  * every Exchange as its own query-stage JOB — submit, re-optimize
  * the remaining plan, codegen the new stage, broadcast a task
  * binary — the right trade for one big adaptive query, but an
  * iterative loop pays that driver latency per exchange per round
  * while its plan shape never changes. Measured on the bench (sf0.1,
  * local[32]): the CC loop inside dedup_groups ran ~30 serial 1-task
  * jobs with 15-90 ms driver gaps between them — more than half the
  * query. AQE-off ALONE is worse (each tiny exchange then runs
  * spark.sql.shuffle.partitions near-empty tasks and joins plan as
  * unconsolidated SMJ: measured 2.15 s -> 4.73 s), so the partition
  * count must come with it: loop state is skinny keyed rows of KNOWN
  * count, so partitions = ceil(stateRows / rowsPerPartition) — the
  * explicit form of the coalescing AQE would have done at runtime,
  * without the per-stage replanning.
  *
  * Scale posture (NOT a local-mode constant): rowsPerPartition
  * defaults to 2M rows ≈ 30-60 MB of (long, long)/(long, double)
  * state — inside the guide's 100 MB-1 GB band after join/agg
  * amplification; override with spark.graft.loop.rowsPerPartition.
  * A billion-node graph gets ~500 partitions; 477 near-dup nodes at
  * sf0.1 get 1. The cap at the session's shuffle.partitions ceiling
  * never RAISES parallelism above what the deployment sized. AQE's
  * wins (coalescing corpus-sized scans, skew-splitting giant mining
  * joins) apply OUTSIDE the loop, where AQE stays on; loop
  * aggregations (min/sum by key) partial-aggregate map-side, so a
  * hot key ships one row per map partition, not its mass. Opt out
  * with spark.graft.loop.aqe=true to keep AQE inside loops too.
  */
object IterConf {
  /** Build-and-materialize a lazy loop result under the loop conf:
    * `body` must end in a LAZY localCheckpoint; the count() here
    * executes the whole fixed-shape loop as pipelined stages inside
    * the conf scope, so callers read cached blocks. With
    * spark.graft.loop.aqe=true this is the IDENTITY — the lazy frame
    * is returned un-executed and the loop runs under the caller's
    * first action with the session's normal AQE (the pre-r17
    * behavior; also how PlanShapeSpec pins the loop plan shape).
    */
  def materializeLoop(spark: SparkSession, stateRows: Long)
      (body: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val keep = spark.conf
      .getOption("spark.graft.loop.aqe").exists(_.toBoolean)
    if (keep) body
    else withLoopConf(spark, stateRows) { val df = body; df.count(); df }
  }

  /** True when the session opted out of loop materialization
    * (spark.graft.loop.aqe=true) — operators whose pre-r17 final
    * frame was NOT checkpointed use this to keep that plan visible. */
  def lazyLoop(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.loop.aqe").exists(_.toBoolean)

  def withLoopConf[T](spark: SparkSession, stateRows: Long)
      (body: => T): T = {
    val keep = spark.conf
      .getOption("spark.graft.loop.aqe").exists(_.toBoolean)
    if (keep) body
    else {
      val rowsPer = spark.conf
        .getOption("spark.graft.loop.rowsPerPartition")
        .map(_.toLong).getOrElse(2000000L)
      val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      val parts = math.max(1L, math.min(prevParts.toLong,
        (math.max(stateRows, 1L) + rowsPer - 1) / rowsPer))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try body
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        prevAqe match {
          case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
          case None => spark.conf.unset("spark.sql.adaptive.enabled")
        }
      }
    }
  }
}
