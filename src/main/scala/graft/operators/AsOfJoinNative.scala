package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftPlanBridge

import graft.plans.{AsOfJoinNode, AsOfJoinStrategy}

/** Public face of the native sort-merge as-of join
  * (`plans/AsOfJoinPlan.scala`): same semantics as
  * [[AsOfJoin.lastEarlier]] FOR NON-NULL KEYS — for every left row,
  * the latest right row with the same key and time ≤ the left time,
  * ties on (key, time) resolved to the largest payload tuple — but
  * executed by the custom physical operator instead of the union +
  * running-window composition. The one deliberate divergence: here a
  * null key/time NEVER matches (SQL equi-join semantics; such rows
  * come back with null payload), whereas lastEarlier's
  * `Window.partitionBy` groups null keys into one partition, so a
  * null-key left row there CAN pick up a null-key right payload.
  * Pinned by AsOfJoinNativeSpec's null-key differential.
  *
  * Shapes the inputs to the exec's contract: column 0 = key as LONG,
  * column 1 = time as LONG, right payload renamed to its output
  * names. Left rows with a null key/time can't enter the merge (they
  * have no sort position); they are unioned back with null payloads,
  * preserving `lastEarlier`'s left-outer semantics row for row.
  */
object AsOfJoinNative {

  /** @param leftKey/leftTime  integral-valued key/time expressions
    *                          over `left` (cast to LONG internally)
    * @param rightPayload      (outputName, expression-over-right) —
    *                          also the tie-break order for equal
    *                          (key, time) right rows
    * @return left columns + payload columns (null when no match) */
  def asofBackward(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)]): DataFrame =
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "backward")

  /** Forward variant — EARLIEST right row with time ≥ the left time,
    * ties on (key, time) to the SMALLEST payload tuple (exactly
    * [[AsOfJoin.firstLater]]'s first-in-frame rule). */
  def asofForward(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)]): DataFrame =
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "forward")

  /** Nearest variant — right row minimizing |Δt|, exact-distance ties
    * to the backward side (exactly [[AsOfJoin.nearest]]'s
    * distB <= distF rule). */
  def asofNearest(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)]): DataFrame =
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "nearest")

  /** Backward with a staleness bound (pandas merge_asof `tolerance`,
    * [[AsOfJoin.lastEarlierWithin]]'s semantics): a match older than
    * `tolerance` time units yields null payload. Unlike the
    * composition operator the bound is checked inside the single
    * merge pass — same halved-shuffle plan as [[asofBackward]]. */
  def asofBackwardWithin(left: DataFrame, leftKey: Column,
      leftTime: Column, right: DataFrame, rightKey: Column,
      rightTime: Column, rightPayload: Seq[(String, Column)],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0: $tolerance")
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "backward", tolerance)
  }

  /** Forward with a staleness bound: a match more than `tolerance`
    * AFTER the probe yields null payload. */
  def asofForwardWithin(left: DataFrame, leftKey: Column,
      leftTime: Column, right: DataFrame, rightKey: Column,
      rightTime: Column, rightPayload: Seq[(String, Column)],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0: $tolerance")
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "forward", tolerance)
  }

  /** Nearest with a staleness bound, pandas semantics: the bound
    * filters CANDIDATES before the |Δt| pick, so an out-of-bound
    * backward candidate never shadows an in-bound forward one. */
  def asofNearestWithin(left: DataFrame, leftKey: Column,
      leftTime: Column, right: DataFrame, rightKey: Column,
      rightTime: Column, rightPayload: Seq[(String, Column)],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0: $tolerance")
    asofJoin(left, leftKey, leftTime, right, rightKey, rightTime,
      rightPayload, "nearest", tolerance)
  }

  /** Skew-salted as-of join — the mitigation for ONE HOT KEY.
    *
    * `AsOfJoinExec` hash-clusters each side on its key, so a key that
    * dominates the probe stream lands in a single partition, and —
    * custom exec nodes not participating in AQE's runtime skew-join
    * split — stays there (AsOfJoinNativeSpec demonstrates the
    * behavior under a planted hot key). This wrapper applies the
    * standard salting recipe, adapted to as-of semantics: probes
    * scatter over `salts` sub-keys (key·salts + hash(time) % salts —
    * deterministic, re-run stable) while the VERSION side is
    * REPLICATED once per salt, so every sub-key partition holds the
    * key's FULL version history and the single-pass merge stays
    * correct in all three directions, tolerance included. Cost: the
    * right side shuffles ×salts — the usual replicate-the-small-side
    * tradeoff, right here because version tables are dwarfed by probe
    * streams. Requires |key| < Long.MaxValue / salts (the sub-key is
    * key·salts + salt) — ENFORCED per row on both sides: an
    * out-of-range key raises instead of silently aliasing another
    * (key, salt) composite.
    */
  def asofSalted(left: DataFrame, leftKey: Column, leftTime: Column,
      right: DataFrame, rightKey: Column, rightTime: Column,
      rightPayload: Seq[(String, Column)], salts: Int,
      direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val saltedLeft = guardedKey(leftKey.cast("long"), salts,
      "asofSalted") * salts + pmod(xxhash64(leftTime), lit(salts.toLong))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    asofJoin(left, saltedLeft, leftTime,
      replicated,
      guardedKey(rightKey.cast("long"), salts, "asofSalted") * salts +
        col("__salt"),
      rightTime, rightPayload, direction, tolerance)
  }

  /** Composite-key overflow guard for the salted/sharded wrappers: the
    * sub-key is key·mult + offset with offset in [-1, mult], so any
    * |key| > (Long.MaxValue - mult) / mult can wrap and ALIAS another
    * (key, offset) pair — a silent wrong JOIN, the worst failure mode.
    * Checked per row inside the same codegen'd projection that builds
    * the composite (no extra scan or job); a violating key raises a
    * contextual error instead. Null keys pass through — the join
    * wrappers already route them to the null-payload leg.
    */
  private def guardedKey(key: Column, mult: Int, op: String): Column = {
    val lim = (Long.MaxValue - mult) / mult
    when(key > lim || key < -lim,
      raise_error(concat(
        lit(s"$op: |key| exceeds $lim (factor $mult) — composite " +
          "sub-key would overflow long and alias another key; got "),
        key.cast("string"))))
      .otherwise(key)
  }

  /** Key + TIME-RANGE co-partitioned as-of join — the mitigation for
    * a hot key whose VERSION side is also large (where [[asofSalted]]
    * pays ×salts replication of the full version history).
    *
    * The probe time axis is cut into `shards` equal-width buckets
    * (bounds from one 2-scalar aggregate over the probes); each side
    * clusters on the composite (key·shards + bucket), so a hot key's
    * probes spread over `shards` partitions. Correctness across the
    * cut: a probe in bucket b may need a version from an EARLIER
    * bucket, so each left-occupied (key, bucket) is padded with ONE
    * carried row — the maximal (time, payload-tuple) version among
    * all buckets < b, i.e. exactly the row the exec's backward merge
    * would have picked from the past — computed from the
    * bucket-compacted version table (≤ shards+1 rows per key: the
    * per-bucket max-struct compaction is a balanced hash aggregate,
    * and all pre-range buckets collapse to one). Versions after the
    * last probe are dropped (backward can never match them).
    * Replication is ≤ 1 row per (key, occupied bucket) — independent
    * of version-history length, the structural win over salting.
    *
    * All three directions (tolerance supported: carried rows keep
    * their original time, so the staleness bound still evaluates
    * inside the merge). Backward carries the maximal earlier version
    * forward; forward carries the minimal later version backward
    * (earliest-later, min-payload-tuple ties — `firstLater`'s rule);
    * nearest carries BOTH, and the exec's |Δt| pick over {best
    * earlier, locals, best later} equals the global nearest. Versions
    * a direction can never match (after the last probe for backward,
    * before the first for forward) are dropped; the unmatchable-side
    * out-of-range buckets collapse to one sentinel each.
    * Requires |key| < Long.MaxValue / (shards + 1) — ENFORCED per row
    * on both sides (see [[guardedKey]]): an out-of-range key raises
    * instead of silently aliasing another (key, bucket) composite.
    */
  def asofTimeSharded(left: DataFrame, leftKey: Column,
      leftTime: Column, right: DataFrame, rightKey: Column,
      rightTime: Column, rightPayload: Seq[(String, Column)],
      shards: Int, direction: String = "backward",
      tolerance: Long = -1L): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    require(Set("backward", "forward", "nearest")(direction), direction)
    val bounds = left.agg(min(leftTime.cast("long")),
      max(leftTime.cast("long"))).head()
    if (bounds.isNullAt(0))
      // no mergeable probe: plain join degenerates to the same
      // all-null-payload output without the sharding machinery
      return asofJoin(left, leftKey, leftTime, right, rightKey,
        rightTime, rightPayload, direction, tolerance)
    val (minT, maxT) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (maxT - minT) / shards + 1L)
    // exact floor division (integer / truncates toward zero, wrong
    // for the negative pre-range buckets): (x - pmod(x,w)) / w — the
    // numerator is an exact multiple of w, so the double divide is
    // exact for |numerator| < 2^53 (micros timestamps: year < 2255)
    def fdiv(x: Column): Column = (x - pmod(x, lit(width))) / width
    val lb = fdiv(leftTime.cast("long") - minT).cast("long")

    // versions with named payload columns, bucketed; out-of-range
    // buckets collapse to the -1 / `shards` sentinels ("before every
    // probe bucket" / "after every probe bucket" alike), and the
    // side a direction can never match is dropped
    val named = rightPayload.map(_._1)
    val all = right
      .filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(rightKey.cast("long").as("__sk") +:
        rightTime.cast("long").as("__st") +:
        rightPayload.map { case (n, c) => c.as(n) }: _*)
      .withColumn("__sb",
        greatest(least(fdiv(col("__st") - minT).cast("long"),
          lit(shards.toLong)), lit(-1L)))
    val rBase = direction match {
      case "backward" => all.filter(col("__sb") < shards)
      case "forward"  => all.filter(col("__sb") >= 0)
      case "nearest"  => all
    }
    // left-occupied buckets (bounded: <= shards per key)
    val leftBk = left.filter(leftKey.isNotNull && leftTime.isNotNull)
      .select(leftKey.cast("long").as("__lk"), lb.as("__lb"))
      .distinct()
    // per-(key, bucket) compaction to the exec's tie orders: max
    // (time, payload-tuple) for the backward carry, min for the
    // forward carry — balanced hash aggregates regardless of key
    // heat, and the carry joins see <= shards+2 rows per key per side
    val vstruct = struct(col("__st") +: named.map(col): _*)
    def carry(agg: Column => Column, cond: Column): DataFrame =
      leftBk
        .join(rBase.groupBy(col("__sk"), col("__sb"))
            .agg(agg(vstruct).as("__v")),
          col("__lk") === col("__sk") && cond)
        .groupBy(col("__lk"), col("__lb"))
        .agg(agg(col("__v")).as("__v"))
        .select(col("__lk").as("__sk") +: col("__lb").as("__sb") +:
          col("__v.__st").as("__st") +:
          named.map(n => col(s"__v.$n").as(n)): _*)
    val earlier = carry(max, col("__sb") < col("__lb"))
    val later = carry(min, col("__sb") > col("__lb"))
    val carries = direction match {
      case "backward" => earlier
      case "forward"  => later
      case "nearest"  => earlier.unionByName(later)
    }
    val localRight = rBase
      .filter(col("__sb") >= 0 && col("__sb") < shards)
      .select(col("__sk") +: col("__sb") +: col("__st") +:
        named.map(col): _*)
    val shardedRight = localRight.unionByName(carries)
    asofJoin(left,
      guardedKey(leftKey.cast("long"), shards, "asofTimeSharded") *
        shards + lb, leftTime,
      shardedRight,
      guardedKey(col("__sk"), shards, "asofTimeSharded") * shards +
        col("__sb"), col("__st"),
      rightPayload.map { case (n, _) => n -> col(n) },
      direction, tolerance)
  }

  private def asofJoin(left: DataFrame, leftKey: Column,
      leftTime: Column, right: DataFrame, rightKey: Column,
      rightTime: Column, rightPayload: Seq[(String, Column)],
      direction: String, tolerance: Long = -1L): DataFrame = {
    val spark = left.sparkSession
    // idempotent defensive registration — GraftExtensions also injects
    // the strategy, but ad-hoc sessions may lack the extensions conf
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    val leftCols = left.columns.toSeq
    val mergeable = leftKey.isNotNull && leftTime.isNotNull
    val l2 = left.filter(mergeable)
      .select(leftKey.cast("long").as("__k") +:
        leftTime.cast("long").as("__t") +: leftCols.map(col): _*)
    val r2 = right.filter(rightKey.isNotNull && rightTime.isNotNull)
      .select(rightKey.cast("long").as("__rk") +:
        rightTime.cast("long").as("__rt") +:
        rightPayload.map { case (n, c) => c.as(n) }: _*)
    val joinedRows = GraftPlanBridge.ofRows(left,
      AsOfJoinNode(GraftPlanBridge.logicalPlan(l2),
        GraftPlanBridge.logicalPlan(r2), direction, tolerance))
    val outCols = leftCols.map(col) ++ rightPayload.map(p => col(p._1))
    val merged = joinedRows.select(outCols: _*)
    val leftovers = left.filter(!coalesce(mergeable, lit(false)))
      .select(leftCols.map(col) ++
        rightPayload.map { case (n, c) => lit(null).cast(
          r2.schema(n).dataType).as(n) }: _*)
    merged.unionByName(leftovers)
  }
}
