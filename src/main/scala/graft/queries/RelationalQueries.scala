package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Tables._

/** Extended relational surface (SURVEY §2.2): aggregation, joins of
  * every flavor, windows, sorts/top-k, set ops, rollup, distinct —
  * phrased TPC-H-style over the testdata.
  *
  * Cross-engine float determinism: double SUMs are order-dependent,
  * so every aggregated measure is cast to DECIMAL before SUM (exact,
  * associative) and the final result cast back to DOUBLE — DuckDB
  * oracles do the same. Per-row double arithmetic (e.g.
  * `price * (1 - discount)`) is identical IEEE in both engines.
  *
  * Scale posture: dimension joins broadcast (region/nation/customer
  * are orders-of-magnitude smaller than lineitem); fact-fact joins
  * shuffle on their keys and AQE handles skew; aggregations are
  * partial (map-side combine) by construction of groupBy().agg().
  */
object RelationalQueries {

  /** One round-trip scratch dir per JVM, NOT per invocation: repeated
    * Bench sweeps and Verify runs overwrite the same tree instead of
    * accumulating ORC/parquet garbage in /tmp, and a shutdown hook
    * removes it on exit (ADVICE r9). */
  private lazy val scratchDir: String = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }))
    p.toString
  }

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))
  private def decSum(c: org.apache.spark.sql.Column, alias: String) =
    sum(dec(c)).cast("double").as(alias)
  /** Revenue in DECIMAL end-to-end: price and discount are 2dp money
    * values, so their double→DECIMAL(·,2) casts are unambiguous (the
    * stored double sits ~1e-9 from the 2dp value, far from any
    * rounding boundary), and every later step — subtract, multiply,
    * sum — is exact. Rounding the double PRODUCT instead (the old
    * DECIMAL(28,10) cast) diverged from DuckDB at sf0.1: its
    * double→decimal cast is itself lossy at the 10th decimal, drifting
    * the total by ~4e-7 over 5e4 rows.
    */
  /** The exact per-row revenue product — every conditional/windowed
    * variant must use THIS expression so a precision change reaches
    * all of them (and their oracles) at once. */
  private def revenueProduct: org.apache.spark.sql.Column =
    dec(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(4, 2)) -
        col("l_discount").cast(DecimalType(4, 2)))
  private def revenueSum(alias: String) =
    sum(revenueProduct).cast("double").as(alias)

  /** Production-shape approximate profiling: one scan, one partial
    * aggregate, no Expand — every distinct count is an HLL sketch
    * (rsd 0.01). This is the pass you run first over 100 TB of
    * unknown data; exact profile_stats stays for small tables.
    * PlanShapeSpec pins the Expand-free plan.
    */
  def profileStatsApprox(orders: DataFrame): DataFrame =
    orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
        .as("null_custkey"),
      approx_count_distinct(col("o_custkey"), 0.01).as("a_custkey"),
      approx_count_distinct(col("o_orderstatus"), 0.01).as("a_status"),
      approx_count_distinct(col("o_orderpriority"), 0.01).as("a_priority"),
      min(col("o_totalprice")).as("min_price"),
      max(col("o_totalprice")).as("max_price"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: scan-heavy partial aggregation.
    "q1_agg" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          decSum(col("l_quantity"), "sum_qty"),
          decSum(col("l_extendedprice"), "sum_base_price"),
          revenueSum("sum_disc_price"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
            .as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // TPC-H Q3 shape: selective dim filter → broadcast → top-k.
    "q3_join_topk" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = orders(s, d)
        .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(revenueSum("revenue"),
          max(unix_timestamp(col("o_orderdate"))).as("o_date_epoch"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20.
    // The fact side reduces FIRST (filter + groupBy custkey via the
    // orders join), so the customer/nation attribute joins see one
    // row per customer — at 100 TB the pre-aggregation, not the
    // attribute join, carries the data volume. Revenue is decimal
    // end-to-end (exact → deterministic ordering).
    "q10_returned" -> ((s, d) => {
      val l = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          revenueProduct.as("rev"))
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val per = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum(col("rev")).as("revd"))
      per
        .join(customer(s, d).select("c_custkey", "c_name", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .orderBy(desc("revd"), col("c_custkey"))
        .limit(20)
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          col("revd").cast("double").as("revenue"))
    }),

    // TPC-H Q18 shape: large-volume orders — the fact self-reduction
    // (groupBy orderkey, HAVING on the sum) runs before any
    // dimension join, so the join input is the tiny qualifying set.
    "q18_large_orders" -> ((s, d) => {
      val big = lineitem(s, d).groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("sum_qty_d"))
        .filter(col("sum_qty_d") > 150)
      big.join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"),
          col("sum_qty_d").cast("double").as("sum_qty"))
    }),

    // TPC-H Q5 shape: snowflake join chain, broadcast dims, one fact
    // shuffle join (orders⋈lineitem), supplier-nation co-location
    // condition.
    "q5_multi_join" -> ((s, d) => {
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val n = nation(s, d).join(broadcast(r),
        col("n_regionkey") === col("r_regionkey")).select("n_nationkey", "n_name")
      val c = customer(s, d).join(broadcast(n),
        col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
      val o = orders(s, d).select("o_orderkey", "o_custkey")
      val l = lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .groupBy("n_name")
        .agg(revenueSum("revenue"))
    }),

    // Window: top-3 orders per customer.
    "window_topk" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    }),

    // Skew-safe two-phase top-k (operators/TopK): salted pre-window
    // bounds any task's share of a hot key; same RESULT as the plain
    // window — the oracle is window_topk's SQL verbatim, so the
    // equivalence is hash-checked, not just spec'd.
    "window_topk_salted" -> ((s, d) =>
      graft.operators.TopK.topKPerKey(
        orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
        Seq("o_custkey"),
        Seq(desc("o_totalprice"), col("o_orderkey")), k = 3)
        .withColumnRenamed("rank", "rn")),

    // Running aggregate window over a partition. The driver data has
    // duplicate (l_orderkey, l_linenumber) pairs, so the ROWS-frame
    // order must ALSO sort the summed column itself — otherwise the
    // running values at a tie depend on physical row order (green at
    // sf0.1 only by shuffle luck; diverged at the derived sf1.0).
    // With (linenumber, quantity) ties the two orders give identical
    // sums, so the output is a pure function of the data.
    "window_running" -> ((s, d) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      lineitem(s, d).filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
          sum(dec(col("l_quantity"))).over(w).cast("double")
            .as("running_qty"))
    }),

    // Global sort + limit with a total tiebreak.
    "sort_limit" -> ((s, d) =>
      lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(desc("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"))
        .limit(25)),

    // Set operations: UNION ∪, then EXCEPT.
    "set_ops" -> ((s, d) => {
      val building = customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
      val bigSpenders = orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("key")).distinct()
      val negative = customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("key"))
      building.union(bigSpenders).distinct().except(negative)
    }),

    // Intersection.
    "set_intersect" -> ((s, d) => {
      val building = customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("key"))
      val withOrders = orders(s, d).select(col("o_custkey").as("key"))
      building.intersect(withOrders)
    }),

    // ROLLUP grouping sets.
    "rollup_agg" -> ((s, d) =>
      orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          decSum(col("o_totalprice"), "sum_price"))),

    // CUBE grouping sets.
    "cube_agg" -> ((s, d) =>
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))),

    // Exact distinct aggregation (shuffle-dedup under the hood).
    "distinct_agg" -> ((s, d) =>
      lineitem(s, d).agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))),

    // Approximate distinct (HLL) — scale path. Driver-verifiable as a
    // bounded-error assertion: the query outputs per-column booleans
    // |approx - exact| / exact <= 3·rsd (rsd = 0.01 → 3σ bound), and
    // the oracle is the constant row (true, true). The exact counts
    // ride in the same aggregate purely to ground the bound; the
    // production approx-only shape is profile_stats_approx below.
    "approx_distinct" -> ((s, d) =>
      lineitem(s, d).agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("a_parts"),
        countDistinct(col("l_partkey")).as("e_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("a_orders"),
        countDistinct(col("l_orderkey")).as("e_orders"))
        .select(
          (abs(col("a_parts") - col("e_parts")) <=
            col("e_parts") * (3 * 0.01)).as("parts_ok"),
          (abs(col("a_orders") - col("e_orders")) <=
            col("e_orders") * (3 * 0.01)).as("orders_ok"))),

    // Grouped HLL sketch: per-priority approximate distinct customers,
    // 3-sigma bound checked PER GROUP against the exact count (the
    // grouped face of approx_distinct; oracle is the group keys +
    // constant truth).
    "approx_distinct_by" -> ((s, d) =>
      orders(s, d).groupBy("o_orderpriority").agg(
        approx_count_distinct(col("o_custkey"), 0.01).as("a_cust"),
        countDistinct(col("o_custkey")).as("e_cust"))
        .select(col("o_orderpriority"),
          (abs(col("a_cust") - col("e_cust")) <=
            col("e_cust") * (3 * 0.01)).as("cust_ok"))),

    // Sketch PERSIST + MERGE — the two-level shape 100 TB profiling
    // actually runs: per-shard Datasketches HLL sketches (here one per
    // event_type) are built in one pass, stored as binary, and
    // union-merged later into the global estimate — no re-scan of the
    // raw data. Bound-checked like approx_distinct: merged estimate
    // within 3σ (lgK=12 → rse ≈ 1.04/2^6 ≈ 1.6%) of exact, and merge
    // must agree with the direct single-pass sketch to the same bound.
    "approx_hll_merge" -> ((s, d) => {
      val ev = events(s, d)
      val merged = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id"), 12).as("sk"))
        .agg(count(lit(1)).as("n_shards"),
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val direct = ev.agg(
        countDistinct(col("user_id")).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12))
          .as("est_direct"))
      merged.crossJoin(direct).select(
        col("n_shards"), col("n_exact"),
        (abs(col("est_merged") - col("n_exact")) <=
          col("n_exact") * (3 * 0.016)).as("merged_ok"),
        (abs(col("est_merged") - col("est_direct")) <=
          col("n_exact") * (3 * 0.016)).as("merge_consistent"))
    }),

    // Semi join (EXISTS): customers having ≥1 big order.
    "join_semi" -> ((s, d) => {
      val big = orders(s, d).filter(col("o_totalprice") > 300000)
      customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    }),

    // Anti join (NOT EXISTS): customers with no high-value orders.
    "join_anti" -> ((s, d) =>
      customer(s, d)
        .join(orders(s, d).filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))),

    // Outer join with null handling.
    "join_outer" -> ((s, d) => {
      val perCust = orders(s, d).groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
      customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
    }),

    // JSON extraction (scalar functions over semi-structured data).
    "events_json" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // Time-bucketed aggregation (the batch face of the streaming
    // pipeline — same expressions run under readStream).
    "events_window" -> ((s, d) =>
      events(s, d)
        .groupBy(
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          decSum(col("value"), "sum_value"))),

    // IN-subquery (SQL surface; Catalyst rewrites to a semi join —
    // same physical shape as join_semi, declared at the SQL layer).
    "subquery_in" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_custkey, c_name FROM g_customer
               WHERE c_custkey IN (SELECT o_custkey FROM g_orders
                                   WHERE o_totalprice > 300000.0)""")
    }),

    // Correlated scalar subquery: orders priced above 3× their own
    // average line price. Catalyst decorrelates to an aggregate +
    // join — no per-row re-execution.
    "subquery_scalar" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("g_orders")
      lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""SELECT o_orderkey, o_totalprice FROM g_orders o
               WHERE o_totalprice >
                 (SELECT 3.0 * avg(l_extendedprice) FROM g_lineitem l
                  WHERE l.l_orderkey = o.o_orderkey)""")
    }),

    // LATERAL correlated subquery (per-customer top order by value).
    "join_lateral" -> ((s, d) => {
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c.c_custkey, o.max_price, o.n_big
               FROM g_customer c
               JOIN LATERAL (
                 SELECT max(o_totalprice) AS max_price,
                        count(*) AS n_big
                 FROM g_orders
                 WHERE o_custkey = c.c_custkey
                   AND o_totalprice > 100000.0) o
               WHERE o.n_big > 0""")
    }),

    // Data profiling: per-column row/null/distinct counts in ONE scan
    // (multiple count-distincts expand, but each is partial-agg'd) —
    // the first pass a pipeline runs over unknown data.
    // Functional-dependency audit — the data-quality primitive behind
    // key discovery and join-safety checks (does A determine B?): per
    // candidate FD, the count of LHS values mapping to more than one
    // RHS value. Each check is one domain-bounded two-level aggregate
    // (group by LHS, count-distinct RHS, then one row out) — no FD
    // ever materializes more than |distinct LHS| rows. Candidates
    // cover a true key (orderkey→custkey), a false dependency
    // (custkey→orderstatus), a fact-side non-key (orderkey→suppkey on
    // lineitem), and a dimension hierarchy (nation→region).
    "profile_fd" -> ((s, d) => {
      def fd(df: org.apache.spark.sql.DataFrame, lhs: String,
          rhs: String) =
        df.groupBy(lhs).agg(countDistinct(rhs).as("nd"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("nd") > 1, 1L).otherwise(0L))
              .as("n_violating"))
          .select(lit(s"$lhs->$rhs").as("fd"), col("n_lhs"),
            col("n_violating"))
      fd(orders(s, d), "o_orderkey", "o_custkey")
        .unionByName(fd(orders(s, d), "o_custkey", "o_orderstatus"))
        .unionByName(fd(lineitem(s, d), "l_orderkey", "l_suppkey"))
        .unionByName(fd(nation(s, d), "n_nationkey", "n_regionkey"))
    }),

    "profile_stats" -> ((s, d) =>
      orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("null_custkey"),
        countDistinct(col("o_custkey")).as("d_custkey"),
        countDistinct(col("o_orderstatus")).as("d_status"),
        countDistinct(col("o_orderpriority")).as("d_priority"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))),

    // Scale-shape profiling: the 100 TB variant of profile_stats.
    // Exact multi-countDistinct expands the scan once per distinct
    // column (3× here); profileStatsApprox swaps them for HLL sketches
    // so the plan is a single partial-agg'd scan with NO Expand
    // (pinned in PlanShapeSpec). The driver query grounds the approx
    // counts with a 3σ bounded-error check against an exact leg — the
    // exact leg exists only to verify, not in the production shape.
    "profile_stats_approx" -> ((s, d) => {
      val exact = orders(s, d).agg(
        countDistinct(col("o_custkey")).as("e_custkey"),
        countDistinct(col("o_orderstatus")).as("e_status"),
        countDistinct(col("o_orderpriority")).as("e_priority"))
      profileStatsApprox(orders(s, d)).crossJoin(exact).select(
        col("n_rows"), col("null_custkey"),
        col("min_price"), col("max_price"),
        (abs(col("a_custkey") - col("e_custkey")) <=
          col("e_custkey") * (3 * 0.01)).as("d_custkey_ok"),
        (abs(col("a_status") - col("e_status")) <=
          col("e_status") * (3 * 0.01)).as("d_status_ok"),
        (abs(col("a_priority") - col("e_priority")) <=
          col("e_priority") * (3 * 0.01)).as("d_priority_ok"))
    }),

    // Z-order (Morton) key for multi-column clustering: the value a
    // maintenance pass sorts by so range boxes on custkey AND/OR price
    // both prune files (layout proof in ZOrderSpec; this query pins
    // the interleave arithmetic cross-engine). Pure integer bit ops —
    // exact, map-side, one scan.
    // ORC source/sink roundtrip — the third columnar format next to
    // parquet and the all-string CSV/xlsx path: a lineitem slice is
    // written as ORC and read back, and the aggregate over the
    // ROUNDTRIPPED data must hash-equal the oracle's aggregate over
    // the original parquet — write/read fidelity (types, timestamps
    // under the pinned UTC session, decimal-exact sums) is exactly
    // what the equality proves. Predicate/projection pushdown works
    // on the ORC scan the same as parquet (native vectorized reader).
    "source_orc" -> ((s, d) => {
      val tmp = s"$scratchDir/orc_roundtrip"
      lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .filter(col("l_quantity") > 5.0)
        .groupBy(year(col("l_shipdate")).as("y"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
    }),

    // Partitioned-layout write + PRUNED read: orders lands in a
    // year=YYYY directory tree, and the filtered read-back must touch
    // only two partitions — the plan pin asserts PartitionFilters
    // carries the year predicate (pruning happens at file listing,
    // before any I/O: the 100 TB table-layout primitive). The
    // aggregate over the pruned read hash-equals the oracle's over
    // the original parquet, proving the layout round-trip loses
    // nothing.
    "source_partitioned" -> ((s, d) => {
      val tmp = s"$scratchDir/part_roundtrip"
      orders(s, d)
        .withColumn("year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("year").parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("year") >= 1997 && col("year") <= 1998)
        .groupBy(col("year").cast("long").as("year"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).cast("double").as("rev"))
    }),

    // XLSX source/sink ROUNDTRIP — the custom Excel format becomes
    // first-class: nation is exported through the DISTRIBUTED sharded
    // sink (one workbook per partition, task-attempt commit protocol,
    // no driver collect) and read back through the StAX reader; the
    // read-back must hash-equal the oracle's display-string view of
    // the original parquet — write fidelity (XML escaping, dense cell
    // grid, per-part header rows) is exactly what the equality
    // proves. Scale model: xlsx caps at ~1M rows per workbook by
    // format, so a big export shards by partition and a big import
    // parallelizes by file (one task per workbook).
    "source_xlsx_roundtrip" -> ((s, d) => {
      val tmp = s"$scratchDir/xlsx_roundtrip"
      graft.sources.Xlsx.writeSharded(
        nation(s, d).repartition(3), tmp)
      graft.sources.Xlsx.read(s, s"$tmp/*.xlsx")
    }),

    // JSONL source/sink ROUNDTRIP — line-delimited JSON is the
    // interchange format training-data pipelines actually exchange
    // (crawl dumps, HF datasets, eval sets), so the engine must
    // round-trip it losslessly: documents is exported as gzip'd
    // JSONL sharded across files (each file = one read task — the
    // scan-parallelism unit, since gzip'd text is not splittable)
    // and read back with an EXPLICIT schema (schema inference is a
    // second full pass over 100 TB; production always passes the
    // schema). Full-row hash equality against the original parquet
    // is the fidelity proof — quotes, newlines and unicode in `text`
    // survive JSON string escaping verbatim.
    "source_jsonl_roundtrip" -> ((s, d) => {
      val tmp = s"$scratchDir/jsonl_roundtrip"
      val docs = s.read.parquet(s"$d/documents.parquet")
      docs.repartition(4)
        .write.mode("overwrite").option("compression", "gzip")
        .json(tmp)
      s.read.schema(docs.schema).json(tmp)
        .select(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))
    }),

    // Bucketed-layout write + CO-LOCATED join read-back: both sides
    // land bucketed by the join key into the same bucket count, so
    // the sort-merge join needs NO shuffle exchange on either side —
    // the at-rest co-location primitive that deletes the biggest
    // repeated cost of a 100 TB fact⋈fact pipeline (ScaleShapeSpec
    // proves the exchange-free plan; PlanShapeSpec pins it for THIS
    // query). The merge hint forces SMJ so the pin is meaningful at
    // oracle scale where the dim side would otherwise broadcast. The
    // aggregate over the bucketed round-trip hash-equals the oracle's
    // over the original parquet — the layout loses nothing.
    "source_bucketed" -> ((s, d) => {
      val base = s"$scratchDir/bucketed"
      orders(s, d).select(col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").option("path", s"$base/ord")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_bucket_orders")
      customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").option("path", s"$base/cust")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_bucket_customer")
      val o = s.table("graft_bucket_orders")
      val c = s.table("graft_bucket_customer")
      o.hint("merge")
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("rev"))
    }),

    // Parquet-NATIVE data skipping — the at-rest layer between
    // partition pruning (source_partitioned) and z-order clustering
    // (maint_zorder): the write path sorts by the probe key (key-
    // ranged row groups → min/max stats skip) AND attaches a column
    // bloom filter (point probes skip row groups even when stats or
    // dictionaries can't — BloomSkipSpec proves 0-of-N row groups
    // read for an absent key on a shuffled, dictionary-free file,
    // with the bloom-off control reading all N). The selective IN
    // probe reaches the scan as PushedFilters; the aggregate over the
    // skipping read hash-equals the oracle over the original parquet.
    "source_bloom_skip" -> ((s, d) => {
      val tmp = s"$scratchDir/bloom_skip"
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .sort("l_orderkey")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#l_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#l_orderkey",
          "100000")
        .parquet(tmp)
      s.read.parquet(tmp)
        .filter(col("l_orderkey").isin(1L, 7L, 997L, 4999L))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("qty"))
    }),

    "maint_zorder" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          pmod(col("o_custkey"), lit(65536L)).as("zx"),
          pmod(floor(col("o_totalprice") / 100.0).cast("long"),
            lit(65536L)).as("zy"))
        .select(col("o_orderkey"),
          graft.sources.ZOrder.zValue(col("zx"), col("zy"), 16).as("z"))),

    // 3-column Z-order key (OPTIMIZE ZORDER BY (custkey, price, month)
    // shape): round-robin interleave, 10 bits per column — the n-D
    // generalization a real maintenance pass clusters on. Layout proof
    // (3-D box + per-column stripes concentrate in few files) in
    // ZOrderSpec.
    "maint_zorder3" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          pmod(col("o_custkey"), lit(1024L)).as("zx"),
          pmod(floor(col("o_totalprice") / 100.0).cast("long"),
            lit(1024L)).as("zy"),
          pmod((year(col("o_orderdate")) * 12 +
            month(col("o_orderdate"))).cast("long"), lit(1024L)).as("zw"))
        .select(col("o_orderkey"),
          graft.sources.ZOrder.zValueN(
            Seq(col("zx"), col("zy"), col("zw")), 10).as("z"))),

    // Fixed-width histogram (distribution profiling): integer bucket
    // arithmetic — exact cross-engine, partial-agg'd, one scan.
    "profile_histogram" -> ((s, d) =>
      orders(s, d)
        .groupBy((floor(col("o_totalprice") / 25000.0) * 25000L)
          .cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n"))),

    // Equi-DEPTH histogram: quartile edges (rounded 6dp on both
    // engines — the raw interpolated percentile is merge-order noisy
    // in the last bits) as literals over one scan. Edges come from
    // ext/ExactQuantiles — exact order statistics in bounded memory —
    // NOT Spark's exact `percentile`, whose aggregation buffer holds
    // the entire value multiset in one final reducer (an
    // executor-memory wall at 100 TB). The final plan is a single
    // scan + hash-agg with literal edges: no percentile aggregate, no
    // join (pinned in PlanShapeSpec).
    "profile_histogram_eqdepth" -> ((s, d) => {
      val qs = graft.ext.ExactQuantiles
        .percentiles(orders(s, d), "o_totalprice", Seq(0.25, 0.5, 0.75))
        .map(graft.ext.ExactQuantiles.round6)
      orders(s, d)
        .select(when(col("o_totalprice") <= qs(0), 0)
          .when(col("o_totalprice") <= qs(1), 1)
          .when(col("o_totalprice") <= qs(2), 2)
          .otherwise(3).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
    }),

    // Data-quality expectations in one pass + one anti join: rule
    // violation counts (non-positive price, null key) and referential
    // integrity (orders whose custkey has no customer row). The FK
    // check is a left-anti join — the scalable form of NOT IN.
    "profile_expectations" -> ((s, d) => {
      val o = orders(s, d)
      val rules = o.agg(
        sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L))
          .as("n_nonpos_price"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L))
          .as("n_null_cust"),
        count(lit(1)).as("n_rows"))
      val fk = o.join(customer(s, d).select("c_custkey"),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_fk_orphans"))
      rules.crossJoin(fk)
    }),

    // Per-type 3-sigma anomaly flags: mean/stddev rounded 6dp on both
    // engines before the threshold compare (raw double aggregates are
    // merge-order sensitive), stats side broadcast — |event_type|
    // rows at any scale.
    "events_anomaly" -> ((s, d) => {
      val ev = events(s, d)
      val st = ev.groupBy("event_type").agg(
        round(avg(col("value")), 6).as("mu"),
        round(stddev_samp(col("value")), 6).as("sd"))
      ev.join(broadcast(st), "event_type")
        .filter(col("value") > col("mu") + lit(3) * col("sd"))
        .select(col("event_id"), col("event_type"), col("value"))
    }),

    // MERGE/upsert maintenance pass: changeset derived from orders
    // (big spenders re-segmented + synthetic inserts on negative
    // keys), applied to the customer snapshot via one full-outer
    // join — operators/Upsert.
    "merge_upsert" -> ((s, d) => {
      val bigSpend = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
      val mods = bigSpend.select(col("o_custkey").as("c_custkey"),
        lit("VIP").as("c_mktsegment"),
        (col("n_big") * 1000).cast("double").as("c_acctbal"))
      val inserts = bigSpend.filter(col("o_custkey") % 7 === 0)
        .select((-col("o_custkey")).as("c_custkey"),
          lit("NEW").as("c_mktsegment"), lit(0.0).as("c_acctbal"))
      graft.operators.Upsert.upsert(
        customer(s, d).select("c_custkey", "c_name", "c_mktsegment",
          "c_acctbal"),
        mods.union(inserts), "c_custkey")
    }),

    // SCD Type-2 dimension maintenance (operators/Scd2): big spenders
    // re-segmented to VIP with full history — their current row closes
    // at the change date, the new version opens; a synthetic new key
    // (negative) inserts; everyone else keeps their open row. The
    // Type-2 companion of merge_upsert's Type-1 overwrite.
    "maint_scd2" -> ((s, d) => {
      import s.implicits._
      val dim = customer(s, d).select(col("c_custkey"),
        col("c_mktsegment").as("seg"),
        to_date(lit("2020-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"),
        lit(true).as("is_current"))
      val changes = orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("c_custkey")).distinct()
        .select(col("c_custkey"), lit("VIP").as("seg"))
        .union(Seq((-1L, "NEWSEG")).toDF("c_custkey", "seg"))
      graft.operators.Scd2.applyChanges(dim, changes, "c_custkey",
        Seq("seg"), to_date(lit("2024-06-01")))
    }),

    // Incremental aggregate maintenance: per-key (count, decimal sum)
    // states computed for an "old" batch and a "delta" batch are
    // merged by one full-outer join + componentwise add — exactly the
    // map-side-combine algebra lifted to table level. Because the
    // state is exact decimal, merged == full recompute bit-for-bit;
    // the oracle IS the full recompute over all rows.
    "incremental_agg" -> ((s, d) => {
      val cutoff = lit("1997-01-01").cast("timestamp")
      def state(df: DataFrame) = df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"),
          sum(dec(col("o_totalprice"))).as("sum_price"))
      val old = state(orders(s, d).filter(col("o_orderdate") < cutoff))
        .select(col("o_custkey"), col("n").as("n_o"),
          col("sum_price").as("sp_o"))
      val delta = state(orders(s, d).filter(col("o_orderdate") >= cutoff))
        .select(col("o_custkey"), col("n").as("n_d"),
          col("sum_price").as("sp_d"))
      old.join(delta, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          (coalesce(col("n_o"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n_orders"),
          (coalesce(col("sp_o"), lit(0).cast(DecimalType(18, 2))) +
            coalesce(col("sp_d"), lit(0).cast(DecimalType(18, 2))))
            .cast("double").as("sum_price"))
    }),

    // Typed Aggregator UDAF (geometric mean): exact decimal partial
    // state → order-independent, map-side combinable. Deliberately the
    // only UDAF in the repo — everything built-in stays built-in.
    "agg_udaf" -> ((s, d) =>
      lineitem(s, d).groupBy("l_returnflag")
        .agg(round(graft.functions.GeoMean.geoMean(col("l_quantity")), 6)
          .as("geo_qty"),
          count(lit(1)).as("n"))),

    // TPC-H Q6 shape: the pure pushdown query — every predicate
    // reaches the parquet scan (PushedFilters), no join, no shuffle
    // beyond the single-row final aggregate. The discount compare runs
    // in DECIMAL(4,2): the stored doubles are 2dp values, so the cast
    // is unambiguous and the BETWEEN is exact (a double compare against
    // 0.07 would hinge on representation error).
    "q6_revenue" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_quantity") < 24)
        .filter(col("l_discount").cast(DecimalType(4, 2))
          .between(lit(BigDecimal("0.05")), lit(BigDecimal("0.07"))))
        .agg(
          sum(dec(col("l_extendedprice")) *
            col("l_discount").cast(DecimalType(4, 2)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))),

    // TPC-H Q4 shape: EXISTS decorrelated to a left-semi join — the
    // fact side reduces to a distinct-free semi probe, the aggregate
    // runs over the (tiny) qualifying order set.
    "q4_priority" -> ((s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
      val l = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // Profiling: Pearson correlation + OLS slope from exact decimal
    // component sums (n, Σx, Σy, Σx², Σy², Σxy) — one scan, one
    // single-row aggregate, the classic distributed-corr shape.
    // Measures are chosen so every unscaled decimal sum stays below
    // 2^53 even at sf100 (quantity ≤ 50, discount·100 ≤ 10): the
    // decimal→double casts are then EXACT, and the final double
    // formula — written with the same association in the oracle — is
    // bit-deterministic cross-engine. (corr over price would push Σy²
    // past 2^53, where decimal→double conversion itself can differ by
    // 1 ulp between engines.)
    "profile_corr" -> ((s, d) => {
      val x = col("l_quantity").cast(DecimalType(18, 0))
      val y = col("l_discount").cast(DecimalType(4, 2)) * lit(100)
      lineitem(s, d)
        .agg(count(lit(1)).as("n"),
          sum(x).as("sxd"), sum(y).as("syd"),
          sum(x * x).as("sxxd"), sum(y * y).as("syyd"),
          sum(x * y).as("sxyd"))
        .selectExpr("n",
          "CAST(sxd AS DOUBLE) / n AS mean_qty",
          "CAST(syd AS DOUBLE) / n AS mean_disc_pct",
          """(n * CAST(sxyd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(syd AS DOUBLE))
             / (sqrt(n * CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE))
                * sqrt(n * CAST(syyd AS DOUBLE) - CAST(syd AS DOUBLE) * CAST(syd AS DOUBLE)))
             AS corr_qty_disc""",
          """(n * CAST(sxyd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(syd AS DOUBLE))
             / (n * CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE))
             AS beta_disc_on_qty""")
    }),

    // Window rank distributions: percent_rank/cume_dist per segment.
    // Both are tie-deterministic (they depend only on the ORDER BY
    // values, not tie order) and their int-ratio doubles are identical
    // IEEE cross-engine.
    "window_cume" -> ((s, d) => {
      val w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
      customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),

    // TPC-H Q7 shape: bilateral nation-pair trade volume by ship year.
    // The 2-of-25-nations filter lands on supplier/customer BEFORE the
    // fact joins (via broadcast of the 2-row nation subset), so the
    // orderkey/suppkey/custkey shuffles carry only qualifying rows.
    // supplier/customer scale with the corpus, so those joins stay
    // shuffle joins (AQE may still broadcast them at small SF).
    "q7_nation_volume" -> ((s, d) => {
      val nn = nation(s, d)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
      val sup = supplier(s, d)
        .join(broadcast(nn.select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val cust = customer(s, d)
        .join(broadcast(nn.select(col("n_nationkey").as("cnk"),
          col("n_name").as("cust_nation"))),
          col("c_nationkey") === col("cnk"))
        .select("c_custkey", "cust_nation")
      val l = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount"),
          year(col("l_shipdate")).cast("long").as("l_year"))
      l.join(orders(s, d).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" &&
          col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(revenueSum("revenue"))
    }),

    // TPC-H Q13 shape: customer order-count distribution. Double
    // grouping: fact reduces to one row per customer first (join-side
    // pushed predicate), then the per-count histogram is a tiny
    // second aggregate.
    "q13_order_dist" -> ((s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      customer(s, d).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
    }),

    // TPC-H Q14 shape: promo revenue share in a month. Conditional
    // decimal sums (exact) → one final double division, spelled
    // identically in the oracle so the IEEE result is bit-equal.
    "q14_promo_share" -> ((s, d) => {
      val rev = revenueProduct
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(part(s, d).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", rev)).as("promo_d"),
          sum(rev).as("all_d"),
          count(lit(1)).as("n_rows"))
        .select(
          (lit(100.0) * coalesce(col("promo_d").cast("double"), lit(0.0)) /
            col("all_d").cast("double")).as("promo_share"),
          col("n_rows"))
    }),

    // TPC-H Q17 shape: small-quantity revenue for one brand. The
    // correlated per-part AVG becomes a WINDOW over the brand-filtered
    // fact slice — one scan, one partkey exchange, no self-join (the
    // groupBy+rejoin spelling read the brand slice twice; same exact
    // sum/count arithmetic, so the oracle's correlated form matches).
    "q17_small_qty" -> ((s, d) => {
      val p = part(s, d).filter(col("p_brand") === "Brand#1")
        .select("p_partkey")
      val w = Window.partitionBy("l_partkey")
      lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .withColumn("avg_qty",
          sum(dec(col("l_quantity"))).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          (coalesce(sum(dec(col("l_extendedprice"))).cast("double"),
            lit(0.0)) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q2 shape: best-offer-per-part with a correlated MIN. The
    // "offer book" is lineitem reduced to one row per (part, supplier)
    // BEFORE the min-per-part subquery, and both the region gate
    // (broadcast 1-row region → ~n/5 nations → supplier semi) and the
    // part attribute filter prune their side ahead of the partkey
    // joins. MIN over DECIMAL is exact, so best = mn never suffers a
    // float-equality hazard.
    "q2_min_offer" -> ((s, d) => {
      val eurNations = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey")
      val sup = supplier(s, d)
        .join(broadcast(eurNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
      // One offers aggregate, then the per-part MIN as a window over
      // the SAME reduced table — the groupBy+rejoin spelling computed
      // the whole offers subtree twice. Supplier attributes join
      // AFTER the winner filter (they're functionally determined by
      // suppkey), keeping the aggregate hash-based — carrying them
      // through via first() forced a SortAggregate.
      val offers = lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(sup.select("s_suppkey"), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(dec(col("l_extendedprice"))).as("best"))
      val wm = Window.partitionBy("l_partkey")
      val p = part(s, d)
        .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
        .select("p_partkey", "p_name")
      offers
        .withColumn("mn", min(col("best")).over(wm))
        .filter(col("best") === col("mn"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
          col("s_name"), col("s_acctbal"),
          col("best").cast("double").as("best_price"))
    }),

    // TPC-H Q15 shape: top supplier by quarterly revenue — the scalar
    // MAX subquery compares exact decimal totals, so the max-equality
    // filter is deterministic (the classic Q15 float trap).
    "q15_top_supplier" -> ((s, d) => {
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(revenueProduct).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.join(broadcast(mx), col("total_rev") === col("mx"))
        .join(supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
    }),

    // TPC-H Q16 shape: supplier diversity per part attribute group,
    // with a NOT IN exclusion (anti-join on the skinny supplier key
    // set — broadcastable: it only carries excluded suppliers).
    "q16_supplier_cnt" -> ((s, d) => {
      val excluded = supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("x_suppkey"))
      val p = part(s, d)
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 9, 19, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      lineitem(s, d).select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(broadcast(excluded), col("l_suppkey") === col("x_suppkey"),
          "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
    }),

    // TPC-H Q19 shape: disjunctive brand/size/quantity predicates.
    // The part-side conjuncts (brand, size) are pushable per-branch;
    // the residual OR runs post-join. One partkey join, no Expand.
    "q19_disjunctive" -> ((s, d) => {
      val j = lineitem(s, d)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(part(s, d).select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
      j.filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
        .agg(revenueSum("revenue"), count(lit(1)).as("n_rows"))
    }),

    // TPC-H Q8 shape: one nation's market share inside a region, by
    // order year. Every dimension prunes before the fact joins
    // (region→nation→customer semi-chain, type-filtered part); the
    // share is a conditional/total pair of exact decimal sums with
    // one final double division.
    "q8_market_share" -> ((s, d) => {
      val asiaN = nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk"))
      val cust = customer(s, d)
        .join(broadcast(asiaN), col("c_nationkey") === col("cnk"))
        .select("c_custkey")
      val supN = supplier(s, d)
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("snk"),
          col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("snk"))
        .select("s_suppkey", "supp_nation")
      val p = part(s, d).filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
      val rev = revenueProduct
      lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .groupBy("o_year")
        .agg(sum(when(col("supp_nation") === "NATION_3", rev)).as("nat_d"),
          sum(rev).as("all_d"), count(lit(1)).as("n_rows"))
        .select(col("o_year"),
          (lit(100.0) * coalesce(col("nat_d").cast("double"), lit(0.0)) /
            col("all_d").cast("double")).as("mkt_share"),
          col("n_rows"))
    }),

    // TPC-H Q9 shape: profit by supplier nation × order year for one
    // part family. No supplycost column exists, so cost is modeled as
    // half the retail value shipped: both the revenue and cost sums
    // stay exact decimal and the 0.5 factor is applied once, in
    // double, after aggregation — identical IEEE in the oracle.
    "q9_profit" -> ((s, d) => {
      val p = part(s, d).filter(col("p_name").contains("red"))
        .select("p_partkey", "p_retailprice")
      val supN = supplier(s, d)
        .join(broadcast(nation(s, d).select(col("n_nationkey").as("snk"),
          col("n_name"))), col("s_nationkey") === col("snk"))
        .select("s_suppkey", "n_name")
      val o = orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      val rev = revenueProduct
      lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(supN, col("l_suppkey") === col("s_suppkey"))
        .groupBy("n_name", "o_year")
        .agg(sum(rev).as("rev_d"),
          sum(dec(col("l_quantity")) * dec(col("p_retailprice")))
            .as("cost_d"),
          count(lit(1)).as("n_rows"))
        .select(col("n_name"), col("o_year"),
          (col("rev_d").cast("double") -
            lit(0.5) * col("cost_d").cast("double")).as("profit"),
          col("n_rows"))
    }),

    // TPC-H Q11 shape: "important" keys by value share — a scalar
    // subquery over the SAME pre-aggregated per-key table (computed
    // once, reused for both the total and the filter; the 1-row total
    // broadcasts).
    "q11_important_parts" -> ((s, d) => {
      val pv = lineitem(s, d).groupBy("l_partkey")
        .agg(sum(dec(col("l_extendedprice"))).as("val_d"))
      val tot = pv.agg(sum(col("val_d")).cast("double").as("tot"))
      pv.crossJoin(broadcast(tot))
        .filter(col("val_d").cast("double") > lit(0.0006) * col("tot"))
        .select(col("l_partkey"), col("val_d").cast("double")
          .as("part_value"))
    }),

    // TPC-H Q12 shape: priority-class line counts per return flag
    // (shipmode stand-in) for one ship year — conditional counts on a
    // single orderkey join.
    "q12_priority_class" -> ((s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
        .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
            .otherwise(1L)).as("low_line_count"))),

    // TPC-H Q20 shape: suppliers shipping an outsized share of one
    // part family — nested IN subqueries become a broadcast semi
    // (red parts) + one per-supplier aggregate compared against a
    // broadcast 1-row mean. Scale-free threshold (1.2× mean), unlike
    // the spec's absolute quantity, so the query stays selective at
    // any SF.
    "q20_excess_supply" -> ((s, d) => {
      val redParts = part(s, d).filter(col("p_name").startsWith("red"))
        .select("p_partkey")
      val redl = lineitem(s, d)
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      val per = redl.groupBy("l_suppkey")
        .agg(sum(dec(col("l_quantity"))).as("qty_d"))
      // tot/nsup derive EXACTLY from the already-reduced per-supplier
      // table (decimal addition is associative; one row per supplier
      // by construction) — no second scan of the fact side
      val stats = per.agg(
        sum(col("qty_d")).cast("double").as("tot"),
        count(lit(1)).as("nsup"))
      per.crossJoin(broadcast(stats))
        .filter(col("qty_d").cast("double") >
          lit(1.2) * col("tot") / col("nsup"))
        .join(supplier(s, d).select("s_suppkey", "s_name", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          col("qty_d").cast("double").as("red_qty"))
    }),

    // TPC-H Q21 shape: suppliers solely responsible for returns on
    // multi-supplier orders. The EXISTS/NOT-EXISTS pair collapses into
    // ONE per-order aggregate (distinct suppliers, distinct returning
    // suppliers) joined back to the fact — two orderkey exchanges
    // total, no correlated re-scans.
    "q21_sole_returner" -> ((s, d) => {
      val l97 = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_orderkey", "l_suppkey", "l_returnflag")
      val ord = l97.groupBy(col("l_orderkey").as("o_key"))
        .agg(countDistinct(col("l_suppkey")).as("nsup"),
          countDistinct(when(col("l_returnflag") === "R",
            col("l_suppkey"))).as("nret"))
      l97.filter(col("l_returnflag") === "R")
        .join(ord, col("l_orderkey") === col("o_key"))
        .filter(col("nsup") >= 2 && col("nret") === 1)
        .join(supplier(s, d).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    // k-anonymity audit (data-governance profiling): quasi-identifier
    // groups below k rows are re-identification risks. Two-level
    // aggregate — the QI groupBy is map-side combined, the audit
    // summary is one tiny final row; nothing here grows with the
    // table beyond the distinct-QI count.
    "profile_kanon" -> ((s, d) =>
      customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("group_size"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("group_size") < 5, 1L).otherwise(0L))
            .as("risky_groups"),
          sum(when(col("group_size") < 5, col("group_size"))
            .otherwise(0L)).as("risky_rows"),
          min(col("group_size")).as("min_group_size"))),

    // Skyline / Pareto frontier (Börzsönyi et al., ICDE 2001) on
    // (price ↓, recency ↑), textbook dominance: d dominates o iff
    // d is ≤ on price AND ≥ on recency AND strictly better on at
    // least one. operators/Skyline runs the bucketed prefix-max plan:
    // per-price-bucket windows plus a constant-size (≤ bucket count)
    // prefix table — no window's input ever depends on the data
    // distribution, closing r07's phase-2 bound where an
    // anti-correlated table survived the salted local pass whole and
    // landed in one unpartitioned window task.
    "skyline_pareto" -> ((s, d) =>
      graft.operators.Skyline.frontier2d(
        orders(s, d).select(col("o_orderkey"), col("o_totalprice"),
          unix_timestamp(col("o_orderdate")).as("date_epoch"),
          round(col("o_totalprice") * 100).cast("long").as("__price_c")),
        "__price_c", "date_epoch")
        .select("o_orderkey", "o_totalprice", "date_epoch")),

    // l-diversity audit — k-anonymity's companion: a QI group whose
    // SENSITIVE attribute (market segment) takes too few distinct
    // values leaks it even when the group is large. Same two-level
    // aggregate shape as profile_kanon.
    "profile_ldiv" -> ((s, d) =>
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("group_size"),
          countDistinct(col("c_mktsegment")).as("l_div"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("l_div") < 3, 1L).otherwise(0L))
            .as("low_diversity_groups"),
          min(col("l_div")).as("min_l"),
          sum(when(col("l_div") < 3, col("group_size"))
            .otherwise(0L)).as("exposed_rows"))),

    // Shannon entropy of categorical columns — the data-profiling
    // signal behind "is this column a useful stratum / join key?".
    // Both columns profile in ONE scan: a 2-wide struct explode makes
    // the column id part of the count key (the ExactQuantiles
    // unpivot idiom), per-column totals broadcast back, and the final
    // per-column aggregate runs over one row per DISTINCT value —
    // bounded by the domain, never the table. 6dp round absorbs
    // float-sum reorder noise (the tfidf/bm25 precedent).
    "profile_entropy" -> ((s, d) => {
      val base = graft.queries.Tables.documents(s, d).select(
        explode(array(
          struct(lit("lang").as("c"), col("lang").as("v")),
          struct(lit("source").as("c"), col("source").as("v")))).as("cv"))
        .select(col("cv.c").as("c"), col("cv.v").as("v"))
      val cnt = base.groupBy("c", "v").agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy("c").agg(sum(col("n")).as("tot"))
      cnt.join(broadcast(tot), Seq("c"))
        .groupBy("c")
        .agg(count(lit(1)).as("n_values"),
          round(-sum((col("n") / col("tot").cast("double")) *
            log(col("n") / col("tot").cast("double"))), 6)
            .as("entropy_nats"))
    }),

    // Benford's-law first-digit audit of order totals — the classic
    // fraud/synthetic-data screen: natural multiplicative amounts put
    // ~30.1% of leading digits at 1; a flat profile screams generated
    // data. The leading digit comes from the INTEGER cents rendered as
    // a string (long-to-string formatting is identical across engines
    // — no float formatting seam), the share ships in integer
    // milli-units, and the expected Benford share (log10(1+1/d), the
    // one constant that needs a log) is a 6dp literal computed at
    // plan time, not in the hash path.
    "profile_benford" -> ((s, d) => {
      val cents = round(col("o_totalprice") * 100).cast("long")
      val digit = substring(cents.cast("string"), 1, 1)
      val counts = orders(s, d).filter(col("o_totalprice") > 0)
        .groupBy(digit.as("digit"))
        .agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("t"))
      counts.crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          expr("n * 1000 DIV t").as("share_milli"),
          element_at(typedLit((1 to 9).map(dd =>
            dd.toString -> math.round(
              math.log10(1.0 + 1.0 / dd) * 1000)).toMap),
            col("digit")).as("benford_milli"))
    }),

    // Population Stability Index between two corpus halves — the
    // standard production data-drift alarm (PSI > 0.2 = retrain).
    // Same unpivot-explode shape as profile_entropy: both categorical
    // columns in one scan, per-(column, value) counts for each half
    // from ONE aggregate, and the PSI sum runs over the domain-bounded
    // value table. Values seen in only one half contribute an
    // `n_onesided` count instead of an infinite term — deterministic
    // in both engines, no epsilon fudge.
    "profile_drift" -> ((s, d) => {
      val base = graft.queries.Tables.documents(s, d).select(
        explode(array(
          struct(lit("lang").as("c"), col("lang").as("v")),
          struct(lit("source").as("c"), col("source").as("v")))).as("cv"),
        (col("doc_id") % 2 === 0).as("h"))
        .select(col("cv.c").as("c"), col("cv.v").as("v"), col("h"))
      val cnt = base.groupBy("c", "v").agg(
        sum(when(col("h"), 1L).otherwise(0L)).as("na"),
        sum(when(!col("h"), 1L).otherwise(0L)).as("nb"))
      val tot = cnt.groupBy("c")
        .agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
      val p = col("na") / col("ta").cast("double")
      val q = col("nb") / col("tb").cast("double")
      cnt.join(broadcast(tot), Seq("c"))
        .groupBy("c")
        .agg(
          sum(when(col("na") === 0 || col("nb") === 0, 1L)
            .otherwise(0L)).as("n_onesided"),
          round(sum(when(col("na") > 0 && col("nb") > 0,
            (p - q) * log(p / q)).otherwise(0.0)), 6).as("psi"))
    }),

    // TPC-H Q22 shape: well-funded customers gone idle. The scalar
    // AVG broadcast-crosses (1 row), the "no recent orders" NOT EXISTS
    // is a left-anti against the date-pruned orders slice, and the
    // customer-code grouping keys on a substring.
    "q22_idle_customers" -> ((s, d) => {
      val avgbal = customer(s, d).filter(col("c_acctbal") > 0.0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("ab"))
      val recent = orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey").as("r_custkey"))
      customer(s, d).select("c_custkey", "c_name", "c_acctbal")
        .crossJoin(broadcast(avgbal))
        .filter(col("c_acctbal") > col("ab"))
        .join(recent, col("c_custkey") === col("r_custkey"), "left_anti")
        .groupBy(substring(col("c_name"), 17, 2).as("code"))
        .agg(count(lit(1)).as("numcust"),
          sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
    }),

    // k-anonymity ENFORCEMENT — profile_kanon's audit turned into the
    // remediation op: quasi-identifier (nation, segment) groups below
    // k=12 generalize up the geography hierarchy (nation → region),
    // and groups still below k after coarsening are suppressed
    // ('*','*'). Deterministic ladder, no row ever dropped (an
    // anonymized release must keep its population). Both group-size
    // tables are QI-domain-bounded broadcasts; the per-customer work
    // is two map-side joins — one scan of customer.
    "anon_coarsen" -> ((s, d) => {
      val k = 12
      val cust = customer(s, d)
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey"), col("n_name"),
            col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("c_mktsegment").as("seg"),
          col("n_name").as("nat"), col("r_name").as("reg"))
      val cnt0 = cust.groupBy("nat", "seg").agg(count(lit(1)).as("n0"))
      val withN0 = cust.join(broadcast(cnt0), Seq("nat", "seg"))
      val cnt1 = withN0.filter(col("n0") < k)
        .groupBy("reg", "seg").agg(count(lit(1)).as("n1"))
      withN0.join(broadcast(cnt1), Seq("reg", "seg"), "left")
        .select(col("c_custkey"),
          when(col("n0") >= k, col("nat"))
            .when(col("n1") >= k, col("reg"))
            .otherwise(lit("*")).as("qi_geo"),
          when(col("n0") >= k || col("n1") >= k, col("seg"))
            .otherwise(lit("*")).as("qi_seg"),
          when(col("n0") >= k, 0L).when(col("n1") >= k, 1L)
            .otherwise(2L).as("gen_level"))
    }),

    // Two-sample Kolmogorov–Smirnov drift on a CONTINUOUS column —
    // the numeric companion to profile_drift's categorical PSI: split
    // the corpus into halves, D = max |ECDF_a − ECDF_b| over doc
    // lengths. Exact end to end: per-(value, half) counts, then the
    // ECDF cumsum as a DISTRIBUTED exact prefix sum — distinct values
    // range-shard into 32 contiguous buckets by a min/max-derived
    // stride (order-preserving, so per-shard cumsum + broadcast shard
    // offsets compose to the global cumsum; the only global-order
    // window runs over the 32 subtotal rows). "Distinct doc lengths"
    // is domain-bounded today, but at 100 TB a distinct-value table
    // can be millions of rows — no single task ever holds it. The
    // sup-difference is the integer cross-product |cumA·nB − cumB·nA|
    // — division by nA·nB deferred to a single integer emit. No float
    // ever enters the hash path, and the result is shard-independent,
    // so the oracle replays the plain single-window ECDF.
    "profile_ks" -> ((s, d) => {
      val docs = graft.queries.Tables.documents(s, d)
        .select(col("n_chars").as("v"), (col("doc_id") % 2 === 0).as("h"))
      val cnt = docs.groupBy("v")
        .agg(sum(when(col("h"), 1L).otherwise(0L)).as("ca"),
          sum(when(!col("h"), 1L).otherwise(0L)).as("cb"))
      val tot = cnt.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
      val rng = cnt.agg(min(col("v")).cast("long").as("lo"),
        max(col("v")).cast("long").as("hi"))
      val sharded = cnt.crossJoin(broadcast(rng))
        .withColumn("shard", // exact integer DIV: order-preserving in v
          expr("((CAST(v AS BIGINT) - lo) * 32) DIV (hi - lo + 1)"))
      val sub = sharded.groupBy("shard")
        .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
      // 32-row shard table; non-foldable constant partition key (pmod(col,1); a bare
      // literal is stripped by EliminateWindowPartitions) = no
      // spurious single-partition WindowExec warning in the logs
      val wOff = Window.partitionBy(pmod(col("shard"), lit(1))).orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = sub
        .withColumn("offa", coalesce(sum(col("sa")).over(wOff), lit(0L)))
        .withColumn("offb", coalesce(sum(col("sb")).over(wOff), lit(0L)))
        .select("shard", "offa", "offb")
      val wIn = Window.partitionBy("shard").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sharded
        .withColumn("cia", sum(col("ca")).over(wIn))
        .withColumn("cib", sum(col("cb")).over(wIn))
        .join(broadcast(offs), "shard")
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_values"),
          max(abs((col("cia") + col("offa")) * col("nb")
            - (col("cib") + col("offb")) * col("na"))).as("d_num"),
          max(col("na") * col("nb")).as("d_den"))
        // ONE double division over exact integers — bit-deterministic
        // in both engines (unlike a float sum, a single IEEE divide
        // has no order to vary); numerator ≤ na·nb ≤ n²/4 fits int64
        // past 10⁹ docs
        .select(col("n_values"), col("d_num"), col("d_den"),
          (col("d_num").cast("double") / col("d_den")).as("d_stat"))
    }),

    // The analyst anti-pattern, spelled NAIVELY on purpose: join
    // lineitem against its own per-part aggregate and keep rows 20%
    // above their group mean. plans/AggJoinToWindow rewrites this
    // analyzed self-join into ONE scan + ONE window (no second pass,
    // no join shuffle) — the oracle replays the naive join SQL, so
    // the hash check proves the rewrite is semantics-preserving on
    // real data; AggJoinToWindowSpec pins the no-join plan shape and
    // the bail-out corners. Threshold compares integer cents
    // cross-multiplied (q·n·10 > s·12) — no division, no float seam.
    "join_agg_auto" -> ((s, d) => {
      val li = lineitem(s, d).select(col("l_partkey"), col("l_orderkey"),
        col("l_linenumber"),
        (dec(col("l_quantity")) * 100).cast("long").as("q_c"))
      val perPart = li.groupBy("l_partkey")
        .agg(count(lit(1)).as("n_li"), sum(col("q_c")).as("s_c"))
      li.join(perPart, "l_partkey")
        .filter(col("q_c") * col("n_li") * 10 > col("s_c") * 12)
        .select("l_partkey", "l_orderkey", "l_linenumber", "q_c",
          "n_li", "s_c")
    }),

    // Mutual information between two categorical columns — the
    // bivariate companion to profile_entropy ("does source determine
    // language?" — the feature-selection / leakage screen). One
    // (lang, source) aggregate, domain-bounded; marginals broadcast
    // back; the log term follows the entropy/PSI precedent (6dp round
    // absorbs float-sum reorder noise), ratios go through double
    // BEFORE multiplying so no integer product can overflow at scale.
    "profile_mutual_info" -> ((s, d) => {
      val cnt = graft.queries.Tables.documents(s, d)
        .groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val ml = cnt.groupBy("lang").agg(sum("n").as("nl"))
      val ms = cnt.groupBy("source").agg(sum("n").as("ns"))
      val tot = cnt.agg(sum("n").as("t"))
      cnt.join(broadcast(ml), "lang").join(broadcast(ms), "source")
        .crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_cells"),
          round(sum((col("n").cast("double") / col("t")) *
            log((col("n").cast("double") * col("t")) /
              (col("nl").cast("double") * col("ns")))), 6).as("mi_nats"))
    }),

    // Join-key skew diagnostics — the measurement that DECIDES whether
    // join_skew_salted's fan-out is needed: per-key frequencies of the
    // fact table's supplier key reduced to hot-key share and imbalance
    // ratio in exact integer basis points. Two aggregates, the second
    // over one row per DISTINCT key — domain-bounded, map-side
    // combined; no row data ever leaves the first shuffle.
    "profile_skew" -> ((s, d) => {
      val freq = lineitem(s, d).groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"))
      freq.agg(count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("total_rows"),
          max(col("cnt")).as("max_cnt"),
          min(col("cnt")).as("min_cnt"))
        .select(col("n_keys"), col("total_rows"), col("max_cnt"),
          col("min_cnt"),
          expr("max_cnt * 10000 DIV total_rows").as("top_share_bp"),
          // int64 bound: max_cnt·n_keys·10⁴ < 2⁶³ holds while
          // max_cnt·n_keys < 9.2·10¹⁴ — e.g. a 10⁹-row hot key with
          // up to ~9·10⁵ distinct keys; beyond that, lift the product
          // to DECIMAL(38,0) on both sides (profile_gini precedent)
          expr("max_cnt * n_keys * 10000 DIV total_rows")
            .as("imbalance_bp"))
    }),

    // The explicit skew tool as a query-level artifact: lineitem ⋈
    // supplier through operators/SkewJoin.saltedJoin — each big-side
    // key fans out over 8 salts (deterministic hash of the non-key
    // columns), the small side replicates once per salt, and the
    // result is ROW-IDENTICAL to the plain join, which is exactly
    // what the oracle checks (plain-join SQL, hash-compared).
    "join_skew_salted" -> ((s, d) => {
      val big = lineitem(s, d).select(
        col("l_suppkey").as("suppkey"), col("l_orderkey"),
        col("l_linenumber"))
      val small = supplier(s, d).select(
        col("s_suppkey").as("suppkey"), col("s_name"))
      graft.operators.SkewJoin.saltedJoin(big, small, Seq("suppkey"), 8)
    }),

    // Gini concentration of customer spend per nation — the standard
    // inequality/concentration audit ("is 1% of customers 90% of
    // revenue?"). Exact end to end: spend in integer cents, rank via
    // one per-nation window, and Gini from the rank identity
    // G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) (xᵢ ascending) scaled to
    // basis points by integer division — no double ever enters the
    // hash path. One shuffle to per-customer spend, one window, one
    // per-nation aggregate; the numerator is ≥ 0 by the rearrangement
    // inequality so trunc-vs-floor division can't diverge. Overflow
    // bound: Σi·xᵢ ≤ n²·max_cents — fine past 10⁶ customers/nation
    // with $10⁶ spends; beyond that, lift wsum to DECIMAL(38,0).
    "profile_gini" -> ((s, d) => {
      val spend = orders(s, d).groupBy(col("o_custkey"))
        .agg((sum(dec(col("o_totalprice"))) * 100).cast("long")
          .as("cents"))
      val cust = customer(s, d).select("c_custkey", "c_nationkey")
      val w = Window.partitionBy("c_nationkey").orderBy("cents", "c_custkey")
      spend.join(cust, col("o_custkey") === col("c_custkey"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("total_cents"),
          sum(col("rk") * col("cents")).as("wsum"))
        .select(col("c_nationkey"), col("n_customers"), col("total_cents"),
          // DECIMAL(38,0)-lifted: the long form overflowed at the
          // derived sf1.0 (wsum·10000 passes 2^63 past ~60k customers
          // per nation); integral DIV on decimals is exact in both
          // engines (DuckDB computes the same in HUGEINT)
          expr("CAST((2*CAST(wsum AS DECIMAL(38,0)) - (n_customers+1)" +
            "*CAST(total_cents AS DECIMAL(38,0))) * 10000" +
            " DIV (CAST(n_customers AS DECIMAL(38,0))*total_cents)" +
            " AS BIGINT)").as("gini_bp"))
    }),

    // Cramér's V association between two categorical columns — the
    // chi²-based contingency audit next to profile_mutual_info's
    // information-theoretic one ("does order priority co-vary with
    // status?"). Exact end to end: the full r×c contingency grid
    // (zero cells included — they carry chi² mass), each cell's
    // (n·obs − r·c)²·10⁶ DIV (n·r·c) term in DECIMAL(38,0)
    // (delta ≤ n² so delta²·10⁶ ≤ 5·10³⁰ at 1.5M rows — the
    // profile_gini lift precedent; all terms non-negative so trunc
    // DIV == DuckDB's floor //), summed to chi²·10⁶; V²·10⁶ =
    // chi²·10⁶ DIV (n·dof). Scale shape: three partial-agg'd counts
    // over orders + one broadcast cross of the category-bounded
    // marginals — no corpus-sized shuffle anywhere.
    "profile_cramers_v" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderpriority").as("rcat"),
        col("o_orderstatus").as("ccat"))
      val obs = o.groupBy("rcat", "ccat").agg(count(lit(1)).as("obs"))
      val rt = o.groupBy("rcat").agg(count(lit(1)).as("r"))
      val ct = o.groupBy("ccat").agg(count(lit(1)).as("c"))
      val n = o.agg(count(lit(1)).as("n"))
      val cells = rt.crossJoin(broadcast(ct))
        .join(broadcast(obs), Seq("rcat", "ccat"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .crossJoin(broadcast(n))
      cells
        .withColumn("term", expr(
          """CAST((CAST(n AS DECIMAL(38,0))*obs - CAST(r AS DECIMAL(38,0))*c)
               * (CAST(n AS DECIMAL(38,0))*obs - CAST(r AS DECIMAL(38,0))*c)
               * 1000000
               DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""))
        .agg(max("n").as("n"),
          countDistinct("rcat").as("n_rcat"),
          countDistinct("ccat").as("n_ccat"),
          sum("term").as("chi2_micro"))
        .select(col("n"), col("n_rcat"), col("n_ccat"), col("chi2_micro"),
          expr("chi2_micro DIV (n * greatest(least(n_rcat, n_ccat) - 1, 1))")
            .as("v2_micro"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "subquery_in" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders
                             WHERE o_totalprice > 300000.0)""",

    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o_totalprice >
           (SELECT 3.0 * avg(l_extendedprice) FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey)""",

    "join_lateral" ->
      """SELECT c.c_custkey, o.max_price, o.n_big
         FROM customer c
         JOIN LATERAL (
           SELECT max(o_totalprice) AS max_price, count(*) AS n_big
           FROM orders
           WHERE o_custkey = c.c_custkey
             AND o_totalprice > 100000.0) o ON true
         WHERE o.n_big > 0""",

    "profile_fd" ->
      """WITH f1 AS (SELECT 'o_orderkey->o_custkey' AS fd,
             CAST(count(*) AS BIGINT) AS n_lhs,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating
           FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd
                 FROM orders GROUP BY 1)),
         f2 AS (SELECT 'o_custkey->o_orderstatus' AS fd,
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           FROM (SELECT o_custkey, count(DISTINCT o_orderstatus) AS nd
                 FROM orders GROUP BY 1)),
         f3 AS (SELECT 'l_orderkey->l_suppkey' AS fd,
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           FROM (SELECT l_orderkey, count(DISTINCT l_suppkey) AS nd
                 FROM lineitem GROUP BY 1)),
         f4 AS (SELECT 'n_nationkey->n_regionkey' AS fd,
             CAST(count(*) AS BIGINT),
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
                 FROM nation GROUP BY 1))
         SELECT * FROM f1 UNION ALL SELECT * FROM f2
         UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4""",

    "profile_stats" ->
      """SELECT count(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_custkey,
         count(DISTINCT o_custkey) AS d_custkey,
         count(DISTINCT o_orderstatus) AS d_status,
         count(DISTINCT o_orderpriority) AS d_priority,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price
         FROM orders""",

    // Bounded-error assertions: Spark emits the bound booleans, the
    // oracle is the constant truth row. A sketch that drifts past 3σ
    // flips a column to false and the driver hash goes red.
    "approx_distinct" ->
      "SELECT true AS parts_ok, true AS orders_ok",

    "approx_distinct_by" ->
      """SELECT DISTINCT o_orderpriority, true AS cust_ok
         FROM orders""",

    "approx_hll_merge" ->
      """SELECT (SELECT count(DISTINCT event_type) FROM events)
           AS n_shards,
         (SELECT count(DISTINCT user_id) FROM events) AS n_exact,
         true AS merged_ok, true AS merge_consistent""",

    "profile_stats_approx" ->
      """SELECT count(*) AS n_rows,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_custkey,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price,
         true AS d_custkey_ok, true AS d_status_ok, true AS d_priority_ok
         FROM orders""",

    // ((v % m) + m) % m mirrors Spark's pmod (non-negative) — DuckDB's
    // bare % follows the dividend's sign, which would diverge on any
    // negative key and break the shift arithmetic below.
    "source_partitioned" ->
      """SELECT year(o_orderdate) AS year, count(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev
         FROM orders
         WHERE year(o_orderdate) BETWEEN 1997 AND 1998
         GROUP BY 1""",

    "source_orc" ->
      """SELECT year(l_shipdate) AS y, count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS qty
         FROM lineitem WHERE l_quantity > 5.0
         GROUP BY 1""",

    // format-independent replay: the xlsx export/import must surface
    // the engine's display-string view of the original rows verbatim
    "source_xlsx_roundtrip" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
           n_name,
           CAST(n_regionkey AS VARCHAR) AS n_regionkey
         FROM nation""",

    // format-independent replay: the JSONL export/import must return
    // the original rows verbatim
    "source_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars
         FROM documents""",

    // layout-independent replay: the bucketed round-trip must not
    // change a single row
    "source_bucketed" ->
      """SELECT c.c_mktsegment, count(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS rev
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1""",

    // layout-independent replay: the bloom-skipping round-trip must
    // not change a single row
    "source_bloom_skip" ->
      """SELECT l_orderkey, count(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS qty
         FROM lineitem WHERE l_orderkey IN (1, 7, 997, 4999)
         GROUP BY 1""",

    "maint_zorder" ->
      s"""WITH t AS (SELECT o_orderkey,
           ((o_custkey % 65536) + 65536) % 65536 AS zx,
           ((CAST(floor(o_totalprice / 100.0) AS BIGINT) % 65536)
             + 65536) % 65536 AS zy
           FROM orders)
          SELECT o_orderkey,
            ${graft.sources.ZOrder.zValueSql("zx", "zy", 16)} AS z
          FROM t""",

    "maint_zorder3" ->
      s"""WITH t AS (SELECT o_orderkey,
           ((o_custkey % 1024) + 1024) % 1024 AS zx,
           ((CAST(floor(o_totalprice / 100.0) AS BIGINT) % 1024)
             + 1024) % 1024 AS zy,
           ((CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
             % 1024) + 1024) % 1024 AS zw
           FROM orders)
          SELECT o_orderkey,
            ${graft.sources.ZOrder.zValueNSql(Seq("zx", "zy", "zw"), 10)}
              AS z
          FROM t""",

    "profile_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) * 25000 AS BIGINT)
           AS bucket_lo,
         count(*) AS n
         FROM orders GROUP BY 1""",

    "profile_histogram_eqdepth" ->
      """WITH e AS (SELECT
             round(quantile_cont(o_totalprice, 0.25), 6) AS q1,
             round(quantile_cont(o_totalprice, 0.5), 6) AS q2,
             round(quantile_cont(o_totalprice, 0.75), 6) AS q3
           FROM orders)
         SELECT CASE WHEN o_totalprice <= q1 THEN 0
                     WHEN o_totalprice <= q2 THEN 1
                     WHEN o_totalprice <= q3 THEN 2
                     ELSE 3 END AS bucket,
           count(*) AS n
         FROM orders CROSS JOIN e GROUP BY 1""",

    "profile_expectations" ->
      """SELECT
           (SELECT CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT)
            FROM orders) AS n_nonpos_price,
           (SELECT CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT)
            FROM orders) AS n_null_cust,
           (SELECT count(*) FROM orders) AS n_rows,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
             AS n_fk_orphans""",

    "events_anomaly" ->
      """WITH st AS (SELECT event_type,
             round(avg(value), 6) AS mu,
             round(stddev_samp(value), 6) AS sd
           FROM events GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value
         FROM events e JOIN st ON e.event_type = st.event_type
         WHERE e.value > st.mu + 3 * st.sd""",

    // Mirrors Scd2.applyChanges: current rows of really-changed keys
    // close at the change date; new versions open; unchanged keys keep
    // their open row. (All dim rows start current here, so the
    // history leg is empty by construction.)
    "maint_scd2" ->
      """WITH dim AS (SELECT c_custkey, c_mktsegment AS seg,
           DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
           true AS is_current FROM customer),
         chg AS (SELECT DISTINCT o_custkey AS c_custkey, 'VIP' AS seg
                 FROM orders WHERE o_totalprice > 400000.0
                 UNION ALL SELECT -1, 'NEWSEG'),
         real AS (SELECT c.c_custkey, c.seg FROM chg c
                  LEFT JOIN dim d ON c.c_custkey = d.c_custkey
                  WHERE d.c_custkey IS NULL OR d.seg <> c.seg),
         kept AS (SELECT d.* FROM dim d
                  LEFT JOIN real r ON d.c_custkey = r.c_custkey
                  WHERE r.c_custkey IS NULL),
         closed AS (SELECT d.c_custkey, d.seg, d.valid_from,
                    DATE '2024-06-01' AS valid_to, false AS is_current
                    FROM dim d JOIN real r ON d.c_custkey = r.c_custkey),
         ins AS (SELECT r.c_custkey, r.seg,
                 DATE '2024-06-01' AS valid_from,
                 CAST(NULL AS DATE) AS valid_to, true AS is_current
                 FROM real r)
         SELECT * FROM kept UNION ALL SELECT * FROM closed
         UNION ALL SELECT * FROM ins""",

    "merge_upsert" ->
      """WITH u0 AS (SELECT o_custkey, count(*) AS n_big FROM orders
                     WHERE o_totalprice > 400000.0 GROUP BY o_custkey),
         u AS (SELECT o_custkey AS k, 'VIP' AS seg,
                      CAST(n_big * 1000 AS DOUBLE) AS bal FROM u0
               UNION ALL
               SELECT -o_custkey, 'NEW', 0.0 FROM u0
               WHERE o_custkey % 7 = 0)
         SELECT coalesce(u.k, c.c_custkey) AS c_custkey,
                c.c_name AS c_name,
                coalesce(u.seg, c.c_mktsegment) AS c_mktsegment,
                coalesce(u.bal, c.c_acctbal) AS c_acctbal
         FROM customer c FULL OUTER JOIN u ON c.c_custkey = u.k""",

    // The merged incremental state must equal a full recompute.
    "incremental_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_price
         FROM orders GROUP BY o_custkey""",

    // Mirrors GeoMean's exact-decimal partial state: per-row ln
    // rounded to 18dp, exact decimal sum (order-independent), double
    // division + exp at the end. The positivity filter mirrors
    // reduce()'s skip of non-positive inputs, and the outer coalesce
    // mirrors finish()'s 0.0 sentinel for groups with NO positive
    // inputs (SUM over zero rows is NULL here) — dividing by COUNT(*)
    // or dropping the coalesce would diverge on any dataset with a
    // zero/negative measure (l_quantity happens to be all-positive;
    // the oracle must not depend on that).
    "agg_udaf" ->
      """SELECT l_returnflag,
         coalesce(round(exp(CAST(SUM(CASE WHEN l_quantity > 0
                     THEN CAST(ln(l_quantity) AS DECIMAL(38,18)) END)
                   AS DOUBLE)
               / COUNT(CASE WHEN l_quantity > 0 THEN 1 END)), 6), 0.0)
           AS geo_qty,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag""",

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         COUNT(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus""",

    "q10_returned" ->
      """WITH rev AS (SELECT l.l_orderkey,
             CAST(l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(4,2)) -
                CAST(l_discount AS DECIMAL(4,2))) AS rev
           FROM lineitem l WHERE l_returnflag = 'R'),
         per AS (SELECT o_custkey, SUM(rev.rev) AS revd
           FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
           WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
             AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           GROUP BY o_custkey)
         SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(per.revd AS DOUBLE) AS revenue
         FROM per
         JOIN customer c ON per.o_custkey = c.c_custkey
         JOIN nation n ON c.c_nationkey = n.n_nationkey
         ORDER BY per.revd DESC, c.c_custkey LIMIT 20""",

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_d
           FROM lineitem GROUP BY l_orderkey
           HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
         SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice,
           CAST(big.sum_qty_d AS DOUBLE) AS sum_qty
         FROM big
         JOIN orders o ON big.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100""",

    "q3_join_topk" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
         CAST(epoch(MAX(o_orderdate)) AS BIGINT) AS o_date_epoch
         FROM lineitem, orders, customer
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",

    "q5_multi_join" ->
      """SELECT n_name,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
         FROM lineitem, orders, customer, supplier, nation, region
         WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
           AND l_suppkey = s_suppkey AND s_nationkey = c_nationkey
           AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
           AND r_name = 'ASIA'
         GROUP BY n_name""",

    "window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",

    // identical oracle by design: the salted two-phase plan must be
    // result-equivalent to the single window
    "window_topk_salted" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 3""",

    "window_running" ->
      """SELECT l_orderkey, l_linenumber,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
           PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_qty
         FROM lineitem WHERE l_orderkey < 1000""",

    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         LIMIT 25""",

    "set_ops" ->
      """(SELECT c_custkey AS key FROM customer
          WHERE c_mktsegment = 'BUILDING'
          UNION
          SELECT DISTINCT o_custkey AS key FROM orders
          WHERE o_totalprice > 400000)
         EXCEPT
         SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0""",

    "set_intersect" ->
      """SELECT c_custkey AS key FROM customer
         WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS key FROM orders""",

    "rollup_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",

    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""",

    "distinct_agg" ->
      """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
         COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
         FROM lineitem""",

    "join_semi" ->
      """SELECT c_mktsegment, COUNT(*) AS n FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)
         GROUP BY c_mktsegment""",

    "join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 300000)""",

    "join_outer" ->
      """SELECT c_custkey, COALESCE(n_orders, 0) AS n_orders
         FROM customer LEFT JOIN (
           SELECT o_custkey, COUNT(*) AS n_orders FROM orders
           GROUP BY o_custkey) ON c_custkey = o_custkey""",

    "events_json" ->
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
         FROM events""",

    "events_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q6_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND l_quantity < 24
           AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.05 AND 0.07""",

    "q4_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_returnflag = 'R')
         GROUP BY o_orderpriority""",

    // Same association as the Spark selectExpr — the component sums
    // are exact decimals whose unscaled values sit below 2^53, so the
    // double casts are exact and the formula is bit-deterministic.
    "profile_corr" ->
      """WITH c AS (SELECT count(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(18,0))) AS sxd,
           SUM(CAST(l_discount AS DECIMAL(4,2)) * 100) AS syd,
           SUM(CAST(l_quantity AS DECIMAL(18,0)) *
               CAST(l_quantity AS DECIMAL(18,0))) AS sxxd,
           SUM((CAST(l_discount AS DECIMAL(4,2)) * 100) *
               (CAST(l_discount AS DECIMAL(4,2)) * 100)) AS syyd,
           SUM(CAST(l_quantity AS DECIMAL(18,0)) *
               (CAST(l_discount AS DECIMAL(4,2)) * 100)) AS sxyd
           FROM lineitem)
         SELECT n,
           CAST(sxd AS DOUBLE) / n AS mean_qty,
           CAST(syd AS DOUBLE) / n AS mean_disc_pct,
           (n * CAST(sxyd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(syd AS DOUBLE))
             / (sqrt(n * CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE))
                * sqrt(n * CAST(syyd AS DOUBLE) - CAST(syd AS DOUBLE) * CAST(syd AS DOUBLE)))
             AS corr_qty_disc,
           (n * CAST(sxyd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(syd AS DOUBLE))
             / (n * CAST(sxxd AS DOUBLE) - CAST(sxd AS DOUBLE) * CAST(sxd AS DOUBLE))
             AS beta_disc_on_qty
         FROM c""",

    "window_cume" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
         percent_rank() OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal) AS pr,
         cume_dist() OVER (PARTITION BY c_mktsegment
           ORDER BY c_acctbal) AS cd
         FROM customer""",

    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS DOUBLE) AS revenue
         FROM supplier, lineitem, orders, customer, nation n1, nation n2
         WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
           AND c_custkey = o_custkey
           AND s_nationkey = n1.n_nationkey
           AND c_nationkey = n2.n_nationkey
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
                (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY 1, 2, 3""",

    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
           SELECT c_custkey, COUNT(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         GROUP BY c_count""",

    "q14_promo_share" ->
      """WITH a AS (SELECT
           SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
               (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
             END) AS promo_d,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
             AS all_d,
           COUNT(*) AS n_rows
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00')
         SELECT 100.0 * coalesce(CAST(promo_d AS DOUBLE), 0.0)
             / CAST(all_d AS DOUBLE) AS promo_share,
           n_rows
         FROM a""",

    "q17_small_qty" ->
      """WITH lb AS (SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#1'),
         avgq AS (SELECT l_partkey AS a_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
           FROM lb GROUP BY l_partkey)
         SELECT coalesce(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
               AS DOUBLE), 0.0) / 7.0 AS avg_yearly,
           COUNT(*) AS n_rows
         FROM lb JOIN avgq ON l_partkey = a_partkey
         WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""",

    "q2_min_offer" ->
      """WITH eur AS (SELECT n_nationkey FROM nation JOIN region
             ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
         sup AS (SELECT s_suppkey, s_name, s_acctbal FROM supplier
           JOIN eur ON s_nationkey = n_nationkey),
         offers AS (SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS best
           FROM lineitem JOIN sup ON s_suppkey = l_suppkey
           GROUP BY 1, 2),
         mins AS (SELECT l_partkey AS m_partkey, min(best) AS mn
           FROM offers GROUP BY 1)
         SELECT p_partkey, p_name, l_suppkey, s_name, s_acctbal,
           CAST(best AS DOUBLE) AS best_price
         FROM offers JOIN mins ON l_partkey = m_partkey AND best = mn
         JOIN part ON p_partkey = l_partkey
         JOIN sup ON s_suppkey = l_suppkey
         WHERE p_size <= 15 AND p_type = 'LARGE'""",

    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
             AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE)
             AS total_revenue
         FROM rev JOIN supplier ON s_suppkey = l_suppkey
         WHERE total_rev = (SELECT max(total_rev) FROM rev)""",

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
         COUNT(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
           AND p_size IN (1, 9, 19, 25, 36, 49)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             WHERE s_acctbal < 0)
         GROUP BY 1, 2, 3""",

    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS DOUBLE) AS revenue,
         COUNT(*) AS n_rows
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",

    "q8_market_share" ->
      """WITH base AS (SELECT year(o_orderdate) AS o_year,
           CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
             AS rev,
           n2.n_name AS supp_nation
           FROM part, lineitem, orders, customer, supplier,
             nation n1, nation n2, region
           WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
             AND o_custkey = c_custkey
             AND c_nationkey = n1.n_nationkey
             AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
             AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
             AND p_type = 'STANDARD'
             AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
         SELECT o_year,
           100.0 * coalesce(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
               THEN rev END) AS DOUBLE), 0.0)
             / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_rows
         FROM base GROUP BY o_year""",

    "q9_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
           AS DOUBLE)
         - 0.5 * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) *
             CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS profit,
         COUNT(*) AS n_rows
         FROM part, lineitem, orders, supplier, nation
         WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
           AND s_suppkey = l_suppkey AND s_nationkey = n_nationkey
           AND p_name LIKE '%red%'
         GROUP BY 1, 2""",

    "q11_important_parts" ->
      """WITH pv AS (SELECT l_partkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val_d
           FROM lineitem GROUP BY l_partkey)
         SELECT l_partkey, CAST(val_d AS DOUBLE) AS part_value
         FROM pv
         WHERE CAST(val_d AS DOUBLE) >
           0.0006 * (SELECT CAST(SUM(val_d) AS DOUBLE) FROM pv)""",

    "q12_priority_class" ->
      """SELECT l_returnflag,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY l_returnflag""",

    "q20_excess_supply" ->
      """WITH redl AS (SELECT l_suppkey, l_quantity FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part
             WHERE p_name LIKE 'red%')),
         per AS (SELECT l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_d
           FROM redl GROUP BY l_suppkey),
         stats AS (SELECT CAST(SUM(qty_d) AS DOUBLE) AS tot,
             COUNT(*) AS nsup
           FROM per)
         SELECT s_suppkey, s_name, n_name,
           CAST(qty_d AS DOUBLE) AS red_qty
         FROM per, stats, supplier, nation
         WHERE CAST(qty_d AS DOUBLE) > 1.2 * tot / nsup
           AND s_suppkey = l_suppkey AND n_nationkey = s_nationkey""",

    "q21_sole_returner" ->
      """WITH l97 AS (SELECT l_orderkey, l_suppkey, l_returnflag
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
         ord AS (SELECT l_orderkey AS o_key,
             COUNT(DISTINCT l_suppkey) AS nsup,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
               THEN l_suppkey END) AS nret
           FROM l97 GROUP BY l_orderkey)
         SELECT s_name, COUNT(DISTINCT l.l_orderkey) AS numwait
         FROM l97 l JOIN ord ON l.l_orderkey = ord.o_key
         JOIN supplier ON s_suppkey = l.l_suppkey
         WHERE l.l_returnflag = 'R' AND ord.nsup >= 2 AND ord.nret = 1
         GROUP BY s_name
         ORDER BY numwait DESC, s_name LIMIT 20""",

    "profile_kanon" ->
      """WITH g AS (SELECT c_mktsegment, c_nationkey,
           count(*) AS group_size
           FROM customer GROUP BY 1, 2)
         SELECT count(*) AS n_groups,
           CAST(SUM(CASE WHEN group_size < 5 THEN 1 ELSE 0 END)
             AS BIGINT) AS risky_groups,
           CAST(SUM(CASE WHEN group_size < 5 THEN group_size ELSE 0 END)
             AS BIGINT) AS risky_rows,
           min(group_size) AS min_group_size
         FROM g""",

    // Sort-based spelling of the textbook dominance (≤/≥ on both
    // dims, strict on at least one), provably the same set as the
    // NOT-EXISTS dominator form but O(n log n): a row survives iff
    // its date is the max within its exact price AND strictly beats
    // the running max date over all strictly-cheaper prices. (The
    // original quadratic NOT EXISTS was the oracle through round 11's
    // sf0.1 runs — hash-identical there — but is intractable in
    // DuckDB at the derived sf1.0's 1.5M orders.)
    "skyline_pareto" ->
      """WITH s AS (SELECT o_orderkey, o_totalprice, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS pc
           FROM orders),
         w AS (SELECT *,
           max(o_orderdate) OVER (PARTITION BY pc) AS grp_max,
           max(o_orderdate) OVER (ORDER BY pc
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS cheaper_max
           FROM s)
         SELECT o_orderkey, o_totalprice,
           CAST(epoch(o_orderdate) AS BIGINT) AS date_epoch
         FROM w
         WHERE o_orderdate = grp_max
           AND (cheaper_max IS NULL OR cheaper_max < o_orderdate)""",

    "profile_ldiv" ->
      """WITH g AS (SELECT c_nationkey, count(*) AS group_size,
           count(DISTINCT c_mktsegment) AS l_div
           FROM customer GROUP BY 1)
         SELECT count(*) AS n_groups,
           CAST(SUM(CASE WHEN l_div < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS low_diversity_groups,
           min(l_div) AS min_l,
           CAST(SUM(CASE WHEN l_div < 3 THEN group_size ELSE 0 END)
             AS BIGINT) AS exposed_rows
         FROM g""",

    // Entropy replay: same one-count-per-distinct-value shape; the
    // HUGEINT total casts to DOUBLE inside the ratio.
    "profile_entropy" ->
      """WITH cv AS (SELECT 'lang' AS c, lang AS v FROM documents
                     UNION ALL SELECT 'source', source FROM documents),
         cnt AS (SELECT c, v, count(*) AS n FROM cv GROUP BY 1, 2),
         tot AS (SELECT c, sum(n) AS tot FROM cnt GROUP BY 1)
         SELECT cnt.c, count(*) AS n_values,
           round(-sum((n / CAST(tot AS DOUBLE)) *
                      ln(n / CAST(tot AS DOUBLE))), 6) AS entropy_nats
         FROM cnt JOIN tot USING (c) GROUP BY cnt.c""",

    // Benford replay: identical integer-cents leading digit; the
    // expected shares are the same 9 plan-time constants.
    "profile_benford" ->
      """WITH c AS (SELECT substr(CAST(CAST(round(o_totalprice * 100)
                AS BIGINT) AS VARCHAR), 1, 1) AS digit,
              count(*) AS n
              FROM orders WHERE o_totalprice > 0 GROUP BY 1),
          t AS (SELECT sum(n) AS t FROM c)
          SELECT digit, n,
            CAST(n * 1000 // t.t AS BIGINT) AS share_milli,
            CAST(CASE digit WHEN '1' THEN 301 WHEN '2' THEN 176
              WHEN '3' THEN 125 WHEN '4' THEN 97 WHEN '5' THEN 79
              WHEN '6' THEN 67 WHEN '7' THEN 58 WHEN '8' THEN 51
              WHEN '9' THEN 46 END AS BIGINT) AS benford_milli
          FROM c CROSS JOIN t""",

    // PSI replay: identical guard — one-sided values count, never an
    // infinite log term.
    "profile_drift" ->
      """WITH cv AS (SELECT 'lang' AS c, lang AS v, doc_id % 2 = 0 AS h
                     FROM documents
                     UNION ALL
                     SELECT 'source', source, doc_id % 2 = 0
                     FROM documents),
         cnt AS (SELECT c, v,
                 SUM(CASE WHEN h THEN 1 ELSE 0 END) AS na,
                 SUM(CASE WHEN h THEN 0 ELSE 1 END) AS nb
                 FROM cv GROUP BY 1, 2),
         tot AS (SELECT c, sum(na) AS ta, sum(nb) AS tb
                 FROM cnt GROUP BY 1)
         SELECT cnt.c,
           CAST(SUM(CASE WHEN na = 0 OR nb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_onesided,
           round(SUM(CASE WHEN na > 0 AND nb > 0 THEN
             (na / CAST(ta AS DOUBLE) - nb / CAST(tb AS DOUBLE)) *
             ln((na / CAST(ta AS DOUBLE)) / (nb / CAST(tb AS DOUBLE)))
             ELSE 0.0 END), 6) AS psi
         FROM cnt JOIN tot USING (c) GROUP BY cnt.c""",

    "q22_idle_customers" ->
      """WITH avgbal AS (SELECT
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS ab
           FROM customer WHERE c_acctbal > 0.0)
         SELECT substr(c_name, 17, 2) AS code, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
         FROM customer
         WHERE c_acctbal > (SELECT ab FROM avgbal)
           AND NOT EXISTS (SELECT 1 FROM orders
             WHERE o_custkey = c_custkey
               AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
         GROUP BY 1""",

    "anon_coarsen" ->
      """WITH cust AS (
           SELECT c_custkey, c_mktsegment AS seg, n_name AS nat,
             r_name AS reg
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey),
         cnt0 AS (SELECT nat, seg, count(*) AS n0 FROM cust
                  GROUP BY 1, 2),
         wn0 AS (SELECT cust.*, n0 FROM cust
                 JOIN cnt0 USING (nat, seg)),
         cnt1 AS (SELECT reg, seg, count(*) AS n1 FROM wn0
                  WHERE n0 < 12 GROUP BY 1, 2)
         SELECT c_custkey,
           CASE WHEN n0 >= 12 THEN nat
                WHEN n1 >= 12 THEN reg ELSE '*' END AS qi_geo,
           CASE WHEN n0 >= 12 OR n1 >= 12 THEN seg
                ELSE '*' END AS qi_seg,
           CAST(CASE WHEN n0 >= 12 THEN 0
                     WHEN n1 >= 12 THEN 1 ELSE 2 END AS BIGINT)
             AS gen_level
         FROM wn0 LEFT JOIN cnt1 USING (reg, seg)""",

    "profile_ks" ->
      """WITH d AS (SELECT n_chars AS v, doc_id % 2 = 0 AS h
                    FROM documents),
         cnt AS (SELECT v,
             SUM(CASE WHEN h THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN h THEN 0 ELSE 1 END) AS cb
           FROM d GROUP BY 1),
         tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                        CAST(SUM(cb) AS BIGINT) AS nb FROM cnt),
         cum AS (SELECT v,
             CAST(SUM(ca) OVER (ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma,
             CAST(SUM(cb) OVER (ORDER BY v
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumb
           FROM cnt),
         agg AS (SELECT count(*) AS n_values,
             CAST(MAX(ABS(cuma*nb - cumb*na)) AS BIGINT) AS d_num,
             CAST(MAX(na*nb) AS BIGINT) AS d_den
           FROM cum CROSS JOIN tot)
         SELECT n_values, d_num, d_den,
           CAST(d_num AS DOUBLE) / d_den AS d_stat
         FROM agg""",

    "join_agg_auto" ->
      """WITH li AS (SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS q_c
           FROM lineitem),
         pp AS (SELECT l_partkey, count(*) AS n_li,
             CAST(SUM(q_c) AS BIGINT) AS s_c
           FROM li GROUP BY 1)
         SELECT li.l_partkey, l_orderkey, l_linenumber, q_c, n_li, s_c
         FROM li JOIN pp USING (l_partkey)
         WHERE q_c * n_li * 10 > s_c * 12""",

    "profile_mutual_info" ->
      """WITH cnt AS (SELECT lang, source, count(*) AS n
                      FROM documents GROUP BY 1, 2),
         ml AS (SELECT lang, sum(n) AS nl FROM cnt GROUP BY 1),
         ms AS (SELECT source, sum(n) AS ns FROM cnt GROUP BY 1),
         tot AS (SELECT sum(n) AS t FROM cnt)
         SELECT count(*) AS n_cells,
           round(SUM((CAST(n AS DOUBLE) / t) *
             ln((CAST(n AS DOUBLE) * t) /
                (CAST(nl AS DOUBLE) * ns))), 6) AS mi_nats
         FROM cnt JOIN ml USING (lang) JOIN ms USING (source)
         CROSS JOIN tot""",

    "join_skew_salted" ->
      """SELECT l_suppkey AS suppkey, l_orderkey, l_linenumber, s_name
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""",

    "profile_skew" ->
      """WITH f AS (SELECT l_suppkey, count(*) AS cnt
                    FROM lineitem GROUP BY 1)
         SELECT count(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_cnt,
           CAST(MIN(cnt) AS BIGINT) AS min_cnt,
           CAST(MAX(cnt) * 10000 // SUM(cnt) AS BIGINT)
             AS top_share_bp,
           CAST(MAX(cnt) * count(*) * 10000 // SUM(cnt) AS BIGINT)
             AS imbalance_bp
         FROM f""",

    "profile_gini" ->
      """WITH spend AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
               AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         r AS (
           SELECT c_nationkey, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
               ORDER BY cents, c_custkey) AS BIGINT) AS rk
           FROM spend JOIN customer ON o_custkey = c_custkey)
         SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST((2*SUM(rk*cents) - (COUNT(*)+1)*SUM(cents)) * 10000
             // (COUNT(*)*SUM(cents)) AS BIGINT) AS gini_bp
         FROM r GROUP BY 1""",

    // Same full contingency grid (zero cells via the marginal cross +
    // left join), same HUGEINT-exact cell terms — non-negative, so
    // DuckDB's floor // matches Spark's trunc DIV.
    "profile_cramers_v" ->
      """WITH o AS (SELECT o_orderpriority AS rcat,
             o_orderstatus AS ccat FROM orders),
         obs AS (SELECT rcat, ccat, count(*) AS obs FROM o GROUP BY 1, 2),
         rt AS (SELECT rcat, count(*) AS r FROM o GROUP BY 1),
         ct AS (SELECT ccat, count(*) AS c FROM o GROUP BY 1),
         nn AS (SELECT count(*) AS n FROM o),
         cells AS (SELECT rt.rcat, ct.ccat, rt.r, ct.c,
             coalesce(obs.obs, 0) AS obs, nn.n
           FROM rt CROSS JOIN ct
           LEFT JOIN obs ON rt.rcat = obs.rcat AND ct.ccat = obs.ccat
           CROSS JOIN nn),
         t AS (SELECT n, rcat, ccat,
             CAST((n::HUGEINT*obs - r::HUGEINT*c)
                  * (n::HUGEINT*obs - r::HUGEINT*c) * 1000000
                  // (n::HUGEINT * r * c) AS BIGINT) AS term
           FROM cells)
         SELECT max(n) AS n,
           count(DISTINCT rcat) AS n_rcat,
           count(DISTINCT ccat) AS n_ccat,
           CAST(sum(term) AS BIGINT) AS chi2_micro,
           CAST(sum(term) // (max(n) * greatest(
             least(count(DISTINCT rcat), count(DISTINCT ccat)) - 1, 1))
             AS BIGINT) AS v2_micro
         FROM t"""
  )
}
