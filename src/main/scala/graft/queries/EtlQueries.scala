package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Engine
import Tables._

/** Faithful-surface queries: every operator of the reference DSL
  * exercised through `Engine.transform` on the (all-string view of
  * the) testdata tables, each with an ANSI-SQL oracle encoding the
  * same semantics for DuckDB.
  *
  * Cross-engine determinism notes:
  *   - double → string casts agree between Spark and DuckDB for the
  *     value ranges here (plain decimal notation, no exponent);
  *   - row-order-sensitive output (`self[]`) pins ingest order to a
  *     key column so the oracle's `row_number() OVER (ORDER BY ...)`
  *     sees the same order.
  */
object EtlQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SURVEY §7.2 minimum slice: ops 4,10,11,13,14,15,16,19.
    "etl_filter_project" -> ((s, d) =>
      Engine.transform(customer(s, d), Seq(
        "// adult active customers" -> "",
        "_filter:bal" -> "eval: src[c_acctbal] >= 0 || src[c_mktsegment] == BUILDING",
        "Name"    -> "src[c_name]",
        "Balance" -> "src[c_acctbal]",
        "Status"  -> "constant:Active"))),

    // Loose string equality + OR chain on lineitem flags.
    "etl_loose_eq_or" -> ((s, d) =>
      Engine.transform(lineitem(s, d), Seq(
        "_filter:f" -> "eval: src[l_returnflag] == R || src[l_linestatus] == O",
        "OrderKey" -> "src[l_orderkey]",
        "Line"     -> "src[l_linenumber]",
        "Flag"     -> "src[l_returnflag]",
        "Stat"     -> "src[l_linestatus]"))),

    // parseFloat-prefix coercion: '123%' compares as 123.
    "etl_relational_pct" -> ((s, d) => {
      val src = customer(s, d).select(col("c_custkey"),
        concat((col("c_custkey") % 150).cast("string"), lit("%")).as("pct"))
      Engine.transform(src, Seq(
        "_filter:p" -> "eval: src[pct] > 50",
        "Key" -> "src[c_custkey]",
        "Pct" -> "src[pct]"))
    }),

    // Formula text + self[] A1 addressing with post-filter row
    // numbers; ingest order pinned to c_custkey for the oracle.
    "etl_formula_self" -> ((s, d) =>
      Engine.transform(customer(s, d), Seq(
        "_filter:pos" -> "eval: src[c_acctbal] >= 0",
        "Name" -> "src[c_name]",
        "Bal"  -> "formula:=src[c_acctbal]*2",
        "Ref"  -> "formula:=self[Bal]&\"!\""),
        ingestOrder = Seq(col("c_custkey").cast("long")))),

    // DIRECT bare-header resolution, literal passthrough, constants
    // with src splices.
    "etl_direct_constant" -> ((s, d) =>
      Engine.transform(nation(s, d), Seq(
        "NationName" -> "n_name",
        "Literal"    -> "NotAColumn",
        "Tag"        -> "constant:v1",
        "Mixed"      -> "constant:nation-src[n_nationkey]"))),

    // Formula splice quoting heuristic (main.gs:90-95): non-numeric
    // values quoted as string literals, numeric and percent values
    // bare, empty cells bare (isNaN("") is false — verified corner).
    "etl_formula_quote" -> ((s, d) => {
      val src = nation(s, d).select(col("n_nationkey"), col("n_name"),
        concat((col("n_nationkey") % 97).cast("string"), lit("%"))
          .as("pct"),
        lit("").as("emptycell"))
      Engine.transform(src, Seq(
        "F" -> "formula:=CONCAT(src[n_name],src[n_nationkey])",
        "P" -> "formula:=src[pct]*2",
        "E" -> "formula:=+src[emptycell]"))
    }),

    // No-op non-eval filter; op-less and mis-arity disjuncts fold to
    // false inside an OR chain.
    "etl_noop_malformed" -> ((s, d) =>
      Engine.transform(nation(s, d), Seq(
        "_filter:note" -> "anything",
        "_filter:x" -> "eval: junk || src[n_name] == NATION_7 || a==b==c",
        "Name" -> "src[n_name]"))),

    // `_join:` multi-sheet equi-join (reference roadmap README:122):
    // orders enriched from a Customer sheet; the joined columns are
    // src[]-addressable downstream. Inner join on display-string
    // equality == integer-key equality for integral keys.
    "etl_join_lookup" -> ((s, d) =>
      Engine.transform(orders(s, d), Seq(
        "_join:Customer" -> "src[o_custkey] == other[c_custkey]",
        "OrderKey" -> "src[o_orderkey]",
        "CustName" -> "src[c_name]",
        "Segment"  -> "src[c_mktsegment]"),
        sheets = Map("Customer" -> customer(s, d)))),

    // Chained joins with SEQUENTIAL key visibility: the Region join's
    // src key (n_regionkey) exists only after the Nation join; a
    // filter then references a joined column.
    "etl_join_chain" -> ((s, d) =>
      Engine.transform(customer(s, d), Seq(
        "_join:Nation" -> "src[c_nationkey] == other[n_nationkey]",
        "_join:Region" -> "src[n_regionkey] == other[r_regionkey]",
        "_filter:seg" -> "eval: src[c_mktsegment] == BUILDING",
        "Name"   -> "src[c_name]",
        "Nation" -> "src[n_name]",
        "Region" -> "src[r_name]"),
        sheets = Map("Nation" -> nation(s, d),
          "Region" -> region(s, d)))),

    // Name-collision shadowing: the joined sheet also has `n_name`,
    // so src[n_name] resolves to the JOINED (uppercased) value —
    // displayString's last-wins convention across sheets.
    "etl_join_shadow" -> ((s, d) => {
      val lookup = nation(s, d).select(col("n_nationkey").as("id"),
        upper(col("n_name")).as("n_name"))
      Engine.transform(nation(s, d), Seq(
        "_join:Names" -> "src[n_nationkey] == other[id]",
        "Key"  -> "src[n_nationkey]",
        "Name" -> "src[n_name]"),
        sheets = Map("Names" -> lookup))
    }),

    // `_plugin:` transforms (reference roadmap README:126), chained
    // in rule order on the pre-projection sheet: trim_cells erases
    // the planted padding, then dedupe collapses to DISTINCT rows —
    // whole-sheet row transforms a Map-sheet author can invoke
    // without touching engine code (Engine.registerPlugin adds more).
    "etl_plugin_chain" -> ((s, d) => {
      val src = lineitem(s, d).select(
        concat(lit("  "), col("l_returnflag")).as("Flag0"),
        col("l_linestatus"))
      Engine.transform(src, Seq(
        "_plugin:trim_cells" -> "",
        "_plugin:dedupe" -> "",
        "Flag" -> "src[Flag0]",
        "Stat" -> "src[l_linestatus]"))
    }),

    // EXTENDED expression mode (`eval2:` — the reference's "Advanced
    // expression parser" roadmap idea, README:121): `&&` conjunction
    // inside one rule, strict parse-time validation. Faithful `eval:`
    // keeps its ||-only grammar untouched.
    "etl_expr_and" -> ((s, d) =>
      Engine.transform(customer(s, d), Seq(
        "_filter:f" -> ("eval2: src[c_mktsegment] == BUILDING && " +
          "src[c_acctbal] > 1000"),
        "Name" -> "src[c_name]",
        "Seg"  -> "src[c_mktsegment]",
        "Bal"  -> "src[c_acctbal]"))),

    // `!`-negation of a whole group: two-valued semantics (a leaf that
    // can't evaluate is FALSE before negation — spec'd in EngineSpec).
    "etl_expr_not" -> ((s, d) =>
      Engine.transform(customer(s, d), Seq(
        "_filter:f" -> ("eval2: !(src[c_mktsegment] == BUILDING || " +
          "src[c_mktsegment] == MACHINERY)"),
        "Name" -> "src[c_name]",
        "Seg"  -> "src[c_mktsegment]"))),

    // Precedence corner: && binds tighter than || — a || b && c is
    // a || (b && c). Nation (bounded) keeps the corner readable.
    "etl_expr_nested" -> ((s, d) =>
      Engine.transform(nation(s, d), Seq(
        "_filter:f" -> ("eval2: src[n_nationkey] < 5 || " +
          "src[n_regionkey] == 2 && src[n_nationkey] > 10"),
        "Key"    -> "src[n_nationkey]",
        "Region" -> "src[n_regionkey]"))),

    // Parentheses override precedence: (a || b) && c.
    "etl_expr_parens" -> ((s, d) =>
      Engine.transform(lineitem(s, d), Seq(
        "_filter:f" -> ("eval2: (src[l_returnflag] == R || " +
          "src[l_returnflag] == A) && src[l_quantity] >= 30"),
        "OrderKey" -> "src[l_orderkey]",
        "Line"     -> "src[l_linenumber]",
        "Flag"     -> "src[l_returnflag]",
        "Qty"      -> "src[l_quantity]"))),

    // Execution history + logging dashboard (reference roadmap
    // README:124-125): two runMapping invocations against a fresh
    // sheet dir — one ok, one aborted by a `_type:` violation — each
    // append a run record to the `Runs` parquet table; the query
    // projects the deterministic fields (sheet name, rule-sheet MD5
    // digest, rows written, outcome). The failed run is RECORDED and
    // still rethrown — history observes fail-fast, never swallows it.
    "etl_run_history" -> ((s, d) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-runs")
      val rows = nation(s, d)
        .select(col("n_nationkey").cast("string"), col("n_name"),
          col("n_regionkey").cast("string"))
        .collect()
        .map(r => s"${r.getString(0)},${r.getString(1)},${r.getString(2)}")
      java.nio.file.Files.writeString(tmp.resolve("Source.csv"),
        ("n_nationkey,n_name,n_regionkey" +: rows.toSeq)
          .mkString("\n") + "\n")
      java.nio.file.Files.writeString(tmp.resolve("Map1.csv"),
        "out,instr\n_filter:r,eval: src[n_regionkey] == 2\n" +
          "Name,src[n_name]\n")
      java.nio.file.Files.writeString(tmp.resolve("Map2.csv"),
        "out,instr\n_type:n_name,numeric\nName,src[n_name]\n")
      Engine.runMapping(s, tmp.toString,
        graft.etl.EngineConfig(map = "Map1", history = "Runs"))
      try Engine.runMapping(s, tmp.toString,
        graft.etl.EngineConfig(map = "Map2", history = "Runs"))
      catch { case _: graft.etl.dsl.Ast.DslError => () }
      s.read.parquet(s"$tmp/Runs")
        .select(col("map_sheet"), col("rules_digest"), col("rows_out"),
          col("status"), col("error").isNotNull.as("has_error"))
    }),

    // `_type:` declarations (reference roadmap README:123) that HOLD
    // on the data: the run proceeds and the output is the plain
    // filter+projection (violation paths are spec'd in EngineSpec —
    // they abort before any sink write).
    "etl_type_valid" -> ((s, d) => {
      val src = orders(s, d).select(col("o_orderkey"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_orderstatus"))
      Engine.transform(src, Seq(
        "_type:o_orderkey"    -> "integer",
        "_type:o_totalprice"  -> "numeric",
        "_type:odate"         -> "date",
        "_type:o_orderstatus" -> "nonempty",
        "_filter:st" -> "eval: src[o_orderstatus] == F",
        "Key"   -> "src[o_orderkey]",
        "Total" -> "src[o_totalprice]",
        "Date"  -> "src[odate]"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "etl_filter_project" ->
      """SELECT c_name AS Name, CAST(c_acctbal AS VARCHAR) AS Balance,
         'Active' AS Status
         FROM customer
         WHERE c_acctbal >= 0 OR c_mktsegment = 'BUILDING'""",

    "etl_loose_eq_or" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS OrderKey,
         CAST(l_linenumber AS VARCHAR) AS Line,
         l_returnflag AS Flag, l_linestatus AS Stat
         FROM lineitem
         WHERE l_returnflag = 'R' OR l_linestatus = 'O'""",

    "etl_relational_pct" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS Key,
         CAST(c_custkey % 150 AS VARCHAR) || '%' AS Pct
         FROM customer WHERE (c_custkey % 150) > 50""",

    "etl_formula_self" ->
      """SELECT c_name AS Name,
         '=' || CAST(c_acctbal AS VARCHAR) || '*2' AS Bal,
         '=B' || CAST(rn + 1 AS VARCHAR) || '&"!"' AS Ref
         FROM (SELECT c_name, c_acctbal,
                      row_number() OVER (ORDER BY c_custkey) AS rn
               FROM customer WHERE c_acctbal >= 0)""",

    "etl_direct_constant" ->
      """SELECT n_name AS NationName, 'NotAColumn' AS Literal,
         'v1' AS Tag,
         'nation-' || CAST(n_nationkey AS VARCHAR) AS Mixed
         FROM nation""",

    "etl_formula_quote" ->
      """SELECT
         '=CONCAT("' || n_name || '",' || CAST(n_nationkey AS VARCHAR)
           || ')' AS F,
         '=' || CAST(n_nationkey % 97 AS VARCHAR) || '%*2' AS P,
         '=+' AS E
         FROM nation""",

    "etl_noop_malformed" ->
      "SELECT n_name AS Name FROM nation WHERE n_name = 'NATION_7'",

    "etl_join_lookup" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS OrderKey,
         c_name AS CustName, c_mktsegment AS Segment
         FROM orders JOIN customer ON o_custkey = c_custkey""",

    "etl_join_chain" ->
      """SELECT c_name AS Name, n_name AS Nation, r_name AS Region
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_mktsegment = 'BUILDING'""",

    "etl_join_shadow" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS Key,
         upper(n_name) AS Name FROM nation""",

    "etl_plugin_chain" ->
      """SELECT DISTINCT l_returnflag AS Flag, l_linestatus AS Stat
         FROM lineitem""",

    "etl_expr_and" ->
      """SELECT c_name AS Name, c_mktsegment AS Seg,
         CAST(c_acctbal AS VARCHAR) AS Bal
         FROM customer
         WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000""",

    "etl_expr_not" ->
      """SELECT c_name AS Name, c_mktsegment AS Seg
         FROM customer
         WHERE NOT (c_mktsegment = 'BUILDING'
                    OR c_mktsegment = 'MACHINERY')""",

    "etl_expr_nested" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS Key,
         CAST(n_regionkey AS VARCHAR) AS Region
         FROM nation
         WHERE n_nationkey < 5
            OR (n_regionkey = 2 AND n_nationkey > 10)""",

    "etl_expr_parens" ->
      """SELECT CAST(l_orderkey AS VARCHAR) AS OrderKey,
         CAST(l_linenumber AS VARCHAR) AS Line,
         l_returnflag AS Flag, CAST(l_quantity AS VARCHAR) AS Qty
         FROM lineitem
         WHERE (l_returnflag = 'R' OR l_returnflag = 'A')
           AND l_quantity >= 30""",

    // the run records' deterministic fields, replayed: digests are
    // md5 over the canonical rule encoding (U+0001 in-pair, U+0002
    // between rows), the ok run's rows_out is the filter's count
    "etl_run_history" ->
      """SELECT 'Map1' AS map_sheet,
           md5('_filter:r' || chr(1) || 'eval: src[n_regionkey] == 2'
               || chr(2) || 'Name' || chr(1) || 'src[n_name]')
             AS rules_digest,
           (SELECT count(*) FROM nation WHERE n_regionkey = 2)
             AS rows_out,
           'ok' AS status, FALSE AS has_error
         UNION ALL
         SELECT 'Map2',
           md5('_type:n_name' || chr(1) || 'numeric'
               || chr(2) || 'Name' || chr(1) || 'src[n_name]'),
           CAST(-1 AS BIGINT), 'error', TRUE""",

    "etl_type_valid" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS Key,
         CAST(o_totalprice AS VARCHAR) AS Total,
         strftime(o_orderdate, '%Y-%m-%d') AS Date
         FROM orders WHERE o_orderstatus = 'F'"""
  )
}
