package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Derive a larger scale factor from driver testdata by row
  * replication — the driver ships sf0.001/0.01/0.1 only
  * (TESTDATA.md), and VERDICT r10 #7 asks for one order of magnitude
  * up so "domain-bounded, never corpus-sized" scaling claims become
  * measurements instead of arguments.
  *
  * Replication semantics (replica r in 0..reps-1):
  *  - Dims `region`/`nation` are copied as-is (TPC-H keeps them
  *    fixed at every sf).
  *  - Every scaling table gets `reps` copies with all BIGINT
  *    key/FK columns offset by `r * stride`, consistently across
  *    tables, so every foreign-key relationship of the original
  *    holds inside each replica and never crosses replicas —
  *    join/agg selectivities are preserved exactly.
  *  - `documents.text`: replica r>0 suffixes every whitespace token
  *    with `_r{r}`. Plain replication would make each doc an EXACT
  *    10-way duplicate, which multiplies every dedup operator's
  *    LSH/tokenset bucket membership 10x and its in-bucket pair
  *    work 100x — a data artifact of the derivation, not a property
  *    of 10x more real data. Token-suffixing keeps each replica's
  *    internal near-dup structure (planted fixture groups, length
  *    and token-count distributions) bit-identical while making
  *    cross-replica shingle/token/minhash spaces disjoint. n_chars
  *    is recomputed from the rewritten text.
  *  - `embeddings.embedding`: replica r>0 adds deterministic
  *    per-component jitter (xxhash64(vec_id, r, i) mapped to
  *    ±0.05) so vectors are not exact cross-replica duplicates
  *    (which would collapse ANN cells/buckets into 10x-degenerate
  *    piles) while labels and cluster structure survive.
  *
  * Usage: runMain graft.tools.DeriveSf [srcDir] [outDir] [reps]
  * Defaults: /root/testdata/sf0.1 -> target/testdata/sf1.0, 10x.
  */
object DeriveSf {
  /** > max key in any driver table (orders at sf0.1 is 150k; leaves
    * ~9e17 headroom before BIGINT overflow at reps=10).
    */
  val Stride = 10000000L

  def replicate(df: DataFrame, reps: Int)(
      perReplica: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until reps).map(r => perReplica(df, r)).reduce(_ unionAll _)

  def offset(df: DataFrame, r: Int, keys: String*): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(r * Stride)))

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/testdata/sf1.0")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", java.nio.file.Files
        .createTempDirectory("graft-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String, df: DataFrame, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[derive] $name -> $out/$name.parquet")
    }

    // fixed dims: copy through
    write("region", Tables.region(spark, src), 1)
    write("nation", Tables.nation(spark, src), 1)

    write("customer",
      replicate(Tables.customer(spark, src), reps)(offset(_, _, "c_custkey")), 4)
    write("supplier",
      replicate(Tables.supplier(spark, src), reps)(offset(_, _, "s_suppkey")), 1)
    write("part",
      replicate(Tables.part(spark, src), reps)(offset(_, _, "p_partkey")), 4)
    write("orders",
      replicate(Tables.orders(spark, src), reps)(
        offset(_, _, "o_orderkey", "o_custkey")), 8)
    write("lineitem",
      replicate(Tables.lineitem(spark, src), reps)(
        offset(_, _, "l_orderkey", "l_partkey", "l_suppkey")), 16)
    write("events",
      replicate(Tables.events(spark, src), reps)(
        offset(_, _, "event_id", "user_id")), 8)

    write("documents",
      replicate(Tables.documents(spark, src), reps) { (df, r) =>
        val keyed = offset(df, r, "doc_id")
        if (r == 0) keyed
        else keyed
          .withColumn("text",
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit(s"_r$r"))), " "))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }, 8)

    write("embeddings",
      replicate(Tables.embeddings(spark, src), reps) { (df, r) =>
        val keyed = offset(df, r, "vec_id")
        if (r == 0) keyed
        else keyed.withColumn("embedding",
          transform(col("embedding"), (x, i) =>
            (x + (xxhash64(col("vec_id"), lit(r), i) % 1001L - 500L)
              .cast("double") / 10000.0d).cast("float")))
      }, 4)

    spark.stop()
  }
}
