package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench summary must stay a short, parseable, LAST stdout line:
  * the driver keeps only a bounded stdout tail, and r03-r06 shipped
  * "parsed": null because a fat summary's head fell out of that
  * window. This pins the contract without needing a SparkSession.
  */
class BenchSummarySpec extends AnyFunSuite {
  private def line = Bench.summaryLine(
    total = 12345.678, calib = 100.123, calib2 = 100.456,
    calibIo = 50.789, calibIo2 = 50.012, nQueries = 9999,
    nFailed = 9999, sfDir = "/root/testdata/sf0.1",
    sweepTotals = Seq(4123.4, 4111.1, 4111.2),
    sweepCpu = Seq(100.123, 100.456, 100.2, 100.3),
    sweepIo = Seq(50.789, 50.012, 50.1, 50.2),
    scalePathTotal = 11111.1)

  test("summary stays far inside the driver's stdout tail window") {
    assert(line.length < 450, s"summary grew to ${line.length} chars")
  }

  test("full per-query contract line (r18): complete JSON with the " +
      "driver's keys incl. queries, and NEVER the summary (the tail " +
      "window would truncate it)") {
    val ql = Bench.queriesLine(12345.678,
      """{"q_a":1.25,"q_b":-1.0}""", "/root/testdata/sf0.1")
    for (key <- Seq("\"metric\"", "\"value\"", "\"unit\"",
        "\"queries\"", "\"sf\""))
      assert(ql.contains(key), s"missing $key")
    assert(!ql.contains("\n"))
    assert(ql.head == '{' && ql.last == '}')
    assert(ql.contains("\"value\":12345.678"))
    assert(ql.contains("\"queries\":{\"q_a\":1.25,\"q_b\":-1.0}"))
    // the compact LAST line points at the per-query sidecar
    assert(line.contains("\"queries_path\":\"bench_queries.jsonl\""))
    // and does NOT inline the map itself — that is what broke
    // BENCH_r03..r06 parsing
    assert(!line.contains("\"queries\":{"))
  }

  test("summary is one line of valid JSON with the driver's keys") {
    assert(!line.contains("\n"))
    for (key <- Seq("\"metric\"", "\"value\"", "\"unit\"",
        "\"value_normalized\"", "\"value_scale_path\"", "\"calib\"",
        "\"calib2\"", "\"calib_io\"", "\"calib_io2\"", "\"n_queries\"",
        "\"n_failed\"", "\"sweep_totals\"", "\"sweep_cpu\"",
        "\"sweep_io\"", "\"sf\""))
      assert(line.contains(key), s"missing $key")
    // cheap structural JSON check: balanced braces, no trailing comma
    assert(line.head == '{' && line.last == '}')
    assert(!line.contains(",}"))
  }

  test("normalization divides out host drift against the recorded " +
      "anchor; the scale-path total rides alongside, defaulting to " +
      "the full total") {
    // calib = 2x the anchor -> normalized total halves
    val drifted = Bench.summaryLine(total = 100.0,
      calib = Bench.ReferenceCalib * 2, calib2 = 0.7, calibIo = 1.0,
      calibIo2 = 1.0, nQueries = 1, nFailed = 0, sfDir = "sf")
    assert(drifted.contains("\"value_normalized\":50.000"), drifted)
    assert(drifted.contains("\"value_scale_path\":100.000"), drifted)
    // every referee names a shipped replacement still in the battery
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.refereeQueries.subsetOf(qs),
      SparkEntry.refereeQueries.diff(qs).toString)
    for (rep <- Seq("dedup_minhash_index_pairs",
        "dedup_ngram_index_pairs", "dedup_minhash_index",
        "dedup_groups_incremental", "dedup_survivors_incremental",
        "dedup_embed_ann", "dedup_embed_ann_groups_index",
        "dedup_bloom_index", "pipeline_ingest_gates_fast",
        "pipeline_ingest_gates_composed"))
      assert(qs.contains(rep) && !SparkEntry.refereeQueries(rep),
        s"replacement $rep must be a battery scale-path query")
  }
}
