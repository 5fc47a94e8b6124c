package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomIndexSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("bloom_index_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  // docs 4 == 5 token-set dup; 7 is a reordered copy of 4 (same token
  // set — the canonical key collapses it); others unique
  private def corpus(): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different subject matter entirely here"),
      (3L, "a third unrelated document about spark engines"),
      (4L, "alpha beta gamma delta epsilon"),
      (5L, "alpha beta gamma delta epsilon"),
      (7L, "epsilon delta gamma beta alpha")
    ).toDF("doc_id", "text")
  }

  private def tsKey =
    concat_ws(" ", array_sort(array_distinct(Dedup.tokens(col("text")))))

  private val K = 5
  private val M = 1 << 12

  private def flags(df: DataFrame): Set[(Long, Boolean, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2))).toSet

  test("gate from the committed index is bit-identical to the " +
      "corpus-scan Bloom.gate (hits, false-positive pattern and " +
      "exact_dup ground truth); the probe plan reads NO corpus — " +
      "only the index's key table") {
    val docs = corpus()
    val corp = docs.filter(col("doc_id") <= 3)
    val batch = docs.filter(col("doc_id") >= 4)
    val dir = tmpDir()
    BloomIndex.build(corp, "doc_id", tsKey, dir, K, M)
    val got = BloomIndex.gate(batch, "doc_id", tsKey, dir)
    val want = Bloom.gate(batch, corp, "doc_id", tsKey, K, M)
    assert(flags(got) == flags(want) && flags(got).size == 3)
    // dup structure sanity: 4 not in corpus -> exact_dup false
    assert(flags(got).forall { case (_, _, exact) => !exact })
    val scans = got.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(s =>
      s.contains("keys") || s.contains("bitmap")), scans.mkString("\n"))
  }

  test("exact_dup implies bloom_hit (no false negatives) when the " +
      "batch overlaps the indexed corpus") {
    val docs = corpus()
    val dir = tmpDir()
    BloomIndex.build(docs.filter(col("doc_id") =!= 7), "doc_id",
      tsKey, dir, K, M)
    val got = flags(BloomIndex.gate(docs, "doc_id", tsKey, dir))
    assert(got.exists { case (id, hit, exact) => id == 7L && exact },
      s"7 shares 4/5's token set: $got") // canonical key collapses
    assert(got.forall { case (_, hit, exact) => !exact || hit }, got)
  }

  test("append ORs the batch's bits in: append == full rebuild bit " +
      "for bit (gate verdicts identical on a probe batch), keys " +
      "deduplicated, marker mutated") {
    val docs = corpus()
    val base = docs.filter(col("doc_id") <= 3)
    val extra = docs.filter(col("doc_id") === 4 || col("doc_id") === 5)
    val dirInc = tmpDir(); val dirFull = tmpDir()
    BloomIndex.build(base, "doc_id", tsKey, dirInc, K, M, "v1")
    BloomIndex.append(extra, "doc_id", tsKey, dirInc, "v1")
    BloomIndex.build(base.unionByName(extra), "doc_id", tsKey,
      dirFull, K, M, "v1")
    val batch = docs // probe everything
    assert(flags(BloomIndex.gate(batch, "doc_id", tsKey, dirInc)) ==
      flags(BloomIndex.gate(batch, "doc_id", tsKey, dirFull)))
    // 4 and 5 share one token set -> ONE key row appended
    val s = spark
    assert(s.read.parquet(s"$dirInc/keys").count() ==
      s.read.parquet(s"$dirFull/keys").count())
    // mutated marker -> stale for the pristine fingerprint
    assert(BloomIndex.ensureBuilt(base, "doc_id", tsKey, dirInc, K, M,
      "v1"))
  }

  test("ingestStream signs keys map-side into a segment; gate folds " +
      "it (== Bloom.gate over corpus + ingested, bit for bit); " +
      "compact seals result-invisibly; rebuild retires the segment") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = corpus()
    val base = docs.filter(col("doc_id") <= 3)
    val streamedDocs =
      docs.filter(col("doc_id") === 4 || col("doc_id") === 5)
    val dir = tmpDir()
    BloomIndex.build(base, "doc_id", tsKey, dir, K, M, "v1")
    val in = MemoryStream[(Long, String)]
    val q = BloomIndex.ingestStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", tsKey, dir,
      java.nio.file.Files.createTempDirectory("blck").toString)
    in.addData((4L, "alpha beta gamma delta epsilon"))
    q.processAllAvailable()
    in.addData((5L, "alpha beta gamma delta epsilon"))
    q.processAllAvailable()
    q.stop()
    awaitLeaseRelease(dir)
    // gate == the corpus-scan gate over base + ingested: same hits,
    // same false-positive pattern (the folded bitmap IS the rebuild
    // bitmap — Bloom composes under OR), same exact_dup truth
    def served() = flags(BloomIndex.gate(docs, "doc_id", tsKey, dir))
    val want = flags(Bloom.gate(docs, base.unionByName(streamedDocs),
      "doc_id", tsKey, K, M))
    assert(served() == want && served().size == 6)
    // 7 shares 4/5's canonical token set -> now an exact dup
    assert(served().exists { case (id, hit, exact) =>
      id == 7L && exact && hit }, served().toString)
    // a mutated index is STALE to the single-corpus freshness check
    assert(BloomIndex.ensureBuilt(base, "doc_id", tsKey, dir, K, M,
      "v1"), "ensureBuilt must see the +ingest mutation and rebuild")
    // ...and the rebuild retired the segment: ingested keys gone
    assert(!new java.io.File(s"$dir/keys_stream").exists)
    assert(!served().exists { case (id, _, exact) => id == 7L && exact })
    // re-ingest, then COMPACT: verdicts identical before and after,
    // segment folded into bitmap/ + keys/
    val in2 = MemoryStream[(Long, String)]
    val q2 = BloomIndex.ingestStream(
      in2.toDF().toDF("doc_id", "text"), "doc_id", tsKey, dir,
      java.nio.file.Files.createTempDirectory("blck2").toString)
    in2.addData((4L, "alpha beta gamma delta epsilon"))
    q2.processAllAvailable()
    q2.stop()
    awaitLeaseRelease(dir)
    val before = served()
    val kept = BloomIndex.compact(s, dir)
    assert(kept == 4L, s"3 base keys + 1 ingested, got $kept")
    assert(!new java.io.File(s"$dir/keys_stream").exists)
    assert(served() == before, "compaction must be result-invisible")
    // idempotent on a sealed index
    assert(BloomIndex.compact(s, dir) == 4L)
  }

  test("lifecycle: ensureBuilt idempotence, markerless refusal, " +
      "single-writer lease abort") {
    val docs = corpus()
    val dir = tmpDir()
    assert(BloomIndex.ensureBuilt(docs, "doc_id", tsKey, dir, K, M,
      "v1"))
    assert(!BloomIndex.ensureBuilt(docs, "doc_id", tsKey, dir, K, M,
      "v1")) // warm
    assert(BloomIndex.ensureBuilt(docs, "doc_id", tsKey, dir, K, M,
      "v2")) // corpus changed
    val lease = new java.io.File(dir, ".MAINT_LEASE")
    assert(lease.createNewFile())
    val e = intercept[IllegalStateException] {
      BloomIndex.build(docs, "doc_id", tsKey, dir, K, M)
    }
    assert(e.getMessage.contains("lease"), e.getMessage)
    assert(lease.delete())
    new java.io.File(dir, "INDEX_READY").delete()
    intercept[IllegalStateException] {
      BloomIndex.gate(docs, "doc_id", tsKey, dir).collect()
    }
  }
}
