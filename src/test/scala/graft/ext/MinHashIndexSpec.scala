package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MinHashIndexSpec extends SparkSpec {

  private def tmpDir(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("minhash_index_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath + "/idx"
  }

  // planted structure: 1<->2 near-dup (one word changed in 12),
  // 3 unrelated, 4 == 5 exact dup, 6 too short to shingle
  private def corpus(): DataFrame = {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog " +
      "while the cat sleeps on the warm mat"
    Seq(
      (1L, base),
      (2L, base.replace("warm", "cold")),
      (3L, "completely different subject matter entirely here " +
        "nothing shared with anything else in this corpus at all"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (6L, "too short")
    ).toDF("doc_id", "text")
  }

  /** Independent driver-side replay of probe(): signatures straight
    * from Dedup.minhashSignatures (differentially pinned vs the oracle
    * elsewhere), banding + agreement re-derived with plain Scala —
    * no bucketJoinPairs, no Column arithmetic.
    */
  private def driverProbe(incoming: DataFrame, index: DataFrame,
      numHashes: Int, bands: Int,
      threshold: Double): Set[(Long, Long, Double)] = {
    def sigsOf(df: DataFrame): Map[Long, Seq[Long]] =
      Dedup.minhashSignatures(
          Dedup.shingleRows(df, "doc_id", "text"), numHashes)
        .collect()
        .map(r => r.getLong(0) -> (1 to numHashes).map(r.getLong))
        .toMap
    val rpb = numHashes / bands
    def bandKeys(sig: Seq[Long]): Seq[(Int, String)] =
      (0 until bands).map(j =>
        j -> (0 until rpb).map(r => sig(j * rpb + r)).mkString("|"))
    val a = sigsOf(incoming)
    val b = sigsOf(index)
    (for {
      (ia, sa) <- a.toSeq; (ib, sb) <- b.toSeq
      if bandKeys(sa).toSet.intersect(bandKeys(sb).toSet).nonEmpty
      est = sa.zip(sb).count { case (x, y) => x == y }.toDouble /
        numHashes
      if est >= threshold
    } yield (ia, ib, est)).toSet
  }

  test("probe == independent driver-side band+agreement replay, " +
      "including self-matches at est 1.0; short docs absent") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir,
      numHashes = 32, bands = 8)
    val incoming = docs.filter(col("doc_id").isin(1L, 4L, 6L))
    val got = MinHashIndex.probe(incoming, "doc_id", "text", dir, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = driverProbe(incoming, docs, 32, 8, 0.5)
    assert(got == want, s"got $got, want $want")
    // planted truth survives the generic check
    assert(got.contains((1L, 1L, 1.0)) && got.contains((4L, 4L, 1.0)))
    assert(got.contains((4L, 5L, 1.0))) // exact dup pair
    assert(got.exists { case (a, b, e) => a == 1L && b == 2L && e < 1.0 })
    assert(!got.exists(t => t._1 == 6L || t._2 == 6L)) // unshingleable
    assert(!got.exists(t => t._2 == 3L)) // unrelated never candidates
  }

  test("append is invisible to probe: build(all) == " +
      "build(part)+append(rest), bit-identical rows") {
    val docs = corpus()
    val full = tmpDir(); val inc = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", full)
    MinHashIndex.build(docs.filter(col("doc_id") <= 3), "doc_id",
      "text", inc)
    MinHashIndex.append(docs.filter(col("doc_id") > 3), "doc_id",
      "text", inc)
    val incoming = docs.filter(col("doc_id").isin(1L, 4L))
    def rows(dir: String) =
      MinHashIndex.probe(incoming, "doc_id", "text", dir, 0.4)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows(full) == rows(inc))
  }

  test("marker is committed LAST and load refuses its absence; " +
      "ensureBuilt rebuilds exactly on fingerprint change") {
    val dir = tmpDir()
    val docs = corpus()
    assert(MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v1")) // first call builds
    assert(!MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v1")) // warm: marker matches, no rebuild
    assert(MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v2")) // corpus changed: rebuild
    // a mutated index (append line) is stale for any pristine check
    MinHashIndex.append(docs.limit(0), "doc_id", "text", dir, "v2")
    assert(MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v2"))
    // markerless dir refuses to serve
    new java.io.File(dir, "INDEX_READY").delete()
    intercept[IllegalStateException] {
      MinHashIndex.probe(docs, "doc_id", "text", dir, 0.5).collect()
    }
  }

  test("maintenance is single-writer: a held lease aborts build and " +
      "append loudly; release restores service") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val lease = new java.io.File(dir, ".MAINT_LEASE")
    assert(lease.createNewFile())
    intercept[IllegalStateException] {
      MinHashIndex.build(docs, "doc_id", "text", dir)
    }
    intercept[IllegalStateException] {
      MinHashIndex.append(docs, "doc_id", "text", dir)
    }
    // probes never take the lease
    assert(MinHashIndex.probe(docs.filter(col("doc_id") === 1),
      "doc_id", "text", dir, 0.5).count() > 0)
    assert(lease.delete())
    MinHashIndex.build(docs, "doc_id", "text", dir) // serves again
  }

  test("bandBuckets == corpusBandBuckets: the streaming nearDupGate's " +
      "at-rest index is served from the committed signatures") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val fromIndex = MinHashIndex.bandBuckets(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val fromText = graft.streaming.StreamingOps
      .corpusBandBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(fromIndex == fromText && fromIndex.nonEmpty)
  }

  test("probe reads NO corpus text: with an in-memory batch the only " +
      "file scan in the plan is the index's sigs table") {
    val dir = tmpDir()
    MinHashIndex.build(corpus(), "doc_id", "text", dir)
    val s = spark
    import s.implicits._
    val batch = Seq((100L, "alpha beta gamma delta epsilon zeta " +
      "eta theta iota")).toDF("doc_id", "text")
    val probe = MinHashIndex.probe(batch, "doc_id", "text", dir, 0.5)
    val scans = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan")).mkString("\n")
    assert(scans.contains("sigs"), scans)
    assert(!scans.contains("documents"), scans)
    // and it still finds the exact dup of docs 4/5 in the index
    val got = probe.collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.toSet == Set((4L, 1.0), (5L, 1.0)), got.toSeq)
  }

  test("delete tombstones serve immediately (probe anti-joins the " +
      "queue), marker-FIRST so the mutated index reads stale") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir, fingerprint = "v1")
    val batch = docs.filter(col("doc_id") === 4)
    def matches() = MinHashIndex.probe(batch, "doc_id", "text", dir,
      0.5).collect().map(_.getLong(1)).toSet
    assert(matches() == Set(4L, 5L))
    MinHashIndex.delete(spark, dir, Seq(5L))
    assert(matches() == Set(4L)) // ghost gone without a rebuild
    val marker = scala.io.Source
      .fromFile(new java.io.File(dir, "INDEX_READY"))
    val text = try marker.mkString finally marker.close()
    assert(text.endsWith("+delete[1]"), text)
    // mutated index is stale for the pristine-corpus check → rebuild
    assert(MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v1"))
    assert(matches() == Set(4L, 5L)) // rebuild resurrects the corpus
  }

  test("compact folds tombstones + append files: probes identical " +
      "before and after, deletes/ cleared, marker text preserved") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs.filter(col("doc_id") <= 3), "doc_id",
      "text", dir)
    MinHashIndex.append(docs.filter(col("doc_id") === 4), "doc_id",
      "text", dir)
    MinHashIndex.append(docs.filter(col("doc_id") >= 5), "doc_id",
      "text", dir)
    MinHashIndex.delete(spark, dir, Seq(2L))
    val batch = docs.filter(col("doc_id").isin(1L, 4L))
    def rows() = MinHashIndex.probe(batch, "doc_id", "text", dir, 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def markerText() = {
      val src = scala.io.Source
        .fromFile(new java.io.File(dir, "INDEX_READY"))
      try src.mkString finally src.close()
    }
    val markerBefore = markerText()
    val before = rows()
    assert(!before.exists(_._2 == 2L))
    val kept = MinHashIndex.compact(spark, dir)
    assert(kept == 4L) // docs 1,3,4,5 (6 unshingleable, 2 folded out)
    assert(rows() == before)
    assert(!new java.io.File(dir, "deletes").exists())
    assert(markerText() == markerBefore)
  }

  test("streaming ingest: docs arriving on a stream are signed " +
      "map-side into sigs_stream — rows IDENTICAL to the batch append " +
      "signatures; probe unions the segment; compact folds + retires " +
      "it; rebuild retires it") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val docs = corpus()
    val dir = tmpDir(); val dirRef = tmpDir()
    val base = docs.filter(col("doc_id") <= 3)
    val extra = docs.filter(col("doc_id") > 3) // 4,5 sign; 6 too short
    MinHashIndex.build(base, "doc_id", "text", dir)
    MinHashIndex.build(base, "doc_id", "text", dirRef)
    MinHashIndex.append(extra, "doc_id", "text", dirRef)
    val rows = extra.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = MinHashIndex.ingestStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      java.nio.file.Files.createTempDirectory("mhck").toString)
    val (b1, b2) = rows.splitAt(1)
    in.addData(b1.toSeq); q.processAllAvailable()
    in.addData(b2.toSeq); q.processAllAvailable()
    q.stop()
    awaitLeaseRelease(dir)
    val seg = s.read.parquet(s"$dir/sigs_stream")
    val ref = s.read.parquet(s"$dirRef/sigs").filter(col("id") > 3)
    assert(seg.count() == 2) // doc 6 emits nothing (batch absence rule)
    assert(seg.exceptAll(ref).count() == 0 &&
      ref.exceptAll(seg).count() == 0,
      "stream encode must equal the batch append encode row for row")
    val batch = docs.filter(col("doc_id") === 4)
    def matches() = MinHashIndex.probe(batch, "doc_id", "text", dir,
      0.5).collect().map(_.getLong(1)).toSet
    assert(matches() == Set(4L, 5L)) // probe unions the segment
    val kept = MinHashIndex.compact(s, dir)
    assert(kept == 5L, s"kept $kept") // docs 1..5 folded
    assert(!new java.io.File(s"$dir/sigs_stream").exists)
    assert(matches() == Set(4L, 5L)) // fold is result-invisible
    MinHashIndex.build(base, "doc_id", "text", dir)
    assert(!new java.io.File(s"$dir/sigs_stream").exists,
      "rebuild must retire any streaming segment")
  }

  test("a FAILED rebuild leaves the index unreadable — never the " +
      "previous marker over mixed tables — and releases the lease") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val poison = docs.withColumn("text",
      when(col("doc_id") === 4, raise_error(lit("boom")))
        .otherwise(col("text")))
    intercept[Exception] {
      MinHashIndex.build(poison, "doc_id", "text", dir)
    }
    // the old marker was lifted before the overwrite started
    intercept[IllegalStateException] {
      MinHashIndex.probe(docs, "doc_id", "text", dir, 0.5).collect()
    }
    // lease released by the finally: a fresh build restores service
    MinHashIndex.build(docs, "doc_id", "text", dir)
    assert(MinHashIndex.probe(docs.filter(col("doc_id") === 4),
      "doc_id", "text", dir, 0.5).count() > 0)
  }

  test("id type normalized to long at the boundary: a numeric-string" +
      "-id corpus probes and deletes consistently") {
    val dir = tmpDir()
    val docs = corpus().select(
      col("doc_id").cast("string").as("doc_id"), col("text"))
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val batch = docs.filter(col("doc_id") === "4")
    def m() = MinHashIndex.probe(batch, "doc_id", "text", dir, 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(m() == Set(4L, 5L))
    MinHashIndex.delete(spark, dir, Seq(5L))
    assert(m() == Set(4L)) // long tombstone matches the stored id
  }

  test("char5 unit: probe == independent driver replay over " +
      "charGramRows signatures; probeVerified scores exact char-gram " +
      "Jaccard; word3 and char5 indexes coexist") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir, numHashes = 64,
      bands = 8, grams = "char5")
    val incoming = docs.filter(col("doc_id").isin(1L, 4L))
    val got = MinHashIndex.probe(incoming, "doc_id", "text", dir, 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // independent replay: signatures from charGramRows, banding +
    // agreement in plain Scala
    def sigsOf(df: DataFrame): Map[Long, Seq[Long]] =
      Dedup.minhashSignatures(
          Dedup.charGramRows(df, "doc_id", "text", 5), 64)
        .collect()
        .map(r => r.getLong(0) -> (1 to 64).map(r.getLong)).toMap
    val a = sigsOf(incoming); val b = sigsOf(docs)
    def bandKeys(sig: Seq[Long]): Set[(Int, String)] =
      (0 until 8).map(j =>
        j -> (0 until 8).map(r => sig(j * 8 + r)).mkString("|")).toSet
    val want = (for {
      (ia, sa) <- a.toSeq; (ib, sb) <- b.toSeq
      if bandKeys(sa).intersect(bandKeys(sb)).nonEmpty
      est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 64
      if est >= 0.5
    } yield (ia, ib, est)).toSet
    assert(got == want, s"got $got, want $want")
    assert(got.contains((4L, 5L, 1.0))) // exact dup under any unit
    // exact verify runs over CHAR grams (doc 1 vs 2 differ by one
    // word: char-5 jaccard is high but below 1)
    val ver = MinHashIndex.probeVerified(incoming, docs, "doc_id",
        "text", dir, threshold = 0.5, estThreshold = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect()
    assert(ver.length == 1 && ver.head.getDouble(2) > 0.5 &&
      ver.head.getDouble(2) < 1.0, ver.toSeq)
    // a word3 index at another dir is independent (param isolation)
    val dirW = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", dirW)
    assert(MinHashIndex.load(spark, dirW)._1.grams == "word3" &&
      MinHashIndex.load(spark, dir)._1.grams == "char5")
  }

  test("char5 streaming ingest encode == batch char signatures " +
      "row for row") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val docs = corpus()
    val dir = tmpDir()
    MinHashIndex.build(docs.filter(col("doc_id") <= 3), "doc_id",
      "text", dir, numHashes = 64, bands = 8, grams = "char5")
    val extra = docs.filter(col("doc_id") > 3)
    val rows = extra.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = MinHashIndex.ingestStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      java.nio.file.Files.createTempDirectory("mhck5").toString)
    in.addData(rows.toSeq); q.processAllAvailable(); q.stop()
    awaitLeaseRelease(dir)
    val seg = s.read.parquet(s"$dir/sigs_stream")
    val ref = Dedup.minhashSignatures(
      Dedup.charGramRows(extra, "doc_id", "text", 5), 64)
    assert(seg.count() == ref.count() &&
      seg.exceptAll(ref).count() == 0 &&
      ref.exceptAll(seg).count() == 0)
  }

  test("groups at rest: appendGroups' super-node fold equals a full " +
      "rebuild — including a batch doc MERGING two existing groups — " +
      "and the groups marker tracks index mutations and threshold") {
    val s = spark
    import s.implicits._
    def run(ws: Range): String = ws.map(i => s"w$i").mkString(" ")
    // two disjoint near-dup groups + a singleton (bands = numHashes
    // -> one-row bands, recall ~1 at any threshold >= 0.4, so the
    // planted structure pairs deterministically)
    val g1a = run(1 to 12); val g1b = g1a.replace("w12", "w12x")
    val g2a = run(101 to 112); val g2b = g2a.replace("w112", "w112x")
    val base = Seq((1L, g1a), (2L, g1b), (5L, g2a), (6L, g2b),
      (9L, "totally unrelated singleton content nothing shared ever"))
      .toDF("doc_id", "text")
    // 10 BRIDGES both groups (concat: jaccard 10/22 ~ 0.45 with each
    // group's seed at bar 0.4), 11 joins g1 (exact copy), 13 novel
    val batch = Seq((10L, g1a + " " + g2a), (11L, g1a),
      (13L, "another novel direction separate from everything else"))
      .toDF("doc_id", "text")
    val all = base.unionByName(batch)
    val dir = tmpDir()
    MinHashIndex.build(base, "doc_id", "text", dir,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(base, "doc_id", "text", dir, 0.4)
    assert(MinHashIndex.groupsFresh(s, dir, 0.4))
    assert(!MinHashIndex.groupsFresh(s, dir, 0.5),
      "a different threshold is a different groups table")
    val before = MinHashIndex.readGroups(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L),
      s"two separate groups before the batch: $before")
    MinHashIndex.append(batch, "doc_id", "text", dir)
    assert(!MinHashIndex.groupsFresh(s, dir, 0.4),
      "an index mutation must flip the groups table stale")
    MinHashIndex.appendGroups(batch, all, "doc_id", "text", dir, 0.4)
    assert(MinHashIndex.groupsFresh(s, dir, 0.4))
    val after = MinHashIndex.readGroups(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 1L, 11L -> 1L),
      s"bridge merges g1+g2 under label 1, joiner follows, novel and " +
        s"singleton absent: $after")
    // THE guarantee: equal to a full rebuild over the final corpus
    val dirFull = tmpDir()
    MinHashIndex.build(all, "doc_id", "text", dirFull,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(all, "doc_id", "text", dirFull, 0.4)
    val full = MinHashIndex.readGroups(s, dirFull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == full, s"incremental $after != rebuild $full")
  }

  test("deleteGroups: deleting a bridge doc SPLITS its group — the " +
      "confined re-mine equals a full rebuild over the post-delete " +
      "corpus; fold preconditions are strict on BOTH folds") {
    val s = spark
    import s.implicits._
    def run(ws: Range): String = ws.map(i => s"w$i").mkString(" ")
    val g1a = run(1 to 12); val g1b = g1a.replace("w12", "w12x")
    val g2a = run(101 to 112); val g2b = g2a.replace("w112", "w112x")
    // 10 bridges the two near-dup groups; 11 joins g1 (exact copy)
    val all = Seq((1L, g1a), (2L, g1b), (5L, g2a), (6L, g2b),
      (9L, "totally unrelated singleton content nothing shared ever"),
      (10L, g1a + " " + g2a), (11L, g1a))
      .toDF("doc_id", "text")
    val dir = tmpDir()
    MinHashIndex.build(all, "doc_id", "text", dir,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(all, "doc_id", "text", dir, 0.4)
    val before = MinHashIndex.readGroups(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      10L -> 1L, 11L -> 1L), s"one bridged group before: $before")
    // strict: no trailing +delete line yet -> refuse the fold
    intercept[IllegalStateException] {
      MinHashIndex.deleteGroups(all, "doc_id", "text", dir, 0.4)
    }
    MinHashIndex.delete(s, dir, Seq(10L))
    assert(!MinHashIndex.groupsFresh(s, dir, 0.4),
      "a delete must flip the groups table stale")
    // appendGroups must refuse to fold a delete — its super-node
    // trick can only merge, never split (ADVICE r15 strictness)
    intercept[IllegalStateException] {
      MinHashIndex.appendGroups(all.limit(0), all, "doc_id", "text",
        dir, 0.4)
    }
    val post = all.filter(col("doc_id") =!= 10L)
    MinHashIndex.deleteGroups(post, "doc_id", "text", dir, 0.4)
    assert(MinHashIndex.groupsFresh(s, dir, 0.4))
    val after = MinHashIndex.readGroups(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == Map(1L -> 1L, 2L -> 1L, 11L -> 1L, 5L -> 5L,
      6L -> 5L), s"bridge removed -> the group SPLITS: $after")
    // THE guarantee: equal to a full rebuild over the final corpus
    val dirFull = tmpDir()
    MinHashIndex.build(post, "doc_id", "text", dirFull,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(post, "doc_id", "text", dirFull, 0.4)
    val full = MinHashIndex.readGroups(s, dirFull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == full, s"incremental $after != rebuild $full")
    // TWO queued deletes (r17 — VERDICT r16 #4): the suffix fold
    // walks the marker's mutation lines in order, one bounded fold
    // per line. The first fold must NOT claim freshness (its stamp
    // digests the prefix + one line, not the full marker); the second
    // drains the suffix, and the result equals a rebuild over the
    // fully-deleted corpus. No staleness laundering: each stamp is
    // exactly the state folded so far.
    MinHashIndex.delete(s, dirFull, Seq(11L))
    MinHashIndex.delete(s, dirFull, Seq(2L))
    val post2 = post.filter(!col("doc_id").isin(11L, 2L))
    MinHashIndex.deleteGroups(post2, "doc_id", "text", dirFull, 0.4)
    assert(!MinHashIndex.groupsFresh(s, dirFull, 0.4),
      "one fold of a two-mutation suffix must not claim freshness")
    MinHashIndex.deleteGroups(post2, "doc_id", "text", dirFull, 0.4)
    assert(MinHashIndex.groupsFresh(s, dirFull, 0.4))
    val afterBoth = MinHashIndex.readGroups(s, dirFull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs left: 1 (now unpaired -> absent), 5, 6, 9 (singleton)
    assert(afterBoth == Map(5L -> 5L, 6L -> 5L),
      s"both deletes folded -> only g2 remains: $afterBoth")
    // ...and a drained suffix refuses a further fold loudly
    intercept[IllegalStateException] {
      MinHashIndex.deleteGroups(post2, "doc_id", "text", dirFull, 0.4)
    }
  }

  test("multi-mutation fold (r17): an append,append,delete suffix " +
      "folds as three bounded calls in MARKER ORDER, equals a full " +
      "rebuild; out-of-order folds refuse with the next un-folded " +
      "mutation named") {
    val s = spark
    import s.implicits._
    def run(ws: Range): String = ws.map(i => s"w$i").mkString(" ")
    val g1a = run(1 to 12); val g1b = g1a.replace("w12", "w12x")
    val g2a = run(101 to 112); val g2b = g2a.replace("w112", "w112x")
    val base = Seq((1L, g1a), (2L, g1b),
      (9L, "totally unrelated singleton content nothing shared ever"))
      .toDF("doc_id", "text")
    // batchA joins g1 and seeds g2; batchB completes g2 — the two
    // batches PAIR ACROSS the fold boundary (5-6), exercising the
    // index-as-it-is candidate side of an in-order fold
    val batchA = Seq((11L, g1a), (5L, g2a)).toDF("doc_id", "text")
    val batchB = Seq((6L, g2b)).toDF("doc_id", "text")
    val all = base.unionByName(batchA).unionByName(batchB)
    val dir = tmpDir()
    MinHashIndex.build(base, "doc_id", "text", dir,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(base, "doc_id", "text", dir, 0.4)
    // queue THREE mutations before any fold
    MinHashIndex.append(batchA, "doc_id", "text", dir)
    MinHashIndex.append(batchB, "doc_id", "text", dir)
    MinHashIndex.delete(s, dir, Seq(2L))
    val post = all.filter(col("doc_id") =!= 2L)
    // out of order: the next un-folded line is an APPEND
    val e = intercept[IllegalStateException] {
      MinHashIndex.deleteGroups(post, "doc_id", "text", dir, 0.4)
    }
    assert(e.getMessage.contains("marker order"), e.getMessage)
    MinHashIndex.appendGroups(batchA, post, "doc_id", "text", dir, 0.4)
    assert(!MinHashIndex.groupsFresh(s, dir, 0.4))
    // still out of order: batchB's append precedes the delete
    intercept[IllegalStateException] {
      MinHashIndex.deleteGroups(post, "doc_id", "text", dir, 0.4)
    }
    MinHashIndex.appendGroups(batchB, post, "doc_id", "text", dir, 0.4)
    assert(!MinHashIndex.groupsFresh(s, dir, 0.4))
    MinHashIndex.deleteGroups(post, "doc_id", "text", dir, 0.4)
    assert(MinHashIndex.groupsFresh(s, dir, 0.4),
      "draining the three-mutation suffix reaches freshness")
    val inc = MinHashIndex.readGroups(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // THE guarantee: equal to a full rebuild over the final corpus
    val dirFull = tmpDir()
    MinHashIndex.build(post, "doc_id", "text", dirFull,
      numHashes = 32, bands = 32)
    MinHashIndex.buildGroups(post, "doc_id", "text", dirFull, 0.4)
    val full = MinHashIndex.readGroups(s, dirFull).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full && inc == Map(1L -> 1L, 11L -> 1L,
      5L -> 5L, 6L -> 5L),
      s"incremental $inc != rebuild $full")
  }

  test("lease torture (r16): N latch-synchronized racing acquirers " +
      "have exactly ONE winner and loud losers; a live heartbeat " +
      "refuses break with the index untouched; a stale break fences " +
      "every decision through the post-break marker re-read") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"))
      .toDF("doc_id", "text")
    val dir = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", dir,
      fingerprint = "gen1")
    val markerV1 = IndexFs.readMarker(s, dir, "INDEX_READY").get

    // (a) acquire race — deterministic interleaving via latches: the
    // winner HOLDS the lease until EVERY thread's acquire attempt has
    // resolved (each thread counts the latch down the moment its own
    // attempt completes, win or lose), so no release can happen while
    // an attempt is still outstanding and a second winner is
    // impossible by construction
    val n = 4
    val start = new java.util.concurrent.CyclicBarrier(n)
    val winners = new java.util.concurrent.atomic.AtomicInteger
    val losers = new java.util.concurrent.atomic.AtomicInteger
    val errs = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
    val attempted = new java.util.concurrent.CountDownLatch(n)
    val threads = (1 to n).map { _ =>
      val t = new Thread(() => {
        start.await()
        try IndexFs.withLease(s, dir, ".MAINT_LEASE", "torture spec") {
          winners.incrementAndGet()
          attempted.countDown() // my own attempt resolved (won)
          attempted.await(30, java.util.concurrent.TimeUnit.SECONDS)
          ()
        } catch {
          case e: IllegalStateException =>
            errs.add(e.getMessage); losers.incrementAndGet()
            attempted.countDown()
        }
      })
      t.start(); t
    }
    threads.foreach(_.join(60000))
    assert(winners.get == 1 && losers.get == n - 1,
      s"winners=${winners.get} losers=${losers.get}")
    // identical messages collapse in the set — content matters, not
    // cardinality (the loser COUNT is asserted above)
    assert(!errs.isEmpty &&
      errs.stream.allMatch(m => m.contains("lease held")),
      s"losers must abort loudly: $errs")
    val leaseFile = new java.io.File(dir, ".MAINT_LEASE")
    assert(!leaseFile.exists, "winner must release on exit")

    // (b) a LIVE heartbeat (fresh mtime) refuses the break, and the
    // index is untouched by the refused breaker
    assert(leaseFile.createNewFile())
    val sigsBefore = s.read.parquet(s"$dir/sigs").count()
    val alive = intercept[IllegalStateException] {
      MinHashIndex.breakLease(s, dir)
    }
    assert(alive.getMessage.contains("ALIVE"), alive.getMessage)
    assert(leaseFile.exists &&
      s.read.parquet(s"$dir/sigs").count() == sigsBefore,
      "a refused break must not touch lease or tables")

    // (c) stale break + FENCING: age the heartbeat deterministically
    // (setLastModified, no sleeps); breaker A wins, rebuilds under a
    // fresh lease (marker gen2); breaker B's own break is then a
    // no-op and its post-fence marker re-read returns GEN2 — B must
    // decide from that, not from its pre-crash memory of gen1
    assert(leaseFile.setLastModified(
      System.currentTimeMillis() - 600000L))
    val mA = MinHashIndex.breakLease(s, dir)
    assert(mA.contains(markerV1), s"A sees the committed marker: $mA")
    MinHashIndex.build(docs, "doc_id", "text", dir,
      fingerprint = "gen2") // A's rebuild re-acquires cleanly
    val mB = MinHashIndex.breakLease(s, dir)
    assert(mB.exists(_.contains("gen2")) && !mB.contains(markerV1),
      s"B's post-fence re-read must surface A's rebuild: $mB")

    // (d) pre-commit crash: orphaned stale lease, NO committed marker
    // -> break returns None = rebuild before serving
    val dir2 = tmpDir()
    new java.io.File(dir2).mkdirs()
    val lease2 = new java.io.File(dir2, ".MAINT_LEASE")
    assert(lease2.createNewFile() &&
      lease2.setLastModified(System.currentTimeMillis() - 600000L))
    assert(MinHashIndex.breakLease(s, dir2).isEmpty,
      "a pre-commit crash must report: no marker, rebuild")
  }

  test("pairsVerified == the corpus-mining legs (word3 AND char5): " +
      "identical banded candidates from the at-rest signatures, " +
      "identical exact-Jaccard bar — pair sets equal including " +
      "jaccard values") {
    val docs = corpus()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)
    val dirW = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", dirW)
    val gotW = MinHashIndex.pairsVerified(docs, "doc_id", "text",
      dirW, 0.6).collect().map(key).toSet
    val wantW = Dedup.minhashPairs(docs, "doc_id", "text", 32, 8, 0.6)
      .collect().map(key).toSet
    assert(gotW == wantW && gotW.nonEmpty, s"word3: $gotW vs $wantW")
    val dirC = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", dirC, numHashes = 64,
      bands = 8, grams = "char5")
    val gotC = MinHashIndex.pairsVerified(docs, "doc_id", "text",
      dirC, 0.7).collect().map(key).toSet
    val wantC = Dedup.ngramPairs(docs, "doc_id", "text", n = 5,
      numHashes = 64, bands = 8, threshold = 0.7)
      .collect().map(key).toSet
    assert(gotC == wantC && gotC.nonEmpty, s"char5: $gotC vs $wantC")
  }

  test("pairs: agreement-scored pairs from the index alone match a " +
      "driver-side replay (banding + component agreement over " +
      "independently computed signatures); no corpus text in the plan") {
    val docs = corpus()
    val dir = tmpDir()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val got = MinHashIndex.pairs(spark, dir, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    // driverProbe is two-sided; fold to ordered pairs for the self case
    val want = driverProbe(docs, docs, 32, 8, 0.5)
      .collect { case (a, b, est) if a < b =>
        (a, b, math.rint(est * 1e9) / 1e9) }
    assert(got == want && got.nonEmpty, s"$got vs $want")
    // index-only by construction (pairs takes only (spark, dir)); the
    // sigs table is localCheckpointed, so leaves are RDD scans — pin
    // that NO file scan (hence no corpus read) appears in the plan
    val scans = MinHashIndex.pairs(spark, dir, 0.5)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.forall(_.contains("sigs")), scans.mkString("\n"))
  }

  test("breakLease: a crashed writer's stale lease is broken and the " +
      "index serves identically after; a live (recently heartbeated) " +
      "lease is NOT breakable; transient acquire failures are not " +
      "misreported as lease-held") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val before = MinHashIndex.probe(
        docs.filter(col("doc_id") === 4), "doc_id", "text", dir, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a LIVE lease (fresh mtime — the heartbeat keeps it fresh on a
    // real holder) refuses the break
    val lease = new java.io.File(dir, ".MAINT_LEASE")
    assert(lease.createNewFile())
    val e = intercept[IllegalStateException] {
      MinHashIndex.breakLease(spark, dir)
    }
    assert(e.getMessage.contains("ALIVE"), e.getMessage)
    assert(lease.exists, "refused break must not delete the lease")
    // a CRASHED writer: heartbeat mtime far in the past → breakable;
    // the break returns the committed marker (fencing re-read)
    assert(lease.setLastModified(
      System.currentTimeMillis() - 10 * 60 * 1000))
    val marker = MinHashIndex.breakLease(spark, dir)
    assert(!lease.exists, "stale lease must be deleted by the break")
    assert(marker.exists(_.startsWith("format=")), marker.toString)
    // post-break: maintenance re-acquires normally, serving unchanged
    val after = MinHashIndex.probe(
        docs.filter(col("doc_id") === 4), "doc_id", "text", dir, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before && after.nonEmpty)
    MinHashIndex.append(docs.limit(0), "doc_id", "text", dir)
  }

  test("ingestStream is a WRITER: it holds the lease for the query's " +
      "lifetime (concurrent build fail-fasts), stamps +ingest into " +
      "the marker so freshness checks see the mutation, and releases " +
      "on termination") {
    val s = spark
    import s.implicits._
    implicit val sc = s.sqlContext
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs.filter(col("doc_id") <= 3), "doc_id",
      "text", dir, fingerprint = "v1")
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = MinHashIndex.ingestStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      java.nio.file.Files.createTempDirectory("mhlease").toString)
    try {
      // the running ingest holds the lease: a concurrent rebuild (the
      // op that would delete sigs_stream under the live sink) aborts
      val e = intercept[IllegalStateException] {
        MinHashIndex.build(docs, "doc_id", "text", dir)
      }
      assert(e.getMessage.contains("lease"), e.getMessage)
      // a second concurrent ingest is refused too (single writer)
      val e2 = intercept[IllegalStateException] {
        MinHashIndex.ingestStream(
          in.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
          java.nio.file.Files.createTempDirectory("mhlease2").toString)
      }
      assert(e2.getMessage.contains("lease"), e2.getMessage)
      // the marker now records the mutation: the pristine-fingerprint
      // freshness check sees the ingest (stamped at start — an empty
      // segment reads as stale, the safe direction)
      assert(!IndexFs.readMarker(s, dir, "INDEX_READY")
        .contains("format=1 numHashes=32 bands=8 grams=word3 " +
          "corpus[v1]"))
    } finally { q.stop() }
    awaitLeaseRelease(dir)
    // terminated → the lease is gone and ensureBuilt's rebuild runs
    assert(MinHashIndex.ensureBuilt(docs, "doc_id", "text", dir,
      fingerprint = "v1"))
  }

  test("ids that null under the long cast FAIL FAST at every boundary" +
      " (build, probe batch, delete) instead of collapsing into one " +
      "garbage null-id signature") {
    val s = spark
    import s.implicits._
    val dir = tmpDir()
    val bad = Seq(("not-a-number", "alpha beta gamma delta epsilon"),
        ("17", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      MinHashIndex.build(bad, "doc_id", "text", dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("numeric and non-null")),
      msgs(e).mkString("\n"))
    MinHashIndex.build(corpus(), "doc_id", "text", dir)
    val e2 = intercept[Exception] {
      MinHashIndex.probe(bad, "doc_id", "text", dir, 0.5).collect()
    }
    assert(msgs(e2).exists(_.contains("numeric and non-null")))
    val e3 = intercept[Exception] {
      MinHashIndex.delete(s, dir,
        Seq(("x", 1)).toDF("doc_id", "junk").select("doc_id"))
    }
    assert(msgs(e3).exists(_.contains("numeric and non-null")))
  }

  test("probeVerified == minhashJoinPairs' exact pairs when the " +
      "estimate gate is opened below the banding floor") {
    val dir = tmpDir()
    val docs = corpus()
    MinHashIndex.build(docs, "doc_id", "text", dir)
    val incoming = docs.filter(col("doc_id").isin(1L, 4L, 6L))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)
    val got = MinHashIndex.probeVerified(incoming, docs, "doc_id",
        "text", dir, threshold = 0.6, estThreshold = 0.0)
      .collect().map(key).toSet
    val want = Dedup.minhashJoinPairs(incoming, docs, "doc_id",
        "text", 32, 8, threshold = 0.6)
      .collect().map(key).toSet
    assert(got == want, s"got $got, want $want")
  }
}
