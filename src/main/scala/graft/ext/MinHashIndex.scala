package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-dup index — shingle ONCE, probe forever.
  *
  * Every `Dedup.minhashJoinPairs` invocation re-tokenizes, re-shingles
  * and re-signs the ENTIRE corpus to answer one incoming batch — the
  * right shape for a one-shot backfill, linear-in-corpus waste for the
  * production ingest loop where batches arrive continuously against a
  * slowly-growing corpus. At 100 TB the corpus-side signature pass IS
  * the job; the signatures it produces are 32 longs per document and
  * never change while the document doesn't. This object persists them,
  * mirroring the `AnnIndex` lifecycle (same marker/lease/fingerprint
  * discipline, shared `IndexFs` primitives):
  *
  *   - `build` computes MinHash signatures over word 3-gram shingles
  *     (`Dedup.shingleRows`, the prose default) or char 5-grams
  *     (`Dedup.charGramRows`, the code/short-text unit — `grams`
  *     param, recorded in the marker) with `Dedup.minhashSignatures`
  *     — md5 double hashing, deterministic cross-engine — for the
  *     whole corpus and
  *     writes ONE skinny table under `dir`:
  *       `sigs/` (id LONG, m0..m{n-1} LONG) — numHashes longs/doc,
  *     then commits an `INDEX_READY` marker (format version, params,
  *     corpus fingerprint) LAST: a killed build leaves no readable
  *     index, and `load` refuses a markerless dir.
  *   - `append` signs ONLY the new documents (the hash family is
  *     content-deterministic — md5 of the shingle text — so appended
  *     signatures are bit-identical to what a full rebuild would
  *     produce) and parquet-appends them; the marker gains a
  *     `+append[fingerprint]` line so single-corpus freshness checks
  *     see the mutation.
  *   - `probe` answers an incoming batch from the INDEX ALONE: sign
  *     the batch (the only text work is batch-sized), derive band keys
  *     map-side on BOTH sides from the skinny signature rows, bucket
  *     join (hot-bucket salted via `Dedup.bucketJoinPairs` — never
  *     all-pairs), then score candidates by MinHash AGREEMENT —
  *     `|{i : sigA[i]=sigB[i]}| / numHashes`, the unbiased Jaccard
  *     estimator the signatures exist for. No corpus text is read at
  *     probe time; the corpus-side scan is numHashes longs per doc.
  *     With numHashes a power of two the estimate is an exact binary
  *     fraction — bit-identical in Spark and the DuckDB oracle replay.
  *
  * Estimator calibration: agreement/n over n=32 independent
  * permutations has σ = √(j(1-j)/32) ≈ 0.087 at j=0.5 — callers
  * gating a corpus at threshold t should either accept the variance
  * (near-dup thresholds are themselves heuristic) or exact-verify the
  * estimate's survivors against re-read text (`probeVerified`), which
  * touches only candidate documents — batch-bounded, not
  * corpus-bounded.
  *
  * 100 TB posture: the index is numHashes longs per document
  * (~0.03% of a 1 KB-doc corpus); probe shuffles only band keys and
  * signature rows of candidates. Maintenance is single-writer
  * (exclusive lease) exactly like `AnnIndex`; concurrent probes never
  * take the lease.
  *
  * Reference anchor: the reference engine's dedup story is exact
  * row-level (`main.gs:240-249` filters); this is the scale path the
  * driver mandate adds on top.
  */
object MinHashIndex {

  private val Marker = "INDEX_READY"
  private val Lease = ".MAINT_LEASE"
  private val FormatVersion = 1

  private def withLease[T](spark: SparkSession, dir: String)
      (body: => T): T =
    IndexFs.withLease(spark, dir, Lease, "MinHash index")(body)

  private def readMarker(spark: SparkSession, dir: String)
      : Option[String] = IndexFs.readMarker(spark, dir, Marker)

  /** Index geometry, recorded in the marker. `grams` selects the
    * shingle unit: "word3" (word 3-grams — `Dedup.shingleRows`, the
    * prose-dedup default) or "char5" (char 5-grams —
    * `Dedup.charGramRows`, the code/short-text unit `dedup_ngram`
    * mines with).
    */
  final case class Meta(numHashes: Int, bands: Int, grams: String)

  private val GramsUnits = Set("word3", "char5")

  private def markerText(numHashes: Int, bands: Int, grams: String,
      fingerprint: String): String =
    s"format=$FormatVersion numHashes=$numHashes bands=$bands " +
      s"grams=$grams corpus[$fingerprint]"

  /** Signature frame (id, m0..m{n-1}) of `df` — the shared encode of
    * build, append and the probe's batch side. Documents too short to
    * shingle (under 3 tokens / 5 normalized chars) are ABSENT (they
    * cannot near-dup under set Jaccard); mirrors the oracle's
    * `WHERE len(ts) > 0`.
    */
  private def signatures(df: DataFrame, idCol: String, textCol: String,
      meta: Meta): DataFrame =
    Dedup.minhashSignatures(shingles(df, idCol, textCol, meta),
      meta.numHashes)

  /** The id boundary cast, failing FAST on ids the cast nulls out
    * (non-numeric strings, or nulls in the source): a silent null
    * here would collapse every such doc into ONE null-id signature
    * row (the groupBy in `minhashSignatures` unions their shingles —
    * a garbage signature emitting null-id matches), so the contract
    * is numeric, non-null ids, enforced in-plan (ADVICE r14).
    */
  private def idLong(c: Column): Column =
    when(c.try_cast("long").isNull,
      raise_error(concat(
        lit("MinHash index ids must be numeric and non-null; got: "),
        coalesce(c.cast("string"), lit("null")))).cast("long"))
      .otherwise(c.try_cast("long"))

  private def shingles(df: DataFrame, idCol: String, textCol: String,
      meta: Meta): DataFrame = {
    // normalize the id to LONG at the boundary, like AnnIndex's
    // encode: the streaming ingest and the tombstone anti-join are
    // long-typed, and a string-id corpus would otherwise widen
    // through unionByName and null out the delete comparison
    val norm = df.select(idLong(col(idCol)).as(idCol),
      col(textCol))
    meta.grams match {
      case "word3" => Dedup.shingleRows(norm, idCol, textCol)
      case "char5" => Dedup.charGramRows(norm, idCol, textCol, n = 5)
      case other => throw new IllegalArgumentException(
        s"unknown shingle unit '$other' " +
          s"(expected ${GramsUnits.mkString("/")})")
    }
  }

  /** Sign the corpus and commit the index at `dir` (overwrites any
    * previous index there). Single-writer; marker LAST.
    */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, numHashes: Int = 32, bands: Int = 8,
      fingerprint: String = "", grams: String = "word3"): Unit =
    withLease(corpus.sparkSession, dir) {
      require(numHashes % bands == 0,
        s"bands=$bands must divide numHashes=$numHashes")
      require(GramsUnits(grams), s"unknown shingle unit '$grams'")
      val spark = corpus.sparkSession
      // lift the marker FIRST (the AnnIndex doBuild discipline): the
      // rebuild overwrites sigs/ over a corpus-scan-long window, and a
      // crash mid-overwrite — or a concurrent probe, which never takes
      // the lease — must see "no committed index", never the previous
      // geometry's marker over mixed tables
      IndexFs.hfs(spark, dir)
        .delete(IndexFs.hpath(dir, Marker), false)
      signatures(corpus, idCol, textCol, Meta(numHashes, bands, grams))
        .write.mode("overwrite").parquet(s"$dir/sigs")
      // a rebuild retires queued tombstones AND the streaming segment:
      // both referred to the previous index's contents
      IndexFs.hfs(spark, dir)
        .delete(IndexFs.hpath(dir, "deletes"), true)
      IndexFs.hfs(spark, dir)
        .delete(IndexFs.hpath(dir, "sigs_stream"), true)
      IndexFs.writeMarker(spark, dir, Marker,
        markerText(numHashes, bands, grams, fingerprint))
    }

  /** Rebuild iff the marker is missing or its params/corpus
    * fingerprint changed — a metadata check, never a corpus scan.
    * @return true iff a rebuild ran.
    */
  def ensureBuilt(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, numHashes: Int = 32, bands: Int = 8,
      fingerprint: String = "", grams: String = "word3"): Boolean = {
    val want = markerText(numHashes, bands, grams, fingerprint)
    val fresh = readMarker(corpus.sparkSession, dir).contains(want)
    if (!fresh)
      build(corpus, idCol, textCol, dir, numHashes, bands, fingerprint,
        grams)
    !fresh
  }

  /** Sign ONLY `df` with the committed index's (content-deterministic)
    * hash family and shingle unit and parquet-append the rows; the
    * marker gains a `+append[fingerprint]` line so `ensureBuilt`
    * against any single-corpus fingerprint sees staleness. Callers own
    * id disjointness (appending an already-indexed id serves duplicate
    * signature rows, which probe would surface as duplicate pairs).
    */
  def append(df: DataFrame, idCol: String, textCol: String,
      dir: String, fingerprint: String = ""): Unit =
    withLease(df.sparkSession, dir) {
      val spark = df.sparkSession
      val prev = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir — build first"))
      signatures(df, idCol, textCol, paramsOf(prev, dir))
        .write.mode("append").parquet(s"$dir/sigs")
      IndexFs.writeMarker(spark, dir, Marker,
        prev + s"\n+append[$fingerprint]")
    }

  /** Idempotent build+append composition: serve-only when the marker
    * already records exactly this (base, extra) history.
    */
  def ensureBuiltWithAppend(base: DataFrame, extra: DataFrame,
      idCol: String, textCol: String, dir: String, numHashes: Int = 32,
      bands: Int = 8, fingerprint: String = "",
      grams: String = "word3"): Boolean = {
    val want = markerText(numHashes, bands, grams, fingerprint) +
      s"\n+append[$fingerprint]"
    val fresh = readMarker(base.sparkSession, dir).contains(want)
    if (!fresh) {
      build(base, idCol, textCol, dir, numHashes, bands, fingerprint,
        grams)
      append(extra, idCol, textCol, dir, fingerprint)
    }
    !fresh
  }

  private def paramsOf(marker: String, dir: String): Meta = {
    val m =
      raw"format=(\d+) numHashes=(\d+) bands=(\d+) grams=(\S+) ".r
        .findFirstMatchIn(marker).getOrElse(
          throw new IllegalStateException(
            s"unreadable MinHash index marker at $dir"))
    require(m.group(1).toInt == FormatVersion,
      s"MinHash index at $dir has format ${m.group(1)}, " +
        s"this build reads $FormatVersion")
    Meta(m.group(2).toInt, m.group(3).toInt, m.group(4))
  }

  /** The committed signature table (queued tombstones anti-joined
    * away) and its params. Refuses a markerless dir — a killed build
    * is unreadable by construction.
    */
  def load(spark: SparkSession, dir: String): (Meta, DataFrame) = {
    val marker = readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed MinHash index at $dir"))
    val meta = paramsOf(marker, dir)
    val fs = IndexFs.hfs(spark, dir)
    val base = spark.read.parquet(s"$dir/sigs")
    val unioned =
      if (!fs.exists(IndexFs.hpath(dir, "sigs_stream"))) base
      else base.unionByName(
        spark.read.parquet(s"$dir/sigs_stream").select(base.columns
          .map(col).toIndexedSeq: _*))
    val sigs =
      if (!fs.exists(IndexFs.hpath(dir, "deletes"))) unioned
      else unioned.join(spark.read.parquet(s"$dir/deletes"), Seq("id"),
        "left_anti")
    (meta, sigs)
  }

  /** STREAMING index ingest — the online half of the lifecycle:
    * arriving documents are signed MAP-SIDE with the committed
    * index's hash family and shingle unit (`Dedup.shingleHashesCol` /
    * `charGramHashesCol` + `minhashComponent` — the word form is the
    * same expression `nearDupGate` probes with; both bit-compatible
    * with the batch `minhashSignatures`, pinned in MinHashIndexSpec)
    * and appended, exactly-once (the parquet
    * sink's metadata log dedups replayed micro-batches), into a
    * `sigs_stream/` SEGMENT beside the base table. A separate segment
    * because a FileStreamSink log in `sigs/` would hide the
    * batch-written files from readers; [[load]] unions the segment in
    * when present and [[compact]] folds + retires it. Docs too short
    * to shingle emit nothing — exactly the batch absence rule. No
    * state store, no shuffle: this is the AnnIndex.ingestStream shape
    * for text.
    *
    * The ingest is a WRITER, so it participates in the single-writer
    * protocol (ADVICE r14): it holds the maintenance lease for the
    * query's whole lifetime — a concurrent build/compact fail-fasts
    * instead of deleting the segment under the live sink — and stamps
    * a `+ingest` marker line up front so `ensureBuilt` freshness
    * checks see the mutation (stamped at START: if the stream ingests
    * nothing the index merely looks stale — a spurious-but-safe
    * rebuild, never a fresh-looking mutated index). The lease is
    * released within ~1 s of the query terminating (stop it, then run
    * compact); a crashed driver leaves it for [[breakLease]].
    */
  def ingestStream(stream: DataFrame, idCol: String, textCol: String,
      dir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    val marker = readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed MinHash index at $dir — build first"))
    val meta = paramsOf(marker, dir)
    val hs = meta.grams match {
      case "word3" => Dedup.shingleHashesCol(col(textCol))
      case "char5" => Dedup.charGramHashesCol(col(textCol), n = 5)
      case other => throw new IllegalStateException(
        s"index at $dir has unknown shingle unit '$other'")
    }
    IndexFs.withStreamLease(spark, dir, Lease, "MinHash index") {
      IndexFs.writeMarker(spark, dir, Marker, marker + "\n+ingest")
      stream
        .select(idLong(col(idCol)).as("id"), hs.as("__hs"))
        .filter(size(col("__hs")) > 0)
        .select(col("id") +: (0 until meta.numHashes).map(i =>
          Dedup.minhashComponent(col("__hs"), i).as(s"m$i")): _*)
        .writeStream.format("parquet")
        .option("path", s"$dir/sigs_stream")
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    }
  }

  /** Force-break a CRASHED writer's orphaned maintenance lease — see
    * [[IndexFs.breakLease]] (refuses while the holder's heartbeat is
    * live; re-reads the committed marker under the post-break state
    * as the fencing step).
    *
    * @return the marker committed at `dir` after the break; None means
    *         the crashed writer died pre-commit — rebuild before use
    */
  def breakLease(spark: SparkSession, dir: String,
      staleMillis: Long = IndexFs.DefaultStaleMillis): Option[String] =
    IndexFs.breakLease(spark, dir, Lease, Marker, staleMillis)

  /** Tombstone ids out of the index: queued in a skinny `deletes/`
    * table that every probe path anti-joins on the fly, physically
    * folded in by [[compact]] or the next full [[build]]. Marker
    * FIRST (a crash between the two steps forces a spurious-but-safe
    * rebuild, never a fresh-looking index silently serving removed
    * docs), ids localCheckpointed so the recorded count always equals
    * the written rows — the AnnIndex.delete discipline.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    withLease(spark, dir) {
      val prev = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir — nothing to delete " +
            "from"))
      val skinny = ids.select(ids.columns.head).toDF("id")
        .select(idLong(col("id")).as("id"))
        .localCheckpoint(true)
      val n = skinny.count()
      IndexFs.writeMarker(spark, dir, Marker, prev + s"\n+delete[$n]")
      skinny.write.mode("append").parquet(s"$dir/deletes")
    }

  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    delete(spark, dir, ids.toDF("id"))
  }

  /** Offline maintenance: rewrite the signature table without queued
    * tombstones, with the streaming segment folded in (stop any
    * running [[ingestStream]] first; the next ingest needs a FRESH
    * checkpoint — its sink log is retired with the segment), and with
    * healthy file sizes (every [[append]] adds files; a long-lived
    * ingest index accumulates small files). Result-invisible: probes
    * are identical before and after (they already unioned the segment
    * and anti-joined the queue). Staged through `sigs_tmp` + rename
    * with the marker LIFTED during the swap — a crash mid-swap leaves
    * an unreadable-by-construction index, never a half-swapped one.
    *
    * @return signature rows kept
    */
  def compact(spark: SparkSession, dir: String): Long =
    withLease(spark, dir) {
      val fs = IndexFs.hfs(spark, dir)
      val marker = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir"))
      val delPath = IndexFs.hpath(dir, "deletes")
      val segPath = IndexFs.hpath(dir, "sigs_stream")
      val hasDel = fs.exists(delPath)
      val hasSeg = fs.exists(segPath)
      // the folded frame IS what probes read — reuse load()'s
      // segment-union + tombstone-anti-join so the "result-invisible"
      // guarantee can't drift from the serve path
      val kept = load(spark, dir)._2
      kept.write.mode("overwrite").parquet(s"$dir/sigs_tmp")
      IndexFs.fail("minhash.compact.staged")
      fs.delete(IndexFs.hpath(dir, Marker), false)
      IndexFs.fail("minhash.compact.unmarked")
      fs.delete(IndexFs.hpath(dir, "sigs"), true)
      if (!fs.rename(IndexFs.hpath(dir, "sigs_tmp"),
          IndexFs.hpath(dir, "sigs")))
        throw new java.io.IOException(
          s"could not swap compacted sigs table at $dir")
      if (hasSeg) fs.delete(segPath, true)
      if (hasDel) fs.delete(delPath, true)
      IndexFs.fail("minhash.compact.swapped")
      IndexFs.writeMarker(spark, dir, Marker, marker)
      spark.read.parquet(s"$dir/sigs").count()
    }

  /** The committed index's occupied LSH buckets as the skinny
    * (band, bk) DISTINCT table `StreamingOps.nearDupGate` probes —
    * row-identical to `StreamingOps.corpusBandBuckets(corpus)` (same
    * hash family) but derived from the at-rest signatures: a
    * numHashes-longs-per-doc scan, no corpus text pass, so the
    * streaming ingest gate refreshes whenever the index does.
    */
  def bandBuckets(spark: SparkSession, dir: String): DataFrame =
    bandedSignatures(spark, dir).select("band", "bk").distinct()

  /** The committed signature table exploded to its LSH band buckets
    * WITH document ids — (id, band, bk), the static candidate side of
    * `StreamingOps.ingestGates`' exact-verified text leg
    * ([[bandBuckets]] distinct-s the ids away for `nearDupGate`'s
    * coarser bucket-hit verdict). Tombstones anti-joined, streaming
    * segment unioned ([[load]]); numHashes longs per doc of corpus
    * scan, no text pass.
    */
  def bandedSignatures(spark: SparkSession, dir: String): DataFrame = {
    val (meta, sigs) = load(spark, dir)
    sigs.select(col("id"), posexplode(
      Dedup.bandKeys(meta.bands, meta.numHashes / meta.bands))
      .as(Seq("band", "bk")))
  }

  /** All (batch doc, indexed doc) pairs whose ESTIMATED Jaccard —
    * MinHash component agreement / numHashes — reaches `threshold`.
    * Index-only: no corpus text is read. Output: (id_a = batch id,
    * id_b = indexed id, est_jaccard); a batch doc also indexed matches
    * itself at 1.0.
    */
  def probe(incoming: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double, hotCap: Int = 4096,
      salts: Int = 16): DataFrame = {
    val (meta, sigs) = load(incoming.sparkSession, dir)
    val numHashes = meta.numHashes
    val rowsPerBand = numHashes / meta.bands
    // the batch signature frame feeds a band leg and the agreement
    // join; checkpoint so the batch text is shingled once
    val sigNew = signatures(incoming, idCol, textCol, meta)
      .localCheckpoint(false)
    def banded(sig: DataFrame, as: String) =
      sig.select(col("id").as(as),
        posexplode(Dedup.bandKeys(meta.bands, rowsPerBand))
          .as(Seq("band", "bk")))
    val cand = Dedup.bucketJoinPairs(banded(sigNew, "id_a"),
        banded(sigs, "id_b"), hotCap, salts, ordered = false)
      .distinct()
    val a = sigNew.select(col("id").as("id_a") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"a$i")): _*)
    val b = sigs.select(col("id").as("id_b") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"b$i")): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** CORPUS-WIDE candidate near-dup pairs from the index ALONE —
    * the sign-once answer to `Dedup.minhashPairs`/`ngramPairs`' mining
    * legs, which re-tokenize/re-shingle/re-sign the whole corpus every
    * run: here the candidate generation is a band SELF-JOIN over the
    * at-rest signature table (numHashes longs/doc — ~0.03% of the
    * corpus bytes) through the same hot-bucket-salted
    * `Dedup.bucketPairs` scaffold, so the candidate set is IDENTICAL
    * to the mining legs' (same hash family → same signatures → same
    * band buckets), with zero text work. Pairs are scored by MinHash
    * agreement (exact binary fractions at power-of-two numHashes).
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b,
    *         est_jaccard >= threshold
    */
  def pairs(spark: SparkSession, dir: String, threshold: Double,
      hotCap: Int = 4096, salts: Int = 16): DataFrame = {
    val (meta, sigs, cand) = bandedCandidates(spark, dir, hotCap, salts)
    val numHashes = meta.numHashes
    val a = sigs.select(col("id").as("id_a") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"a$i")): _*)
    val b = sigs.select(col("id").as("id_b") +:
      (0 until numHashes).map(i => col(s"m$i").as(s"b$i")): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(a, "id_a").join(b, "id_b")
      .select(col("id_a"), col("id_b"),
        (agree.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Shared candidate generation of the corpus-wide pair paths: the
    * at-rest signature table (materialized once — it feeds band legs
    * and agreement joins), and the distinct (id_a < id_b) band-bucket
    * co-occurrences through the hot-bucket-salted self-join.
    */
  private def bandedCandidates(spark: SparkSession, dir: String,
      hotCap: Int, salts: Int): (Meta, DataFrame, DataFrame) = {
    val (meta, sigs0) = load(spark, dir)
    val sigs = sigs0.localCheckpoint(false)
    val banded = sigs.select(col("id"),
      posexplode(
        Dedup.bandKeys(meta.bands, meta.numHashes / meta.bands))
        .as(Seq("band", "bk")))
    (meta, sigs, Dedup.bucketPairs(banded, hotCap, salts).distinct())
  }

  /** [[pairs]]' candidates EXACT-verified — the index-served
    * equivalent of the corpus-mining legs (`Dedup.minhashPairs` /
    * `ngramPairs` at the same geometry and threshold), with the
    * corpus-side text read ONLY for candidate documents (one semi-join
    * on the candidate id set bounds the re-shingle to candidates —
    * linear in true-pair volume, not corpus size). With
    * `estThreshold` <= 0 no estimate gate is applied, so the pair set
    * EQUALS the mining leg's by construction: identical banded
    * candidates, identical exact-Jaccard bar. A positive
    * `estThreshold` prunes the verify leg at the cost of estimator-
    * variance recall (σ ≈ 0.09 at n=32).
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b — exact
    */
  def pairsVerified(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double, estThreshold: Double = 0.0,
      hotCap: Int = 4096, salts: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    // no estimate gate → the banded candidates go straight to verify
    // (skipping the agreement joins), which is what makes the result
    // EQUAL to the mining leg rather than approximately so
    val (meta, cand0) =
      if (estThreshold > 0) {
        val m = paramsOf(readMarker(spark, dir).getOrElse(
          throw new IllegalStateException(
            s"no committed MinHash index at $dir")), dir)
        (m, pairs(spark, dir, estThreshold, hotCap, salts))
      } else {
        val (m, _, c) = bandedCandidates(spark, dir, hotCap, salts)
        (m, c)
      }
    verifyPairs(corpus, idCol, textCol, meta, cand0, threshold)
  }

  /** EXACT-verify a candidate pair frame (id_a, id_b) against re-read
    * text of the candidate documents only — the shared verify leg of
    * [[pairsVerified]] and [[deleteGroups]]'s confined re-mine. One
    * semi-join on the candidate id set bounds the re-shingle to
    * candidates; both pair sides come from the same `corpus`.
    */
  private def verifyPairs(corpus: DataFrame, idCol: String,
      textCol: String, meta: Meta, cand0: DataFrame,
      threshold: Double): DataFrame = {
    val cand = cand0.select("id_a", "id_b").localCheckpoint(false)
    // ONE candidate-bounded shingle relation serves both pair sides
    // and the set sizes (both sides come from the same corpus)
    val candIds = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    val sh = shingles(
      corpus.join(candIds, Seq(idCol), "left_semi"), idCol, textCol,
      meta).localCheckpoint(false)
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val cnt = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    inter
      .join(cnt.select(col("id").as("id_a"), col("n").as("na")),
        "id_a")
      .join(cnt.select(col("id").as("id_b"), col("n").as("nb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** `probe`, then EXACT-verify the survivors: re-read text for the
    * candidate documents only (two semi-join-bounded shingle passes —
    * batch-bounded work, never a corpus re-shingle) and keep pairs at
    * exact Jaccard >= `threshold`. `estThreshold` opens the candidate
    * gate wider than the final bar so estimator variance doesn't drop
    * borderline true pairs. Output: (id_a, id_b, jaccard) — exact.
    */
  def probeVerified(incoming: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, dir: String, threshold: Double,
      estThreshold: Double, hotCap: Int = 4096,
      salts: Int = 16): DataFrame =
    verifyPairs(probe(incoming, idCol, textCol, dir, estThreshold,
      hotCap, salts), incoming, corpus, idCol, textCol, dir, threshold)

  /** EXACT-verify an EXTERNALLY-SUPPLIED candidate pair set —
    * (id_a = batch id, id_b = indexed id) from any candidate
    * generator sharing the index's hash family (the stateful gate's
    * `StatefulGates.nearDupCandidatesStateful`, a salted probe, a
    * re-played probe) — with [[probeVerified]]'s exact verify step
    * VERBATIM: re-read text for candidate documents only (semi-join
    * bounded), shingle under the index's recorded unit, keep pairs
    * at exact Jaccard >= `threshold`. Factored out so alternative
    * candidate paths verify through the SAME code and cannot drift.
    */
  def verifyPairs(cand0: DataFrame, incoming: DataFrame,
      corpus: DataFrame, idCol: String, textCol: String, dir: String,
      threshold: Double): DataFrame = {
    val spark = incoming.sparkSession
    val meta = paramsOf(readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed MinHash index at $dir")), dir)
    val cand = cand0.select("id_a", "id_b").localCheckpoint(false)
    val shNew = shingles(
      incoming.join(cand.select(col("id_a").as(idCol)).distinct(),
        Seq(idCol), "left_semi"), idCol, textCol, meta)
    val shCor = shingles(
      corpus.join(cand.select(col("id_b").as(idCol)).distinct(),
        Seq(idCol), "left_semi"), idCol, textCol, meta)
    val inter = cand
      .join(shNew.select(col("id").as("id_a"), col("shingle")), "id_a")
      .join(shCor.select(col("id").as("id_b"), col("shingle")),
        Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    val cntNew = shNew.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val cntCor = shCor.groupBy(col("id")).agg(count(lit(1)).as("n"))
    inter
      .join(cntNew.select(col("id").as("id_a"), col("n").as("na")),
        "id_a")
      .join(cntCor.select(col("id").as("id_b"), col("n").as("nb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        (col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // --- near-dup GROUPS at rest -------------------------------------
  //
  // dedup_groups re-mines every pair and re-runs connected components
  // over the WHOLE corpus on every invocation. The group structure
  // only changes when the corpus does, and an arriving batch can only
  // (a) join existing groups, (b) form new ones, or (c) MERGE
  // existing groups it bridges — all three are decided by the batch's
  // pairs alone. So groups get the same at-rest treatment as the
  // signatures: buildGroups commits the full CC labels once;
  // appendGroups folds a just-appended batch in by running CC over
  // the SUPER-NODE graph (one node per touched existing group label
  // or new id — bounded by the batch's reach, never corpus-sized)
  // and relabeling only members of merged groups (a broadcast-sized
  // label map). The result is EQUAL to a full re-mine + CC by
  // construction: existing components stay internally connected, and
  // the new edges are exactly the pairs a full mine would add
  // (probeVerified at estThreshold=0 sees every banded candidate of
  // the batch, batch-internal ones included once the batch is in the
  // index) — pinned by sharing dedup_groups' oracle and by the
  // rebuild-equality spec.

  private val GroupsMarker = "GROUPS_READY"

  private def groupsMarkerText(indexMarker: String,
      threshold: Double): String =
    s"format=$FormatVersion threshold=$threshold " +
      s"index[${IndexFs.markerDigest(indexMarker)}]"

  /** The incremental-fold precondition — see [[IndexFs.requireFoldable]]:
    * the committed GROUPS_READY digests a PREFIX of the index marker
    * and the next un-folded line is the mutation kind being folded, so
    * a multi-mutation suffix folds as a sequence of bounded folds in
    * marker order (r17). Returns the groups-marker text this fold
    * stamps — the digest advanced by exactly the one folded line.
    */
  private def requireFoldable(spark: SparkSession, dir: String,
      idx: String, threshold: Double, op: String,
      accept: String => Boolean, expected: String): String =
    IndexFs.requireFoldable(spark, dir, GroupsMarker, idx, op, accept,
      expected, prev => groupsMarkerText(prev, threshold))

  /** The committed groups marker and whether it digests the CURRENT
    * index marker — the ops-CLI staleness view (None = no groups
    * table committed).
    */
  def groupsStatus(spark: SparkSession, dir: String)
      : Option[(String, Boolean)] =
    IndexFs.readMarker(spark, dir, GroupsMarker).map { gm =>
      val cur = readMarker(spark, dir).map(IndexFs.markerDigest)
      (gm, cur.exists(d => gm.contains(s"index[$d]")))
    }

  /** True iff a committed groups table exists AND matches the CURRENT
    * index marker (any append/delete/ingest since it was built flips
    * the digest) at this `threshold`. Compaction preserves the marker
    * text and is result-invisible, so groups stay fresh across it.
    */
  def groupsFresh(spark: SparkSession, dir: String,
      threshold: Double): Boolean =
    readMarker(spark, dir).exists { idx =>
      IndexFs.readMarker(spark, dir, GroupsMarker)
        .contains(groupsMarkerText(idx, threshold))
    }

  /** The committed groups table: (id, label) for every document in
    * some near-dup pair; label = min id of its group. Unpaired docs
    * are absent (their group is trivially themselves).
    */
  def readGroups(spark: SparkSession, dir: String): DataFrame = {
    require(IndexFs.readMarker(spark, dir, GroupsMarker).nonEmpty,
      s"no committed groups table at $dir (missing $GroupsMarker)")
    spark.read.parquet(s"$dir/groups")
  }

  /** Full connected-components pass over [[pairsVerified]]'s exact
    * pairs, committed as the at-rest `groups/` table. Marker LAST,
    * digesting the index marker it was built against.
    */
  def buildGroups(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double): Unit =
    withLease(corpus.sparkSession, dir) {
      val spark = corpus.sparkSession
      val want = groupsMarkerText(readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir — build first")),
        threshold)
      IndexFs.hfs(spark, dir)
        .delete(IndexFs.hpath(dir, GroupsMarker), false)
      graft.operators.ConnectedComponents.labels(
          pairsVerified(corpus, idCol, textCol, dir, threshold)
            .select(col("id_a"), col("id_b")))
        .write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.writeMarker(spark, dir, GroupsMarker, want)
    }

  /** Fold a JUST-APPENDED batch into the committed groups table
    * incrementally — no corpus-wide re-mine, no corpus-wide CC.
    * Preconditions: the batch's signatures are already in the index
    * ([[append]] or a compacted ingest), `corpus` is the full
    * post-append corpus (the exact-verify side reads candidate text
    * from it), and a groups table is committed.
    *
    * Work is bounded by the batch's reach: one [[probeVerified]]
    * (batch-sized probe, candidate-only verify), CC over the
    * super-node graph (touched group labels + newly-paired ids), and
    * a relabel join against the label map. Result equals a full
    * rebuild's labels — the min of a merged component is the min over
    * its super-node ids, since every member id >= its group's label.
    *
    * STALENESS is checked against the fold ORDER (ADVICE r15,
    * relaxed to mutation suffixes in r17 — VERDICT r16 #4): the
    * committed GROUPS_READY must digest a prefix of the index marker
    * whose NEXT line is an `+append`/`+ingest` — the batch being
    * folded. A multi-mutation suffix (append, append, delete) folds
    * as a sequence of bounded calls in marker order, each advancing
    * the groups digest by one line; folding out of order (the next
    * un-folded line is a `+delete`) throws toward [[deleteGroups]] /
    * [[buildGroups]]. The caller passes the batch MATCHING the next
    * un-folded line — the fold machinery verifies order and kind, the
    * batch contents are the caller's contract (as before).
    *
    * With later mutations still queued, note the probe side reads the
    * index AS IT IS — later-appended signatures participate as
    * candidate partners and queued tombstones are anti-joined
    * ([[load]]) even before their own folds run. Every pair that adds
    * is one the final rebuild has, and the remaining folds add the
    * rest, so the DRAINED sequence equals a full [[buildGroups]]
    * (spec-pinned); intermediate states are valid conservative
    * approximations of their prefix.
    */
  def appendGroups(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, dir: String, threshold: Double): Unit =
    withLease(batch.sparkSession, dir) {
      val spark = batch.sparkSession
      val fs = IndexFs.hfs(spark, dir)
      val idx = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir — build first"))
      val stamp = requireFoldable(spark, dir, idx, threshold,
        "appendGroups",
        l => l.startsWith("+append[") || l == "+ingest",
        "+append/+ingest")
      val newPairs = probeVerified(batch, corpus, idCol, textCol,
          dir, threshold, estThreshold = 0.0)
        .select(col("id_a"), col("id_b"))
      // super-node CC fold + relabel (shared with AnnIndex.appendGroups);
      // EAGER checkpoint: the update reads groups/ and then overwrites it
      val updated = graft.operators.ConnectedComponents
        .foldIncrement(spark.read.parquet(s"$dir/groups"), newPairs)
        .localCheckpoint(true)
      fs.delete(IndexFs.hpath(dir, GroupsMarker), false)
      IndexFs.fail("minhash.groups.unmarked")
      updated.write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.fail("minhash.groups.written")
      IndexFs.writeMarker(spark, dir, GroupsMarker, stamp)
    }

  /** Fold a JUST-QUEUED [[delete]] into the committed groups table
    * incrementally — the dual of [[appendGroups]]. A delete can SPLIT
    * a group (removing a bridge doc disconnects its component), which
    * the append fold's super-node trick cannot express; instead
    * components are recomputed ONLY over the touched groups' surviving
    * members — bounded by group reach, never corpus-sized:
    *
    *   - touched groups = groups with a tombstoned member; untouched
    *     groups cannot change (a pair between a touched-group member
    *     and an untouched-group one would have put them in ONE group
    *     already — pairwise Jaccard doesn't depend on other docs);
    *   - the re-mine is the banded self-join + exact verify CONFINED
    *     to the touched groups' surviving members (their at-rest
    *     signatures semi-joined, tombstones already anti-joined by
    *     [[load]]), so its cost is |touched members|, and every pair a
    *     full rebuild would find among them is found (both endpoints
    *     are in the confined set — see the untouched argument above);
    *   - untouched rows carry over verbatim; re-mined components get
    *     min-id labels (equal to a full rebuild's: each component is a
    *     subset of the confined set, so its min is unchanged); members
    *     left unpaired drop out, matching the "unpaired docs are
    *     absent" contract.
    *
    * Preconditions (the [[appendGroups]] suffix-walk, dual): the
    * next un-folded marker line after the prefix GROUPS_READY digests
    * must be a `+delete[n]` — out-of-order folds throw toward the
    * matching fold / [[buildGroups]]. `corpus` is the post-delete
    * corpus (the verify leg re-reads candidate text from it;
    * tombstoned docs may be present or absent — they are excluded by
    * id either way). The `deletes/` queue is applied IN FULL at every
    * fold (tombstones are authoritative), so with several deletes
    * queued an earlier delete's fold may re-mine a later delete's
    * touched groups early — that later fold then finds its groups
    * already clean and no-ops for them; the drained sequence equals a
    * full rebuild (pinned in MinHashIndexSpec, including a bridge
    * delete that splits a group and a 3-mutation
    * append/append/delete sequence).
    */
  def deleteGroups(corpus: DataFrame, idCol: String, textCol: String,
      dir: String, threshold: Double, hotCap: Int = 4096,
      salts: Int = 16): Unit =
    withLease(corpus.sparkSession, dir) {
      val spark = corpus.sparkSession
      val fs = IndexFs.hfs(spark, dir)
      val idx = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed MinHash index at $dir — build first"))
      val stamp = requireFoldable(spark, dir, idx, threshold,
        "deleteGroups", l => l.startsWith("+delete["), "+delete[n]")
      val g = spark.read.parquet(s"$dir/groups")
        .localCheckpoint(false)
      val del = spark.read.parquet(s"$dir/deletes").select(col("id"))
      val touched = g.join(del, Seq("id"), "left_semi")
        .select(col("label")).distinct()
      // surviving members of touched groups — the confined re-mine
      // universe; EAGER: reads groups/, which the fold overwrites
      val members = g.join(touched, Seq("label"), "left_semi")
        .join(del, Seq("id"), "left_anti")
        .select(col("id"))
        .localCheckpoint(true)
      val (meta, sigs) = load(spark, dir) // tombstones anti-joined
      val sigsM = sigs.join(members, Seq("id"), "left_semi")
        .localCheckpoint(false)
      val banded = sigsM.select(col("id"),
        posexplode(
          Dedup.bandKeys(meta.bands, meta.numHashes / meta.bands))
          .as(Seq("band", "bk")))
      val cand = Dedup.bucketPairs(banded, hotCap, salts).distinct()
      val relabeled = graft.operators.ConnectedComponents.labels(
          verifyPairs(corpus, idCol, textCol, meta, cand, threshold)
            .select(col("id_a"), col("id_b")))
        .localCheckpoint(true)
      // shared delete-fold relabel (with AnnIndex.deleteGroups);
      // EAGER: reads groups/, which the write below overwrites
      val updated = graft.operators.ConnectedComponents
        .foldDelete(g, touched, relabeled)
        .localCheckpoint(true)
      fs.delete(IndexFs.hpath(dir, GroupsMarker), false)
      IndexFs.fail("minhash.groups.unmarked")
      updated.write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.fail("minhash.groups.written")
      IndexFs.writeMarker(spark, dir, GroupsMarker, stamp)
    }
}
