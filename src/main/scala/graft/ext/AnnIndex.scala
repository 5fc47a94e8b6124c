package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle — train ONCE, serve many.
  *
  * `Similarity.ivfPqTopK` retrains its Lloyd codebooks and re-encodes
  * the corpus on every invocation; BENCH_SF1.md measured that training
  * as the dominant, linear-in-corpus cost (sim_pq 10× ratio 8.5) while
  * the ADC scan the index exists for stayed 0.27× linear. Production
  * ANN systems (FAISS on-disk indexes, Vespa/Milvus segments) split
  * the lifecycle: an offline BUILD materializes quantizers + packed
  * codes as at-rest tables; online SEARCH loads the bounded quantizer
  * tables and scans only probed-cell code partitions. This object is
  * that split, arranged so `search` is HASH-IDENTICAL to the
  * train-every-time `ivfPqTopK` on the same corpus (pinned in
  * AnnIndexSpec):
  *
  *   - `build` trains the same deterministic quantizers (first-N
  *     coarse cells, integer-exact PQ Lloyd — `Similarity.pqTrainCore`)
  *     and writes four tables under `dir`:
  *       `codes/`     (id, naa, bc[m]) PARTITIONED BY cell — probing
  *                    p cells is partition pruning, so a query reads
  *                    p/nCells of the index bytes at any corpus size;
  *       `codebooks/` (sm, c, vals[sub]) — m·nCentroids rows;
  *       `coarse/`    (cell, vec[dim]) — nCells rows;
  *       `meta/`      1 row of format version + geometry + scale.
  *     A `INDEX_READY` marker (format version, params, corpus
  *     fingerprint) is written LAST — a killed build leaves no
  *     readable index, and `load` refuses a markerless dir.
  *   - `search` reads the three bounded side tables (driver-side,
  *     nCells + m·nCentroids rows), picks probe cells exactly like
  *     `ivfPqTopK`, ADC-scores ONLY the probed partitions with the
  *     same fixed-order qdot sums, and exact-cosine rescores the
  *     nCand shortlist against the corpus. No training stage exists
  *     in the plan: the only corpus scan is the broadcast-semi-joined
  *     rescore leg (pinned).
  *   - `ensureBuilt` makes the lifecycle idempotent: rebuild iff the
  *     marker is missing or its params/corpus fingerprint changed
  *     (fingerprint = file sizes + mtimes of the corpus parquet — a
  *     metadata read, never a data scan, so the serve path stays
  *     training-free even when the check runs every query).
  *
  * 100 TB posture: build is one training pass + one encode pass +
  * one partitioned write (all linear, run once, amortized across
  * every query thereafter); serve reads `probes` partitions of an
  * m-bytes-per-vector table plus a k-bounded rescore. Re-sharding,
  * compaction, and z-order of the codes table compose with the
  * existing `sources/` maintenance operators because it is a plain
  * parquet table.
  */
object AnnIndex {

  private val Marker = "INDEX_READY"
  private val Lease = ".MAINT_LEASE"
  /** Bump when the on-disk layout changes shape. v2: optional
    * `deletes/` tombstone table beside the codes table. v3: `hier`
    * column in meta/ — the coarse-assignment hierarchy recorded at
    * build time so build/append/streaming-ingest assign cells
    * IDENTICALLY (0 = flat ranking, >0 = two-level with that many
    * super-probes).
    */
  private val FormatVersion = 3

  // ── Hadoop-FS helpers ──────────────────────────────────────────────
  // Every filesystem touch goes through the Hadoop FileSystem resolved
  // from `dir`'s scheme, like parquetFingerprint always did — a
  // java.nio marker on an HDFS/S3 index dir would land on LOCAL disk
  // and silently disagree with the actual remote index state
  // (ADVICE r12). Single-writer maintenance is ENFORCED by an
  // exclusive lease file (see withLease): a second concurrent
  // build/append/delete/compact aborts loudly. Concurrent SEARCHES
  // never take the lease and are always fine.

  private def hfs(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem = IndexFs.hfs(spark, dir)

  private def hpath(parts: String*): org.apache.hadoop.fs.Path =
    IndexFs.hpath(parts: _*)

  private def readMarker(spark: SparkSession, dir: String)
      : Option[String] = IndexFs.readMarker(spark, dir, Marker)

  /** Single-writer maintenance guard — see [[IndexFs.withLease]]. */
  private def withLease[T](spark: SparkSession, dir: String)
      (body: => T): T =
    IndexFs.withLease(spark, dir, Lease, "ANN index")(body)

  /** Marker commit via tmp + rename — see [[IndexFs.writeMarker]]. */
  private def writeMarker(spark: SparkSession, dir: String,
      text: String): Unit = IndexFs.writeMarker(spark, dir, Marker, text)

  final case class Meta(nCells: Int, m: Int, nCentroids: Int, sub: Int,
      scale: Double, hier: Int)

  /** Hadoop-FS metadata fingerprint of a table path: file count +
    * total bytes + max mtime. Cheap (no Spark job, no data read) and
    * catches regenerated testdata, which file paths alone would miss.
    */
  def parquetFingerprint(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L; var bytes = 0L; var mtime = 0L
    while (it.hasNext) {
      val f = it.next()
      n += 1; bytes += f.getLen; mtime = math.max(mtime, f.getModificationTime)
    }
    s"files=$n bytes=$bytes mtime=$mtime"
  }

  /** EXACT row count of a parquet table read from its file FOOTERS —
    * driver-side metadata only, no Spark job (r18, guide §1.2): the
    * nCells derivation needs the corpus cardinality on every
    * invocation, and a count() job costs a full action round-trip
    * (~100 ms of driver latency) to read a number the footers already
    * hold. Footer row counts are exact, so this equals
    * `spark.read.parquet(path).count()` bit for bit.
    */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && f.getLen > 0 &&
          !name.startsWith("_") && !name.startsWith(".")) {
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(f, conf))
        try n += r.getRecordCount
        finally r.close()
      }
    }
    n
  }

  private def markerText(nCells: Int, m: Int, nCentroids: Int,
      hier: Int, fingerprint: String): String =
    s"format=$FormatVersion nCells=$nCells m=$m nCentroids=$nCentroids " +
      s"hier=$hier corpus[$fingerprint]"

  /** Train quantizers, encode the corpus, write the index tables, and
    * commit the marker. Overwrites any previous index at `dir`.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = 16, m: Int = 8, nCentroids: Int = 16,
      iters: Int = 3, fingerprint: String = "", hier: Int = 0): Unit =
    withLease(df.sparkSession, dir) {
      doBuild(df, idCol, vecCol, dir, nCells, m, nCentroids, iters,
        fingerprint, hier)
    }

  private def doBuild(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int, m: Int, nCentroids: Int,
      iters: Int, fingerprint: String, hier: Int): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val coarse = Similarity.ivfCentroids(df, idCol, vecCol, nCells)
    val dim = coarse.head.length
    val sub = dim / m
    require(m * sub == dim, s"dim $dim must divide into $m subspaces")
    val (scale, codes, cents) =
      Similarity.pqTrainCore(df, idCol, vecCol, m, nCentroids, iters)
    // the marker is the commit record: remove it FIRST so a crash
    // mid-overwrite can never leave a stale marker over mixed tables
    val fs = hfs(spark, dir)
    fs.mkdirs(hpath(dir))
    fs.delete(hpath(dir, Marker), false)
    // a full rebuild retires any streaming segment (its rows were
    // encoded with the PREVIOUS quantizers) and folds tombstones away
    // (the rebuilt corpus is the source of truth)
    fs.delete(hpath(dir, "codes_stream"), true)
    fs.delete(hpath(dir, "deletes"), true)
    val cellDf = df.select(col(idCol).cast("long").as("id"),
      cellCol(df, col(vecCol), coarse, hier).as("cell"))
    val aD = col("a").cast("array<double>")
    codes
      .select(col("id"),
        Similarity.dot(df, aD, aD).cast("long").as("naa"),
        Similarity.pqBestCol(codes, cents, m, nCentroids, sub).as("bc"))
      .join(cellDf, "id")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/codes")
    cents.toSeq.map { case ((sm, c), vals) => (sm, c, vals) }
      .toDF("sm", "c", "vals")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    coarse.zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell", "vec")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/coarse")
    Seq((FormatVersion, nCells, m, nCentroids, sub, scale, hier))
      .toDF("version", "n_cells", "m", "n_centroids", "sub", "scale",
        "hier")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    writeMarker(spark, dir,
      markerText(nCells, m, nCentroids, hier, fingerprint))
  }

  /** Build unless a committed index with the same params AND corpus
    * fingerprint already sits at `dir`. Returns true iff it built.
    */
  def ensureBuilt(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int = 16, m: Int = 8, nCentroids: Int = 16,
      iters: Int = 3, fingerprint: String = "",
      hier: Int = 0): Boolean = {
    val want = markerText(nCells, m, nCentroids, hier, fingerprint)
    val fresh = readMarker(df.sparkSession, dir).contains(want)
    if (!fresh)
      build(df, idCol, vecCol, dir, nCells, m, nCentroids, iters,
        fingerprint, hier)
    !fresh
  }

  /** Incremental index maintenance: encode NEW vectors with the
    * FROZEN quantizers (stored scale, codebooks, coarse centroids)
    * and append their code rows to the partitioned codes table —
    * no retraining, and existing partitions are untouched (parquet
    * append adds files inside the affected cell directories).
    * This is how production ANN serves a growing corpus between
    * periodic full rebuilds: queries see old + new vectors
    * immediately; quantizer drift is bounded by the rebuild cadence.
    * Codes of vectors outside the trained scale simply exceed ±127 —
    * integer columns, no clamping, same arithmetic both engines.
    *
    * The marker gains a `+append[fingerprint]` line per append (any
    * NUMBER of appends compose), so a later `ensureBuilt` against any
    * single-corpus fingerprint sees staleness and triggers the full
    * rebuild — the rebuild cadence falls out of the same staleness
    * check. The marker update is tmp+rename (a crashed append leaves
    * the previous marker, never a truncated one); maintenance ops are
    * single-writer — run one build/append/delete/compact at a time.
    */
  def append(df: DataFrame, idCol: String, vecCol: String,
      dir: String, fingerprint: String = ""): Unit =
    withLease(df.sparkSession, dir) {
      doAppend(df, idCol, vecCol, dir, fingerprint)
    }

  private def doAppend(df: DataFrame, idCol: String, vecCol: String,
      dir: String, fingerprint: String): Unit = {
    val spark = df.sparkSession
    val (meta, coarse, cents) = load(spark, dir)
    // one shared map-side encode with the streaming ingest (PqBestCodes
    // takes the code array as ONE child, so the inlined transform(...)
    // is evaluated once per row — not the per-element re-inline that
    // OOM'd Janino in the element_at formulation, see Similarity)
    encodeWith(df, idCol, vecCol, meta, coarse, cents)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$dir/codes")
    val prev = readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(s"marker vanished at $dir"))
    writeMarker(spark, dir, prev + s"\n+append[$fingerprint]")
  }

  /** Tombstone ids out of the index: queued in a skinny `deletes/`
    * table that [[search]] anti-joins on the fly, physically folded in
    * by [[compactSegment]] (rewrites the codes table without them) or
    * by the next full [[build]]. The marker gains a `+delete[n]` line,
    * so the `ensureBuilt*` single-corpus freshness checks correctly
    * see a mutated index as stale. This is how a dedup pipeline that
    * REMOVES documents maintains the index between rebuilds — an
    * append-only lifecycle would serve ghosts.
    */
  def delete(spark: SparkSession, dir: String, ids: DataFrame): Unit =
    withLease(spark, dir) { doDelete(spark, dir, ids) }

  private def doDelete(spark: SparkSession, dir: String,
      ids: DataFrame): Unit = {
    val prev = readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed ANN index at $dir — nothing to delete from"))
    // materialize the ids ONCE: a non-deterministic source (a sampled
    // frame, a limit without order) re-executed for the count could
    // record a marker count that differs from the written rows
    val skinny = ids.select(ids.columns.head).toDF("id")
      .select(col("id").cast("long").as("id"))
      .localCheckpoint(true)
    val n = skinny.count()
    // marker FIRST: a crash between the two steps leaves a marker that
    // no longer matches any pristine-corpus fingerprint, so ensureBuilt
    // forces a (spurious but safe) rebuild — the reverse order would
    // leave a mutated index under a fresh-looking marker, silently
    // serving with rows missing
    writeMarker(spark, dir, prev + s"\n+delete[$n]")
    skinny.write.mode("append").parquet(s"$dir/deletes")
  }

  def delete(spark: SparkSession, dir: String, ids: Seq[Long]): Unit = {
    import spark.implicits._
    delete(spark, dir, ids.toDF("id"))
  }

  /** One encoded code row per input vector, using the FROZEN
    * quantizers of the committed index at `dir` — shared by the batch
    * [[append]] path and the streaming ingest, so the two can never
    * drift. Pure map-side projection: the codebooks ride inside the
    * PqBestCodes codegen reference, cell assignment is nCells dot
    * products per row, no shuffle, no state.
    */
  private def encodeWith(df: DataFrame, idCol: String, vecCol: String,
      meta: Meta, coarse: Seq[Seq[Float]],
      cents: Map[(Int, Int), Seq[Int]]): DataFrame = {
    val withA = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).as("__v"),
      transform(col(vecCol).cast("array<double>"),
        x => round(x * 127.0 / meta.scale).cast("int")).as("a"))
    val aD = col("a").cast("array<double>")
    withA.select(col("id"),
      Similarity.dot(df, aD, aD).cast("long").as("naa"),
      Similarity.pqBestCol(withA, cents, meta.m, meta.nCentroids,
        meta.sub).as("bc"),
      cellCol(df, col("__v"), coarse, meta.hier).as("cell"))
  }

  /** Cell assignment shared by BUILD, batch APPEND and STREAMING
    * ingest — all three read the hierarchy choice from the same place
    * (the build param, persisted in meta/ as `hier`), so an appended
    * or streamed vector's cell is bit-identical to what a full
    * rebuild would assign (pinned in AnnIndexSpec). `hier` <= 0 is
    * the flat top-1 ranking (`Similarity.ivfCell` — nCells codegen'd
    * dots per row); `hier` > 0 ranks only the children of the row's
    * top-`hier` super-cells ([[hierCellCol]]) — the O(hier·√nCells)
    * route for the nCells ∝ N regime where the flat projection is
    * both O(nCells)/row and Janino-uncompilable (r14 addendum).
    */
  private def cellCol(df: DataFrame, vec: Column,
      coarse: Seq[Seq[Float]], hier: Int): Column =
    if (hier <= 0) Similarity.ivfCell(df, vec, coarse)
    else hierCellCol(df, vec, coarse, hier)

  /** MAP-SIDE two-level cell assignment (top-1 of the chosen supers'
    * children): the super ranking is the same codegen'd √nCells-wide
    * struct sort as [[probeCells]]'s hierarchical path, and the child
    * ranking runs over the chosen supers' children as literal DATA
    * (array-of-arrays of (cell, centroid) structs indexed by super)
    * through higher-order functions — interpreted, but over
    * hier·√nCells elements per row, and with NO shuffle and NO
    * per-cell codegen width, which is what the streaming ingest path
    * requires (a per-id rank window is unsupported on streams and the
    * flat projection stops compiling in the thousands of cells).
    * Same dot arithmetic ([[graft.functions.DotDouble]], strict left
    * fold) and the same (dot DESC, cell ASC) tie-break as every other
    * assignment path.
    */
  private[graft] def hierCellCol(df: DataFrame, vec: Column,
      coarse: Seq[Seq[Float]], sp: Int): Column = {
    val nSuper = superCount(coarse.size)
    // child -> super via childAssignments — EXACTLY probeCells'
    // driver-side rule, so a probe-side hierarchy and an encode-side
    // hierarchy agree on the tree
    val childrenBySuper: Map[Int, Seq[Int]] =
      childAssignments(coarse).groupBy(_._1).view
        .mapValues(_.map(_._2)).toMap
    val chosen = topSupersCol(df, vec, coarse, sp)
    val childType = "array<struct<c:int,cv:array<double>>>"
    val childrenLit = array((0 until nSuper).map { s =>
      val kids = childrenBySuper.getOrElse(s, Nil)
      if (kids.isEmpty) array().cast(childType)
      else array(kids.map { c =>
        struct(lit(c).as("c"),
          array(coarse(c).map(x => lit(x.toDouble)): _*).as("cv"))
      }: _*).cast(childType)
    }: _*)
    val cands = flatten(transform(chosen,
      s => element_at(childrenLit, s + 1)))
    val best = array_min(transform(cands, ch =>
      struct((-Similarity.dot(df, vec, ch("cv"))).as("d"),
        ch("c").as("c"))))
    best("c").cast("int")
  }

  /** STREAMING index ingest — the online half of the lifecycle:
    * arriving vectors are encoded map-side with the committed index's
    * frozen quantizers and appended, exactly-once (the parquet sink's
    * metadata log dedups replayed micro-batches — spec'd in
    * StreamingOpsSpec), into a `codes_stream/` SEGMENT beside the base
    * codes table. A separate segment because a FileStreamSink log in
    * the base directory would hide the batch-written files from
    * readers; [[search]] unions the segment in when present (both
    * sides stay partition-pruned on `cell`). A full [[build]] retires
    * the segment — its rows were encoded with the previous quantizers.
    * No state store, no shuffle, no training on the hot path: this is
    * the Vespa/Milvus "memory segment + base segment" shape on plain
    * parquet.
    */
  def ingestStream(stream: DataFrame, idCol: String, vecCol: String,
      dir: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // The ingest is a WRITER, so it participates in the single-writer
    // protocol: it holds the maintenance lease for the query's whole
    // lifetime — a concurrent build/compact fail-fasts instead of
    // deleting the segment under the live sink — and stamps a
    // `+ingest` marker line up front so ensureBuilt freshness checks
    // see the mutation (at START: an empty ingest merely looks stale —
    // spurious-but-safe rebuild). The lease releases within ~1 s of
    // the query terminating; a crashed driver leaves it for
    // [[breakLease]].
    val spark = stream.sparkSession
    val (meta, coarse, cents) = load(spark, dir)
    IndexFs.withStreamLease(spark, dir, Lease, "ANN index") {
      val prev = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(s"marker vanished at $dir"))
      writeMarker(spark, dir, prev + "\n+ingest")
      encodeWith(stream, idCol, vecCol, meta, coarse, cents)
        .writeStream.format("parquet")
        .option("path", s"$dir/codes_stream")
        .option("checkpointLocation", checkpoint)
        .partitionBy("cell")
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

  /** Offline maintenance: fold the streaming segment's rows into the
    * base codes table and retire the segment — the "seal the memory
    * segment" step between ingest and the next full rebuild. Rows are
    * MOVED verbatim (same quantizers encoded them, so no re-encode);
    * reads through [[search]] are identical before and after, the
    * segment's sink metadata log goes with it, and the next
    * [[ingestStream]] needs a FRESH checkpoint (the old one's sink
    * log was retired with the segment). Stop any running ingest
    * stream first — compacting under a live writer would race its
    * uncommitted files.
    *
    * When tombstones ([[delete]]) are queued, compaction additionally
    * REWRITES the codes table without the deleted ids and clears
    * `deletes/` — the physical fold. That path costs a full
    * codes-table rewrite (the codes are m bytes/vector — cheap
    * relative to the corpus) staged through `codes_tmp` + rename,
    * with the marker lifted during the swap so a crash mid-swap
    * leaves an unreadable-by-construction index instead of a
    * half-swapped one. Served results are identical before and after
    * (search already anti-joined the queue).
    *
    * @return rows moved from the segment (0 when only tombstones
    *         were folded)
    */
  def compactSegment(spark: SparkSession, dir: String): Long =
    withLease(spark, dir) { doCompactSegment(spark, dir) }

  private def doCompactSegment(spark: SparkSession, dir: String): Long = {
    val fs = hfs(spark, dir)
    val segPath = hpath(dir, "codes_stream")
    val delPath = hpath(dir, "deletes")
    val hasSeg = fs.exists(segPath)
    val hasDel = fs.exists(delPath)
    if (!hasSeg && !hasDel) return 0L
    val marker = readMarker(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no committed ANN index at $dir"))
    // Marker LIFTED across the WHOLE fold (r17 fault sweep): the
    // segment fold is an APPEND to codes/ plus a segment delete — a
    // crash between the two used to leave the folded rows in BOTH
    // places, and load()'s segment union would serve them twice under
    // a still-valid marker. Markerless, every crash window inside the
    // fold reads as "no committed index" (load refuses, ensureBuilt
    // rebuilds) — the family's fail-closed discipline; the marker
    // text is rewritten VERBATIM at the end, so generation guards
    // observe the same digest across a completed compaction.
    fs.delete(hpath(dir, Marker), false)
    IndexFs.fail("ann.compact.unmarked")
    val segN = if (!hasSeg) 0L else {
      val seg = spark.read.parquet(s"$dir/codes_stream")
        .select("id", "naa", "bc", "cell")
        // materialize BEFORE touching the segment dir; bounded by the
        // segment (recent arrivals), not the corpus
        .localCheckpoint(true)
      val n = seg.count()
      seg.write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
      IndexFs.fail("ann.compact.segfolded")
      fs.delete(segPath, true)
      n
    }
    if (hasDel) {
      val kept = spark.read.parquet(s"$dir/codes")
        .join(spark.read.parquet(s"$dir/deletes"), Seq("id"),
          "left_anti")
      kept.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/codes_tmp")
      IndexFs.fail("ann.compact.staged")
      fs.delete(hpath(dir, "codes"), true)
      if (!fs.rename(hpath(dir, "codes_tmp"), hpath(dir, "codes")))
        throw new java.io.IOException(
          s"could not swap compacted codes table at $dir")
      fs.delete(delPath, true)
    }
    IndexFs.fail("ann.compact.swapped")
    writeMarker(spark, dir, marker)
    segN
  }

  /** Idempotent two-step lifecycle: a base build plus ONE append of
    * `extra`, re-run from scratch only when params or the corpus
    * fingerprint changed (the composed marker encodes both steps, so
    * a repeat invocation with a warm index does nothing — no
    * retraining AND no duplicate append). Returns true iff it built.
    */
  def ensureBuiltWithAppend(base: DataFrame, extra: DataFrame,
      idCol: String, vecCol: String, dir: String, nCells: Int = 16,
      m: Int = 8, nCentroids: Int = 16, iters: Int = 3,
      fingerprint: String = "", hier: Int = 0): Boolean = {
    val want = markerText(nCells, m, nCentroids, hier, fingerprint) +
      s"\n+append[$fingerprint]"
    val fresh = readMarker(base.sparkSession, dir).contains(want)
    if (!fresh) {
      build(base, idCol, vecCol, dir, nCells, m, nCentroids, iters,
        fingerprint, hier)
      append(extra, idCol, vecCol, dir, fingerprint)
    }
    !fresh
  }

  /** Bounded side tables of a committed index: meta row, coarse
    * centroids (by cell id), PQ codebooks (by (sm, c)).
    */
  def load(spark: SparkSession, dir: String)
      : (Meta, Seq[Seq[Float]], Map[(Int, Int), Seq[Int]]) = {
    require(hfs(spark, dir).exists(hpath(dir, Marker)),
      s"no committed ANN index at $dir (missing $Marker — " +
        "build() did not finish?)")
    // the three bounded side-table reads are independent — run them
    // CONCURRENTLY (guide §2.6: actions are only sequential because
    // the driver calls them sequentially); serving paths call load()
    // on every invocation, and three serial ~100 ms action round-trips
    // were pure driver latency (r18)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.DurationInt
    val fMeta = Future {
      spark.read.parquet(s"$dir/meta")
        .select("version", "n_cells", "m", "n_centroids", "sub",
          "scale", "hier")
        .head()
    }
    val fCoarse = Future {
      spark.read.parquet(s"$dir/coarse").collect()
    }
    val fCents = Future {
      spark.read.parquet(s"$dir/codebooks").collect()
    }
    val m = Await.result(fMeta, 600.seconds)
    require(m.getInt(0) == FormatVersion,
      s"ANN index format ${m.getInt(0)} != supported $FormatVersion")
    val meta = Meta(m.getInt(1), m.getInt(2), m.getInt(3), m.getInt(4),
      m.getDouble(5), m.getInt(6))
    val coarse = Await.result(fCoarse, 600.seconds)
      .map(r => r.getInt(0) -> r.getSeq[Float](1))
      .sortBy(_._1).map(_._2.toSeq).toSeq
    val cents = Await.result(fCents, 600.seconds)
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Int](2).toSeq)
      .toMap
    require(coarse.size == meta.nCells &&
      cents.size == meta.m * meta.nCentroids,
      s"index side tables truncated: ${coarse.size} cells, " +
        s"${cents.size} codebook rows")
    (meta, coarse, cents)
  }

  /** The logical codes table every serve path reads: base codes, the
    * streaming segment unioned in when present, queued tombstones
    * anti-joined away. A `cell` filter composed on top pushes through
    * the union into both pruned scans.
    */
  private def codesTable(spark: SparkSession, dir: String): DataFrame = {
    val fs = hfs(spark, dir)
    val base = spark.read.parquet(s"$dir/codes")
    val unioned = if (fs.exists(hpath(dir, "codes_stream")))
        base.unionByName(spark.read.parquet(s"$dir/codes_stream")
          .select("id", "naa", "bc", "cell"))
      else base
    if (!fs.exists(hpath(dir, "deletes"))) unioned
    else unioned.join(spark.read.parquet(s"$dir/deletes"),
      Seq("id"), "left_anti")
  }

  /** ANN-assisted near-duplicate pairs — the 100 TB route for the
    * low-threshold `dedup_embed` regime, where sign-LSH banding
    * cannot prune (at cosine ≥ 0.45 the banding S-curve passes almost
    * everything, so `cosinePairsLsh` degenerates toward all-pairs —
    * measured 25× at 10× data in BENCH_SF1.md). Candidate generation
    * is CONFINED to the persisted index's coarse cells instead:
    *
    *   - the index contributes its TRAINED quantizer (bounded coarse
    *     side table), its staleness lifecycle, and its tombstones;
    *   - each corpus vector is assigned to its top-`probes` cells
    *     with one map-side projection (the same dot ranking as the
    *     index quantizer, ties to the smaller cell);
    *   - candidates are PROBE↔PROBE co-occurrences within a cell
    *     (multi-probe on BOTH sides: a pair straddling a cell
    *     boundary is caught when both merely REACH the cell between
    *     them — probe×home missed those, measured 0.33 recall at
    *     sf1.0 vs 0.52 for probe×probe at the same probes=4);
    *   - work is Σ_cell |probers_c|² ≈ probes²·cellSize·N — LINEAR
    *     in N at fixed probes when cells are capacity-bounded
    *     (production scales nCells with the corpus — the SemDeDup
    *     posture; the dedup_embed_ann query builds with
    *     nCells = max(16, N/125));
    *   - exact cosine verifies candidates only.
    *
    * Approximate BY DESIGN: a true pair whose two sides never probe a
    * common cell is missed. `probes` is the recall/work knob —
    * measured at sf1.0 against brute force (tools/PairRecall):
    * p=4 → 0.52 recall / 11 s, p=6 → 0.75 / 25 s, p=8 → 0.89 / 33 s
    * (BEATING the sign-LSH leg's 0.87 / 52 s on both axes), p=12 →
    * 0.98 / 148 s; precision is always 1.0 (exact verify). The
    * oracle-checked query pins p=4 (keeps the SQL replay tractable);
    * production picks p per its recall target and audits with
    * PairRecall. Deterministic → exact SQL oracle.
    *
    * Cell ASSIGNMENT optionally runs a TWO-LEVEL coarse quantizer
    * (`superProbes` > 0): with the production rule nCells ∝ N, flat
    * assignment evaluates nCells dot products per row — O(N) per row,
    * quadratic total, and an nCells-wide codegen expression (Janino
    * caps that in the thousands of cells). The hierarchy is built
    * over the SAME trained centroid list: the first ceil(sqrt(nCells))
    * centroids double as super-cells, every centroid is assigned to
    * its max-dot super (ties to the smaller super id, driver-side —
    * bounded), and a row ranks only the CHILDREN of its
    * top-`superProbes` supers (top-`probes` of that union by dot
    * DESC, cell ASC). Per-row work drops to superProbes·√nCells dots
    * = O(√N); the plan stays narrow at any nCells (the child table is
    * broadcast DATA, not literal code), at the cost of one skinny
    * id-keyed exchange for the per-row top-`probes` rank.
    *
    * `superProbes` is a second recall knob of the same approximate-
    * by-design kind as `probes` (a top cell whose super was not
    * probed is missed); superProbes = 0 keeps the exact flat ranking,
    * and superProbes ≥ nSuper is EXACTLY the flat ranking by
    * construction (the union of all supers' children is all cells).
    * MEASURED at sf1.0 (nCells=160, tools/PairRecall r14): p8 recall
    * 0.765@sp3 / 0.808@sp4 / 0.839@sp6 / 0.862@sp8 vs flat 0.887,
    * with the hierarchy's fixed stage costs still exceeding 160
    * map-side dots — so below ~10³ cells flat wins on BOTH axes and
    * the default stays 0; the hierarchy is the nCells ≫ 10³ route
    * where the flat projection is both O(nCells)/row and
    * uncompilable. AnnIndexSpec pins confinement (candidates never
    * leave the chosen supers' children), sp ≥ nSuper == flat, and
    * hierarchical == flat pairs at p=4/sp=3 on the spec corpus.
    *
    * @return (id_a, id_b, cos) with id_a < id_b, cos ≥ threshold
    */
  def cosinePairsIndexed(corpus: DataFrame, idCol: String,
      vecCol: String, dir: String, threshold: Double,
      probes: Int = 4, superProbes: Int = 0,
      pre: Option[(Meta, Seq[Seq[Float]], Map[(Int, Int), Seq[Int]])] =
        None): DataFrame = {
    val spark = corpus.sparkSession
    // a caller that already loaded the index's bounded side tables for
    // THIS query execution passes them through — never a cross-run
    // cache, just plumbing (r18, VERDICT r17 #1)
    val (meta, coarse, cents) = pre.getOrElse(load(spark, dir))
    // tombstones are authoritative on BOTH sides: the home side via
    // codesTable, the probe/verify side via normalized()
    val n = normalized(corpus, idCol, vecCol, dir)
    // the probe frame feeds a self-join (two consumers): the flat
    // assignment recomputes cheaply from the checkpointed n, but the
    // hierarchical one would redo its join + window — materialize it
    val probe0 = probeCells(n, coarse, probes, superProbes)
    val probe =
      if (superProbes <= 0) probe0 else probe0.localCheckpoint(false)
    // pin the probe x probe co-occurrence join at work width: its
    // input is skinny (id, cell) rows — byte-based AQE coalescing
    // collapses it to one task — but the join fans out the quadratic
    // candidate generation (measured 1.1 s single-task at sf0.1)
    val wp = ScanSpread.workParts(probe)
    // documented opt-out (spark.graft.ann.minCellDedup=false) restores
    // the r17 repartition+distinct pair dedup for A/B and plan pinning
    val minCell = !spark.conf
      .getOption("spark.graft.ann.minCellDedup")
      .exists(_.equalsIgnoreCase("false"))
    val cand =
      if (superProbes <= 0 && minCell) {
        // FLAT path (r18): de-duplicate pairs STRUCTURALLY instead of
        // with a distinct — each side carries its full probe-cell
        // array (a few ints) and a co-occurrence survives only in the
        // pair's MINIMAL shared cell, so every pair is emitted exactly
        // once. Replaces the ~probes²·cellSize·N-row exchange + hash
        // dedup (measured 1.25 s at sf0.1) with a map-side
        // array_intersect per co-occurrence inside the already-pinned
        // join stage. Identical pair set to .distinct() by
        // construction: a pair sharing k >= 1 cells matches the filter
        // for exactly the smallest of them.
        val withSet = n.select(col("id"),
          flatProbeCellsCol(n, col("v"), coarse, probes).as("__cells"))
        val probeF = withSet.select(col("id"), col("__cells"),
          explode(col("__cells")).as("cell"))
        probeF
          .repartition(wp, col("cell"))
          .join(probeF.select(col("id").as("id2"),
            col("__cells").as("__cells2"), col("cell")), "cell")
          .filter(col("id") < col("id2") &&
            col("cell") === array_min(
              array_intersect(col("__cells"), col("__cells2"))))
          .select(col("id").as("id_a"), col("id2").as("id_b"))
      } else {
        // hierarchical path: the probe assignment already cost a join
        // + window, keep the r17 shape (pinned pair-dedup exchange)
        probe.select(col("id"), col("cell"))
          .repartition(wp, col("cell"))
          .join(probe.select(col("id").as("id2"), col("cell")), "cell")
          .filter(col("id") < col("id2"))
          .select(col("id").as("id_a"), col("id2").as("id_b"))
          .repartition(wp, col("id_a"), col("id_b"))
          .distinct()
      }
    cand
      .join(n.select(col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na")), "id_a")
      .join(n.select(col("id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        (Similarity.dot(corpus, col("va"), col("vb")) /
          (col("na") * col("nb"))).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** The (id, cell, v) probe assignment of [[cosinePairsIndexed]] over
    * a frame with columns (id, v): flat top-`probes` ranking when
    * `superProbes` <= 0, the two-level hierarchy otherwise. Carries
    * the row's vector through (free — the hierarchical window already
    * shuffles it), so [[searchBatchDist]]'s hierarchical probe path
    * can reuse THIS code verbatim rather than re-derive it.
    * Package-visible so AnnIndexSpec can pin confinement (hierarchical
    * probes never leave the chosen supers' children) and the
    * flat == hierarchical equality at the battery operating point.
    */
  private[graft] def probeCells(n: DataFrame, coarse: Seq[Seq[Float]],
      probes: Int, superProbes: Int): DataFrame = {
    val spark = n.sparkSession
    if (superProbes <= 0) {
      n.select(col("id"),
        explode(flatProbeCellsCol(n, col("v"), coarse, probes))
          .as("cell"), col("v"))
    } else {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      // child -> super: max-dot super per centroid, ties to the
      // smaller super id; driver-side over the bounded centroid list
      // (the same left fold as the SQL replay — bit-identical doubles)
      val childDf = childAssignments(coarse).toDF("__sup", "cell", "__cv")
      // top-`superProbes` supers per row: a √nCells-wide struct sort
      val psup = topSupersCol(n, col("v"), coarse, superProbes)
      val byId = Window.partitionBy("id")
        .orderBy(desc("__d"), col("cell"))
      // pin the rank window's exchange at work width (guide §2.5 via
      // ScanSpread.workParts): its input is skinny (id, cell, dot)
      // rows that AQE's byte-based coalescing collapses to ONE task,
      // but upstream sits a per-row superProbes x children dot fan-out
      // and downstream the probe x probe candidate join — measured
      // 1.17 s single-task for dedup_embed_ann_2level at sf0.1
      n.select(col("id"), col("v"), explode(psup).as("__sup"))
        .join(broadcast(childDf), "__sup")
        .select(col("id"), col("cell"), col("v"),
          Similarity.dot(n, col("v"), col("__cv")).as("__d"))
        .repartition(ScanSpread.workParts(n), col("id"))
        .withColumn("__rn", row_number().over(byId))
        .filter(col("__rn") <= probes)
        .select(col("id"), col("cell"), col("v"))
    }
  }

  /** Driver-side child→super assignment of the two-level hierarchy:
    * one (super, cell, centroid-as-doubles) row per trained centroid,
    * max-dot super per centroid with ties to the smaller super id —
    * the ONE tree every hierarchical path (encode, pair-mining probe,
    * distributed batch serve) derives from.
    */
  private def childAssignments(coarse: Seq[Seq[Float]])
      : Seq[(Int, Int, Seq[Double])] = {
    val supers = coarse.take(superCount(coarse.size))
    def sdot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).foldLeft(0.0)((acc, p) =>
        acc + p._1.toDouble * p._2.toDouble)
    coarse.zipWithIndex.map { case (cv, c) =>
      val sup = supers.zipWithIndex
        .map { case (sv, s) => (sdot(cv, sv), s) }
        .sortBy { case (d, s) => (-d, s) }.head._2
      (sup, c, cv.map(_.toDouble))
    }
  }

  /** The row's top-`sp` super-cells as one map-side column — the
    * √nCells-wide struct sort shared by every hierarchical ranking
    * (same dot arithmetic and (dot DESC, super ASC) tie-break).
    */
  private def topSupersCol(df: DataFrame, vec: Column,
      coarse: Seq[Seq[Float]], sp: Int): Column = {
    val supers = coarse.take(superCount(coarse.size))
    val ssorted = array_sort(array(supers.zipWithIndex.map {
      case (sv, s) =>
        val sl = array(sv.map(x => lit(x.toDouble)): _*)
        struct((-Similarity.dot(df, vec, sl)).as("d"), lit(s).as("s"))
    }: _*))
    transform(slice(ssorted, 1, sp), x => x("s"))
  }

  /** The flat top-`probes` probe-cell ARRAY as one map-side column:
    * rank (dot DESC, cell ASC) via an ascending struct sort on
    * (-dot, cell). Shared by [[probeCells]] (the batch pair-mining
    * assignment) and `StreamingOps.annGate`'s per-row stream
    * assignment, so the gate probes exactly the cells batch mining
    * would — the map-side-signature-sharing discipline of
    * `nearDupGate`. Pure projection: no shuffle, no state,
    * streaming-safe.
    */
  private[graft] def flatProbeCellsCol(df: DataFrame, vec: Column,
      coarse: Seq[Seq[Float]], probes: Int): Column = {
    val sorted = array_sort(array(coarse.zipWithIndex.map {
      case (c, j) =>
        val cl = array(c.map(x => lit(x.toDouble)): _*)
        struct((-Similarity.dot(df, vec, cl)).as("d"),
          lit(j).as("c"))
    }: _*))
    transform(slice(sorted, 1, probes), s => s("c"))
  }

  /** The committed index's probe-cell corpus table — (cell, id, v,
    * nrm) with one row per (probed cell, vector), tombstones applied:
    * the STATIC side of `StreamingOps.annGate` (the `corpusBandBuckets`
    * role, for embeddings). Derived from the corpus the index was
    * built over with the index's OWN frozen centroids, so the gate's
    * candidate rule is exactly [[cosinePairsIndexed]]'s probe×probe
    * co-occurrence; refresh on the index's rebuild/compaction cadence.
    * ~`probes`× the corpus vector bytes at rest — bounded replication,
    * cell-partitionable.
    */
  def cellTable(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, probes: Int = 4, superProbes: Int = 0,
      pre: Option[(Meta, Seq[Seq[Float]], Map[(Int, Int), Seq[Int]])] =
        None): DataFrame = {
    val spark = corpus.sparkSession
    val (_, coarse, _) = pre.getOrElse(load(spark, dir))
    val n = normalized(corpus, idCol, vecCol, dir)
    probeCells(n, coarse, probes, superProbes)
      .select(col("id"), col("cell"))
      .join(n, "id")
      .select(col("cell"), col("id"), col("v"), col("nrm"))
  }

  /** The (id, v, nrm) view of `corpus` with queued tombstones
    * anti-joined away — tombstones are authoritative on the
    * probe/verify side too (the corpus argument may be a snapshot
    * that still contains deleted ids). Shared by
    * [[cosinePairsIndexed]] and [[cellTable]].
    */
  private def normalized(corpus: DataFrame, idCol: String,
      vecCol: String, dir: String): DataFrame = {
    val spark = corpus.sparkSession
    // spread before the norm projection AND the checkpoint: the
    // checkpoint pins the partitioning, so a 1-split scan otherwise
    // single-tasks every downstream probe/verify leg (ScanSpread)
    val csp = ScanSpread.spread(corpus)
    val nAll = csp.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"),
        Similarity.l2norm(csp, col(vecCol)).as("nrm"))
    (if (!hfs(spark, dir).exists(hpath(dir, "deletes"))) nAll
     else nAll.join(spark.read.parquet(s"$dir/deletes"),
       Seq("id"), "left_anti"))
      .localCheckpoint(false)
  }

  /** Super-cell count of the two-level hierarchy: ceil(sqrt(nCells))
    * — IEEE-exact cross-engine at integer points, matching the SQL
    * replay's `CAST(ceil(sqrt(nc)) AS BIGINT)`.
    */
  private[graft] def superCount(nCells: Int): Int =
    math.ceil(math.sqrt(nCells.toDouble)).toInt

  /** Serve a top-k query from the persisted index: probed-cell
    * partition-pruned ADC scan + exact rescore. Hash-identical to
    * `Similarity.ivfPqTopK(df, ..., nCells, probes, m, nCentroids,
    * k, nCand)` over the same corpus — same probe pick (max driver
    * dot, index tie-break), same fixed-order integer-codebook qdot
    * sums, same (score desc, id) shortlist, same rescore.
    */
  def search(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, query: Seq[Float], probes: Int = 2, k: Int = 10,
      nCand: Int = 80): DataFrame = {
    val spark = corpus.sparkSession
    val (meta, coarse, cents) = load(spark, dir)
    require(query.length == meta.m * meta.sub,
      s"query dim ${query.length} != index dim ${meta.m * meta.sub}")
    val qd = query.map(_.toDouble)
    def sdot(c: Seq[Float]): Double =
      qd.zip(c).foldLeft(0.0)((acc, p) => acc + p._1 * p._2.toDouble)
    val probeCells = coarse.zipWithIndex
      .map { case (c, j) => (sdot(c), j) }
      .sortBy { case (d, j) => (-d, j) }.take(probes).map(_._2)
    // cell is the PARTITION column of codes/ — this filter prunes to
    // `probes` directories before any row is read (pinned in spec).
    // A streaming segment (ingestStream) unions in when present; the
    // filter pushes through the union, so both sides stay pruned.
    // Queued tombstones (delete/) anti-join the pruned scan — skinny
    // id list, AQE broadcasts it; compactSegment folds it physically.
    val codes = codesTable(spark, dir)
      .filter(col("cell").isin(probeCells: _*))
    val qdotArr: Int => Column = sm =>
      array((0 until meta.nCentroids).map { c =>
        val cent = cents((sm, c))
        val qm = qd.slice(sm * meta.sub, (sm + 1) * meta.sub)
        lit(qm.zip(cent).foldLeft(0.0)((acc, p) => acc + p._1 * p._2))
      }: _*)
    val qsum = (0 until meta.m).map(sm =>
      element_at(qdotArr(sm), element_at(col("bc"), sm + 1) + 1))
      .reduce(_ + _)
    val cand = codes
      .select(col("id").as(idCol),
        when(col("naa") === 0L, lit(0.0))
          .otherwise(qsum / sqrt(col("naa").cast("double")))
          .as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(nCand)
      .select(col(idCol))
    val qlit = array(query.map(x => lit(x.toDouble)): _*)
    corpus.join(broadcast(cand), idCol)
      .select(col(idCol),
        (Similarity.dot(corpus, col(vecCol), qlit) /
          (Similarity.l2norm(corpus, col(vecCol)) *
            Similarity.l2norm(corpus, qlit))).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** BATCH serve: answer a TABLE of queries in ONE pass over the
    * index — per-query results HASH-IDENTICAL to [[search]] (pinned
    * in AnnIndexSpec). [[search]] plans per query; production serving
    * answers its whole query batch with one partition-pruned codes
    * scan and one corpus rescore scan, whatever the batch size.
    *
    * Shape: the query batch is driver-materialized (it IS the serve
    * batch — bounded by contract; shard huge query tables into
    * batches). Probe cells and the per-(query, subspace) codebook dot
    * tables are computed with EXACTLY the per-query driver arithmetic
    * — same fold order, bit-identical doubles — and shipped as one
    * broadcast probe table of |Q|·probes rows. Driver-materializing
    * the batch is also what makes STATIC partition pruning possible:
    * the union of probed cells (≤ nCells values, whatever |Q|) goes
    * into the scan filter before any row is read. ADC scoring is the
    * pruned codes scan broadcast-joined to the probe table; per-query
    * shortlists and final top-k are qid-partitioned windows (two
    * bounded exchanges keyed by qid). Tombstones and the streaming
    * segment compose exactly like [[search]].
    *
    * @return (qid, idCol, score) — top-k per query, rank order
    */
  def searchBatch(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, queries: DataFrame, qidCol: String, qvecCol: String,
      probes: Int = 2, k: Int = 10, nCand: Int = 80): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (meta, coarse, cents) = load(spark, dir)
    val qrows = queries
      .select(col(qidCol).cast("long"), col(qvecCol))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
      .toSeq
    require(qrows.nonEmpty, "empty query batch")
    // two rows sharing a qid would merge their candidates under one
    // window partition — a silently-wrong single result set instead of
    // two; the batch is already driver-materialized, so the check is free
    locally {
      val dups = qrows.groupBy(_._1).filter(_._2.length > 1).keys
      require(dups.isEmpty,
        s"duplicate qids in query batch: ${dups.toSeq.sorted.take(5).mkString(", ")}")
    }
    qrows.foreach { case (qid, q) =>
      require(q.length == meta.m * meta.sub,
        s"query $qid dim ${q.length} != index dim ${meta.m * meta.sub}")
    }
    // per query: probe cells + the m×nCentroids qdot table, via the
    // SAME driver folds as search() — bit-identical by construction
    val probeRows = qrows.flatMap { case (qid, q) =>
      val qd = q.map(_.toDouble)
      def sdot(c: Seq[Float]): Double =
        qd.zip(c).foldLeft(0.0)((acc, p) => acc + p._1 * p._2.toDouble)
      val probeCells = coarse.zipWithIndex
        .map { case (c, j) => (sdot(c), j) }
        .sortBy { case (d, j) => (-d, j) }.take(probes).map(_._2)
      val qdots: Seq[Seq[Double]] = (0 until meta.m).map { sm =>
        (0 until meta.nCentroids).map { c =>
          val cent = cents((sm, c))
          val qm = qd.slice(sm * meta.sub, (sm + 1) * meta.sub)
          qm.zip(cent).foldLeft(0.0)((acc, p) => acc + p._1 * p._2)
        }
      }
      probeCells.map(cell => (qid, cell, qdots))
    }
    val probeDf = probeRows.toDF("__qid", "cell", "__qd")
    val allCells = probeRows.map(_._2).distinct
    // ONE pruned codes scan for the whole batch (union of probed
    // cells, ≤ nCells partitions); segment + tombstones as in search
    val codes = codesTable(spark, dir)
      .filter(col("cell").isin(allCells: _*))
    val qsum = (0 until meta.m).map(sm =>
      element_at(element_at(col("__qd"), sm + 1),
        element_at(col("bc"), sm + 1) + 1))
      .reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val byQ = Window.partitionBy("__qid")
      .orderBy(desc("score"), col(idCol))
    val cand = codes
      .join(broadcast(probeDf), "cell")
      .select(col("__qid"), col("id").as(idCol),
        when(col("naa") === 0L, lit(0.0))
          .otherwise(qsum / sqrt(col("naa").cast("double")))
          .as("score"))
      .withColumn("__rn", row_number().over(byQ))
      .filter(col("__rn") <= nCand)
      .select(col("__qid"), col(idCol))
    val qvDf = qrows.map { case (qid, q) => (qid, q.map(_.toDouble)) }
      .toDF("__qid", "__qv")
    val rescoreByQ = Window.partitionBy("__qid")
      .orderBy(desc("score"), col(idCol))
    corpus.join(broadcast(cand), idCol)
      .join(broadcast(qvDf), "__qid")
      .select(col("__qid"), col(idCol),
        (Similarity.dot(corpus, col(vecCol), col("__qv")) /
          (Similarity.l2norm(corpus, col(vecCol)) *
            Similarity.l2norm(corpus, col("__qv")))).as("score"))
      .withColumn("__rn", row_number().over(rescoreByQ))
      .filter(col("__rn") <= k)
      .select(col("__qid").as("qid"), col(idCol), col("score"))
  }

  /** DISTRIBUTED batch serve — [[searchBatch]] without the
    * driver-materialized query table, for UNBOUNDED query tables
    * ("join every document to its neighbors"). The query frame stays
    * a distributed scan end to end (pinned in AnnIndexSpec: the
    * executed plan reads the queries source, no collect):
    *
    *   - probe cells per query: on a FLAT index (meta.hier = 0) the
    *     bounded coarse table (nCells rows) is BROADCAST and
    *     cross-joined to the queries; a qid-keyed window keeps the
    *     top-`probes` cells by (dot DESC, cell ASC) — the same rank
    *     [[search]] computes on the driver, now as a plan. On a
    *     hier>0 index the selection routes through [[probeCells]]'
    *     super→children hierarchy instead (sp = meta.hier):
    *     O(hier·√nCells) candidate rows per query in place of the
    *     nCells-row cross product — the scale shape for the
    *     nCells ∝ N regime, equal to flat when hier >= nSuper and the
    *     cosinePairsIndexed superProbes recall knob below it (the
    *     driver-bounded [[search]]/[[searchBatch]] keep the exact
    *     flat rank: their nCells work is driver-side and bounded);
    *   - the codes scan is semi-joined on the DISTINCT probed-cell
    *     set (≤ nCells values, whatever |Q|) — dynamic pruning of the
    *     cell-partitioned table replaces [[searchBatch]]'s static
    *     IN-list;
    *   - ADC scoring re-derives each (query, subspace) codebook dot
    *     ON THE FLY from the raw query vector and the LITERAL codebook
    *     (sub multiplies per term instead of a table lookup — the
    *     codebooks are index geometry, bounded, so they inline as
    *     codegen literals at any |Q|), with the same left folds and
    *     the same m-term sum order as [[searchBatch]]'s broadcast qdot
    *     table — results are row-identical (pinned);
    *   - shortlist and top-k are qid-partitioned windows, and every
    *     join carries only (qid, qvec) — dim doubles — through the
    *     fanout.
    *
    * Duplicate qids fail IN-PLAN (raise_error under a qid-count
    * window) — same contract as [[searchBatch]]'s driver check.
    * Trade-offs vs [[searchBatch]]: the probe rank costs one
    * |Q|·nCells cross product (broadcast, map-side) plus a qid
    * exchange, and the codes⋈probes join is planned by AQE (a small
    * batch broadcasts; a corpus-sized one shuffles on `cell`, whose
    * ≤ nCells distinct values SKEW). For that corpus-sized case pass
    * `salts` > 0: the codes side keeps a deterministic per-row salt
    * (`xxhash64(id) mod salts`) and the probe side is replicated
    * across all salts — the join key becomes (cell, salt), each
    * (code, probe) pair still matches at EXACTLY one salt (results
    * row-identical, pinned in spec), and a hot cell's work spreads
    * over `salts` tasks instead of one — the `join_skew_salted` /
    * `bucketJoinPairs` fan-out. Cost: the skinny probe rows ship
    * `salts`× . Use [[searchBatch]] when the batch is bounded and the
    * bit-exact static-pruning contract matters.
    *
    * @param superProbes serve-time probe-routing override (ADVICE
    *        r16): -1 (default) follows the build-time marker
    *        (`meta.hier`); 0 forces the EXACT flat distributed rank
    *        even on a hier index — affordable at small nCells, and
    *        row-identical to a flat index's serve; a positive value
    *        probes that many supers per query, the same recall knob
    *        as [[cosinePairsIndexed]]'s `superProbes`.
    */
  def searchBatchDist(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, queries: DataFrame, qidCol: String, qvecCol: String,
      probes: Int = 2, k: Int = 10, nCand: Int = 80,
      salts: Int = 0, superProbes: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (meta, coarse, cents) = load(spark, dir)
    val dim = meta.m * meta.sub
    val dupW = Window.partitionBy("__qid")
    val q0 = queries
      .select(col(qidCol).cast("long").as("__qid"),
        col(qvecCol).cast("array<double>").as("__qv"))
      .select(col("__qid"),
        when(count(lit(1)).over(dupW) > 1,
          raise_error(concat(lit("duplicate qid in query batch: "),
            col("__qid").cast("string"))))
          .otherwise(
            when(size(col("__qv")) =!= dim,
              raise_error(concat(lit(s"query dim != index dim $dim: "),
                col("__qid").cast("string"))))
              .otherwise(col("__qv"))).as("__qv"))
    // Probe-cell selection follows the MARKER-RECORDED hierarchy
    // (r16, closing the r15 flat-assignment seam): a flat index ranks
    // ALL nCells per query row (crossJoin + window — exact, but the
    // measured super-linear shape past ~1k cells, TwoLevelBench),
    // while a hier>0 index routes through probeCells' super→children
    // path VERBATIM — O(hier·√nCells) candidate rows per query, the
    // same tree build/append/ingest encode with, so probe cells at
    // probes=1 equal the encode cell (the encode-spec consistency).
    // Equal to the flat ranking by construction when hier >= nSuper;
    // below that it is the same approximate-by-design recall knob as
    // cosinePairsIndexed's superProbes (pinned in LayoutSpec).
    //
    // `superProbes` makes recall a SERVE-TIME knob like
    // cosinePairsIndexed's rather than frozen at build (ADVICE r16):
    // the default -1 follows the marker (meta.hier), 0 forces the
    // exact flat distributed rank even on a hier index (affordable at
    // small nCells), and a positive value widens/narrows the probed
    // supers per call.
    val sp = if (superProbes < 0) meta.hier else superProbes
    val byQd = Window.partitionBy("__qid")
      .orderBy(desc("__d"), col("cell"))
    val probeQ =
      if (sp <= 0) {
        val coarseDf = coarse.zipWithIndex
          .map { case (v, j) => (j, v.map(_.toDouble)) }
          .toDF("cell", "__cv")
        q0.crossJoin(broadcast(coarseDf))
          .select(col("__qid"), col("__qv"), col("cell"),
            Similarity.dot(corpus, col("__qv"), col("__cv")).as("__d"))
          .withColumn("__rn", row_number().over(byQd))
          .filter(col("__rn") <= probes)
          .select(col("__qid"), col("__qv"), col("cell"))
      } else
        probeCells(
            q0.select(col("__qid").as("id"), col("__qv").as("v")),
            coarse, probes, sp)
          .select(col("id").as("__qid"), col("v").as("__qv"),
            col("cell"))
    // dynamic pruning: the ≤ nCells distinct probed cells semi-join
    // the partition column of the codes scan
    val codes = codesTable(spark, dir)
      .join(probeQ.select("cell").distinct(), Seq("cell"), "left_semi")
    // ADC on the fly: qdot(sm, bc[sm]) = dot(qm_sm, cent(sm, bc[sm]))
    // with cent as a literal nCentroids x sub array per subspace —
    // fold order and the m-term sum order match searchBatch exactly
    val qsum = (0 until meta.m).map { sm =>
      val centLit = array((0 until meta.nCentroids).map { c =>
        array(cents((sm, c)).map(x => lit(x.toDouble)): _*)
      }: _*)
      Similarity.dot(corpus,
        slice(col("__qv"), sm * meta.sub + 1, meta.sub),
        element_at(centLit, element_at(col("bc"), sm + 1) + 1))
    }.reduce(_ + _)
    val byQ = Window.partitionBy("__qid")
      .orderBy(desc("score"), col(idCol))
    // salted fan-out for corpus-sized batches: ≤ nCells distinct join
    // keys skew; (cell, salt) spreads each cell over `salts` tasks
    val joined =
      if (salts <= 0) codes.join(probeQ, "cell")
      else codes
        .withColumn("__salt", pmod(xxhash64(col("id")), lit(salts.toLong)))
        .join(probeQ.withColumn("__salt",
          explode(sequence(lit(0L), lit(salts.toLong - 1)))),
          Seq("cell", "__salt"))
    val cand = joined
      .select(col("__qid"), col("__qv"), col("id").as(idCol),
        when(col("naa") === 0L, lit(0.0))
          .otherwise(qsum / sqrt(col("naa").cast("double")))
          .as("score"))
      .withColumn("__rn", row_number().over(byQ))
      .filter(col("__rn") <= nCand)
      .select(col("__qid"), col("__qv"), col(idCol))
    corpus.join(cand, idCol)
      .select(col("__qid"), col(idCol),
        (Similarity.dot(corpus, col(vecCol), col("__qv")) /
          (Similarity.l2norm(corpus, col(vecCol)) *
            Similarity.l2norm(corpus, col("__qv")))).as("score"))
      .withColumn("__rn", row_number().over(byQ))
      .filter(col("__rn") <= k)
      .select(col("__qid").as("qid"), col(idCol), col("score"))
  }

  // --- semantic-dup GROUPS at rest (r16) ----------------------------
  //
  // dedup_embed_ann_groups re-mines cosinePairsIndexed's pairs and
  // re-runs connected components over the whole corpus on every
  // invocation; the group structure only changes when the index does.
  // Same at-rest treatment MinHashIndex's groups got in r15:
  // buildGroups commits the full CC labels once (GROUPS_READY digests
  // the index marker it was built against, plus the mining params);
  // appendGroups folds a just-appended batch in through the shared
  // super-node CC (ConnectedComponents.foldIncrement), bounded by the
  // batch's reach plus one shuffle-free map pass assigning corpus
  // probe cells (the one per-corpus cost a probe-side candidate rule
  // cannot avoid without persisting the probe-cell table — documented
  // trade; the expensive legs, pair verify and CC, stay batch-bounded).

  private val GroupsMarker = "GROUPS_READY"

  private def groupsMarkerText(indexMarker: String, threshold: Double,
      probes: Int, superProbes: Int): String =
    s"format=$FormatVersion threshold=$threshold probes=$probes " +
      s"superProbes=$superProbes " +
      s"index[${IndexFs.markerDigest(indexMarker)}]"

  /** True iff a committed groups table exists AND matches the CURRENT
    * index marker at these mining params. Any append/delete/ingest
    * since it was built flips the digest; compaction preserves the
    * marker text and is result-invisible, so groups stay fresh
    * across it.
    */
  def groupsFresh(spark: SparkSession, dir: String, threshold: Double,
      probes: Int = 4, superProbes: Int = 0): Boolean =
    readMarker(spark, dir).exists { idx =>
      IndexFs.readMarker(spark, dir, GroupsMarker).contains(
        groupsMarkerText(idx, threshold, probes, superProbes))
    }

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

  /** The committed groups table: (id, label) for every vector in some
    * near-dup pair; label = min id of its group. Unpaired vectors are
    * absent (their group is trivially themselves).
    */
  def readGroups(spark: SparkSession, dir: String): DataFrame = {
    require(IndexFs.readMarker(spark, dir, GroupsMarker).nonEmpty,
      s"no committed groups table at $dir (missing $GroupsMarker)")
    spark.read.parquet(s"$dir/groups")
  }

  /** Full connected-components pass over [[cosinePairsIndexed]]'s
    * probe-confined pairs, committed as the at-rest `groups/` table.
    * Marker LAST, digesting the index marker + mining params it was
    * built against.
    */
  def buildGroups(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, threshold: Double, probes: Int = 4,
      superProbes: Int = 0): Unit =
    withLease(corpus.sparkSession, dir) {
      val spark = corpus.sparkSession
      val want = groupsMarkerText(readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed ANN index at $dir — build first")),
        threshold, probes, superProbes)
      hfs(spark, dir).delete(hpath(dir, GroupsMarker), false)
      graft.operators.ConnectedComponents.labels(
          cosinePairsIndexed(corpus, idCol, vecCol, dir, threshold,
            probes, superProbes)
            .select(col("id_a"), col("id_b")))
        .write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.writeMarker(spark, dir, GroupsMarker, want)
    }

  /** Fold a JUST-APPENDED batch into the committed groups table
    * incrementally. Preconditions mirror `MinHashIndex.appendGroups`
    * (the r17 suffix walk: GROUPS_READY digests a prefix of the index
    * marker and the NEXT un-folded line must be this batch's
    * `+append`/`+ingest` — a multi-mutation suffix folds as bounded
    * calls in marker order; see [[IndexFs.requireFoldable]]);
    * `corpus` is the full post-append corpus and must contain the
    * batch ids.
    *
    * New pairs = the batch's probe cells joined against the corpus
    * probe-cell assignment under the index's OWN frozen centroids —
    * exactly [[cosinePairsIndexed]]'s probe×probe co-occurrence rule
    * restricted to pairs touching the batch (every pair a full
    * re-mine would add has a batch endpoint; batch-internal pairs are
    * included since the corpus side contains the batch) — exact
    * cosine on candidates only, then the shared super-node CC fold.
    * Result equals a full rebuild (pinned in AnnIndexSpec).
    */
  def appendGroups(batch: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dir: String, threshold: Double, probes: Int = 4,
      superProbes: Int = 0): Unit =
    withLease(batch.sparkSession, dir) {
      val spark = batch.sparkSession
      val fs = hfs(spark, dir)
      val idx = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed ANN index at $dir — build first"))
      val stamp = IndexFs.requireFoldable(spark, dir, GroupsMarker,
        idx, "appendGroups",
        l => l.startsWith("+append[") || l == "+ingest",
        "+append/+ingest",
        prev => groupsMarkerText(prev, threshold, probes, superProbes))
      val (_, coarse, _) = load(spark, dir)
      val n = normalized(corpus, idCol, vecCol, dir)
      val bN = n.join(
        batch.select(col(idCol).cast("long").as("id")).distinct(),
        Seq("id"), "left_semi")
      val bProbe = probeCells(bN, coarse, probes, superProbes)
        .select(col("id").as("id_a"), col("cell"))
        .localCheckpoint(false)
      // corpus-side probe assignment: one shuffle-free map pass,
      // pruned to the batch's probed cells before the candidate join
      val cProbe = probeCells(n, coarse, probes, superProbes)
        .select(col("id").as("id_b"), col("cell"))
        .join(bProbe.select("cell").distinct(), Seq("cell"),
          "left_semi")
      val cand = bProbe.join(cProbe, "cell")
        .filter(col("id_a") =!= col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val newPairs = cand
        .join(n.select(col("id").as("id_a"), col("v").as("va"),
          col("nrm").as("na")), "id_a")
        .join(n.select(col("id").as("id_b"), col("v").as("vb"),
          col("nrm").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (Similarity.dot(corpus, col("va"), col("vb")) /
            (col("na") * col("nb"))).as("cos"))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"))
      // EAGER checkpoint: the update reads groups/, then overwrites it
      val updated = graft.operators.ConnectedComponents
        .foldIncrement(spark.read.parquet(s"$dir/groups"), newPairs)
        .localCheckpoint(true)
      fs.delete(hpath(dir, GroupsMarker), false)
      IndexFs.fail("ann.groups.unmarked")
      updated.write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.fail("ann.groups.written")
      IndexFs.writeMarker(spark, dir, GroupsMarker, stamp)
    }

  /** Fold a JUST-QUEUED [[delete]] into the committed groups table
    * incrementally — `MinHashIndex.deleteGroups`' embedding dual. A
    * delete can SPLIT a group (bridge removal), which the append
    * fold's super-node trick cannot express, so components are
    * recomputed ONLY over the touched groups' surviving members:
    * their probe cells re-assigned under the frozen quantizer
    * (deterministic per vector, so the confined candidate set equals
    * a full re-mine's pairs among them — a touched-member ↔
    * untouched-doc pair would have put both in ONE group already),
    * exact cosine on candidates only, CC over the confined pairs, and
    * the shared delete-fold relabel. Work is bounded by the touched
    * groups' member count, never corpus-sized. Preconditions: the
    * next un-folded marker line after the prefix GROUPS_READY digests
    * must be a `+delete[n]` (the r17 suffix walk —
    * [[IndexFs.requireFoldable]]; tombstones are applied IN FULL at
    * every fold, so with several deletes queued an earlier fold may
    * clean a later delete's groups early — the later fold then
    * no-ops for them). The drained sequence equals a full
    * [[buildGroups]] over the same index state (pinned in
    * AnnIndexSpec).
    */
  def deleteGroups(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, threshold: Double, probes: Int = 4,
      superProbes: Int = 0): Unit =
    withLease(corpus.sparkSession, dir) {
      val spark = corpus.sparkSession
      val fs = hfs(spark, dir)
      val idx = readMarker(spark, dir).getOrElse(
        throw new IllegalStateException(
          s"no committed ANN index at $dir — build first"))
      val stamp = IndexFs.requireFoldable(spark, dir, GroupsMarker,
        idx, "deleteGroups", l => l.startsWith("+delete["),
        "+delete[n]",
        prev => groupsMarkerText(prev, threshold, probes, superProbes))
      val g = spark.read.parquet(s"$dir/groups")
        .localCheckpoint(false)
      val del = spark.read.parquet(s"$dir/deletes").select(col("id"))
      val touched = g.join(del, Seq("id"), "left_semi")
        .select(col("label")).distinct()
      // surviving members of touched groups — the confined re-mine
      // universe; EAGER: reads groups/, which the fold overwrites
      val members = g.join(touched, Seq("label"), "left_semi")
        .join(del, Seq("id"), "left_anti")
        .select(col("id")).localCheckpoint(true)
      val (_, coarse, _) = load(spark, dir)
      val n = normalized(corpus, idCol, vecCol, dir) // tombstones out
      val mN = n.join(members, Seq("id"), "left_semi")
        .localCheckpoint(false)
      val probe0 = probeCells(mN, coarse, probes, superProbes)
        .select(col("id"), col("cell"))
      val probe =
        if (superProbes <= 0) probe0 else probe0.localCheckpoint(false)
      val cand = probe
        .join(probe.select(col("id").as("id2"), col("cell")), "cell")
        .filter(col("id") < col("id2"))
        .select(col("id").as("id_a"), col("id2").as("id_b"))
        .distinct()
      val pairs = cand
        .join(mN.select(col("id").as("id_a"), col("v").as("va"),
          col("nrm").as("na")), "id_a")
        .join(mN.select(col("id").as("id_b"), col("v").as("vb"),
          col("nrm").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          (Similarity.dot(corpus, col("va"), col("vb")) /
            (col("na") * col("nb"))).as("cos"))
        .filter(col("cos") >= threshold)
        .select(col("id_a"), col("id_b"))
      val relabeled = graft.operators.ConnectedComponents
        .labels(pairs).localCheckpoint(true)
      val updated = graft.operators.ConnectedComponents
        .foldDelete(g, touched, relabeled).localCheckpoint(true)
      fs.delete(hpath(dir, GroupsMarker), false)
      IndexFs.fail("ann.groups.unmarked")
      updated.write.mode("overwrite").parquet(s"$dir/groups")
      IndexFs.fail("ann.groups.written")
      IndexFs.writeMarker(spark, dir, GroupsMarker, stamp)
    }
}
