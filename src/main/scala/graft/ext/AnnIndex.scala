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
  /** Bump when the on-disk layout changes shape. */
  private val FormatVersion = 1

  final case class Meta(nCells: Int, m: Int, nCentroids: Int, sub: Int,
      scale: Double)

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

  private def markerText(nCells: Int, m: Int, nCentroids: Int,
      fingerprint: String): String =
    s"format=$FormatVersion nCells=$nCells m=$m nCentroids=$nCentroids " +
      s"corpus[$fingerprint]"

  /** Train quantizers, encode the corpus, write the index tables, and
    * commit the marker. Overwrites any previous index at `dir`.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, dir: String,
      nCells: Int = 16, m: Int = 8, nCentroids: Int = 16,
      iters: Int = 3, fingerprint: String = ""): Unit = {
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
    val markerPath = java.nio.file.Paths.get(dir, Marker)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.deleteIfExists(markerPath)
    // a full rebuild retires any streaming segment: its rows were
    // encoded with the PREVIOUS quantizers
    val streamSeg = new java.io.File(s"$dir/codes_stream")
    if (streamSeg.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete(); ()
      }
      rm(streamSeg)
    }
    val cellDf = df.select(col(idCol).cast("long").as("id"),
      Similarity.ivfCell(df, col(vecCol), coarse).as("cell"))
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
    Seq((FormatVersion, nCells, m, nCentroids, sub, scale))
      .toDF("version", "n_cells", "m", "n_centroids", "sub", "scale")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    java.nio.file.Files.writeString(markerPath,
      markerText(nCells, m, nCentroids, fingerprint))
  }

  /** Build unless a committed index with the same params AND corpus
    * fingerprint already sits at `dir`. Returns true iff it built.
    */
  def ensureBuilt(df: DataFrame, idCol: String, vecCol: String,
      dir: String, nCells: Int = 16, m: Int = 8, nCentroids: Int = 16,
      iters: Int = 3, fingerprint: String = ""): Boolean = {
    val markerPath = java.nio.file.Paths.get(dir, Marker)
    val want = markerText(nCells, m, nCentroids, fingerprint)
    val fresh = java.nio.file.Files.exists(markerPath) &&
      java.nio.file.Files.readString(markerPath) == want
    if (!fresh)
      build(df, idCol, vecCol, dir, nCells, m, nCentroids, iters,
        fingerprint)
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
    * The marker gains a `+append[fingerprint]` line per append, so a
    * later `ensureBuilt` against any single-corpus fingerprint sees
    * staleness and triggers the full rebuild — the rebuild cadence
    * falls out of the same staleness check.
    */
  def append(df: DataFrame, idCol: String, vecCol: String,
      dir: String, fingerprint: String = ""): Unit = {
    val spark = df.sparkSession
    val (meta, coarse, cents) = load(spark, dir)
    // one shared map-side encode with the streaming ingest (PqBestCodes
    // takes the code array as ONE child, so the inlined transform(...)
    // is evaluated once per row — not the per-element re-inline that
    // OOM'd Janino in the element_at formulation, see Similarity)
    encodeWith(df, idCol, vecCol, meta, coarse, cents)
      .write.mode("append").partitionBy("cell")
      .parquet(s"$dir/codes")
    val markerPath = java.nio.file.Paths.get(dir, Marker)
    java.nio.file.Files.writeString(markerPath,
      java.nio.file.Files.readString(markerPath) +
        s"\n+append[$fingerprint]")
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
      Similarity.ivfCell(df, col("__v"), coarse).as("cell"))
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
    val (meta, coarse, cents) = load(stream.sparkSession, dir)
    encodeWith(stream, idCol, vecCol, meta, coarse, cents)
      .writeStream.format("parquet")
      .option("path", s"$dir/codes_stream")
      .option("checkpointLocation", checkpoint)
      .partitionBy("cell")
      .outputMode("append")
      .start()
  }

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
    */
  def compactSegment(spark: SparkSession, dir: String): Long = {
    val segDir = new java.io.File(s"$dir/codes_stream")
    if (!segDir.isDirectory) return 0L
    val seg = spark.read.parquet(s"$dir/codes_stream")
      .select("id", "naa", "bc", "cell")
      // materialize BEFORE touching the segment dir; bounded by the
      // segment (recent arrivals), not the corpus
      .localCheckpoint(true)
    val n = seg.count()
    seg.write.mode("append").partitionBy("cell").parquet(s"$dir/codes")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(rm)
      f.delete(); ()
    }
    rm(segDir)
    n
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
      fingerprint: String = ""): Boolean = {
    val markerPath = java.nio.file.Paths.get(dir, Marker)
    val want = markerText(nCells, m, nCentroids, fingerprint) +
      s"\n+append[$fingerprint]"
    val fresh = java.nio.file.Files.exists(markerPath) &&
      java.nio.file.Files.readString(markerPath) == want
    if (!fresh) {
      build(base, idCol, vecCol, dir, nCells, m, nCentroids, iters,
        fingerprint)
      append(extra, idCol, vecCol, dir, fingerprint)
    }
    !fresh
  }

  /** Bounded side tables of a committed index: meta row, coarse
    * centroids (by cell id), PQ codebooks (by (sm, c)).
    */
  def load(spark: SparkSession, dir: String)
      : (Meta, Seq[Seq[Float]], Map[(Int, Int), Seq[Int]]) = {
    require(java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, Marker)),
      s"no committed ANN index at $dir (missing $Marker — " +
        "build() did not finish?)")
    val m = spark.read.parquet(s"$dir/meta")
      .select("version", "n_cells", "m", "n_centroids", "sub", "scale")
      .head()
    require(m.getInt(0) == FormatVersion,
      s"ANN index format ${m.getInt(0)} != supported $FormatVersion")
    val meta = Meta(m.getInt(1), m.getInt(2), m.getInt(3), m.getInt(4),
      m.getDouble(5))
    val coarseRows = spark.read.parquet(s"$dir/coarse").collect()
    val coarse = coarseRows.map(r => r.getInt(0) -> r.getSeq[Float](1))
      .sortBy(_._1).map(_._2.toSeq).toSeq
    val cents = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Int](2).toSeq)
      .toMap
    require(coarse.size == meta.nCells &&
      cents.size == meta.m * meta.nCentroids,
      s"index side tables truncated: ${coarse.size} cells, " +
        s"${cents.size} codebook rows")
    (meta, coarse, cents)
  }

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
    val base = spark.read.parquet(s"$dir/codes")
    val segDir = new java.io.File(s"$dir/codes_stream")
    val codes = (if (segDir.isDirectory)
        base.unionByName(spark.read.parquet(s"$dir/codes_stream")
          .select("id", "naa", "bc", "cell"))
      else base)
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
}
