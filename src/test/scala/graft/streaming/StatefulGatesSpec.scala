package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The state-store-resident ingest gates (r17): the committed index
  * loaded ONCE into keyed state via transformWithState initial state,
  * probed by point lookup — no per-micro-batch corpus re-scan. Pins:
  *
  *   - batch-face EQUALITY against the join-gate referees on the
  *     same inputs: exactGateStateful(frozen) == BloomIndex.gate's
  *     exact_dup; nearDupCandidatesStateful(frozen, distinct) ==
  *     MinHashIndex.probe at the same estimate gate;
  *     annGateStateful(frozen) == StreamingOps.annGate field for
  *     field;
  *   - STREAM == BATCH per doc;
  *   - selfMaintain: a first occurrence joins the in-state corpus
  *     and gates later arrivals — intra-batch (deterministic id
  *     order) and across micro-batches — semantics a frozen static
  *     side cannot express;
  *   - SNAPSHOT generation semantics: an index mutation after gate
  *     start is NOT reflected (state is self-contained; refresh =
  *     fresh-checkpoint restart) — the generation-mix failure mode
  *     of re-scanned static sides is structurally absent;
  *   - RESTART: state rides the checkpoint; a stopped gate resumes
  *     with its self-maintained corpus intact, without re-reading
  *     the index.
  */
class StatefulGatesSpec extends SparkSpec {

  // streaming transformWithState needs RocksDB; an isolated child
  // session keeps the provider conf away from concurrently-running
  // suites (same SparkContext, separate SQLConf)
  private lazy val ssession: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s
  }

  private def t(min: Int) = new Timestamp(1700000000000L + min * 60000L)
  private def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private val docText100 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val docText101 = (1 to 12).map(i => s"w$i").mkString(" ")
  private val docText102 =
    "one two three four five six seven eight nine ten"

  private val tsKey = concat_ws(" ",
    array_sort(array_distinct(graft.ext.Dedup.tokens(col("text")))))

  private lazy val fixtures = {
    val s = ssession
    import s.implicits._
    val corpusDocs = Seq(
      (100L, docText100), (101L, docText101), (102L, docText102))
      .toDF("doc_id", "text")
    val corpusEmb = Seq(
      (0L, v(1, 0, 0, 0, 0, 0, 0, 0)),
      (1L, v(0, 1, 0, 0, 0, 0, 0, 0)),
      (2L, v(0, 0, 1, 0, 0, 0, 0, 0)),
      (3L, v(0, 0, 0, 1, 0, 0, 0, 0)))
      .toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("statefulgates")
    val (bdir, mdir, adir) = (s"$root/bloom", s"$root/mh", s"$root/ann")
    graft.ext.BloomIndex.build(corpusDocs, "doc_id", tsKey, bdir,
      k = 7, mBits = 1 << 14)
    graft.ext.MinHashIndex.build(corpusDocs, "doc_id", "text", mdir,
      numHashes = 32, bands = 32)
    graft.ext.AnnIndex.build(corpusEmb, "vec_id", "embedding", adir,
      nCells = 2, m = 2, nCentroids = 4, iters = 1)
    (corpusDocs, corpusEmb, bdir, mdir, adir)
  }

  // incoming: 11 = exact dup of 100; 12 = near-dup of 101; 13 = embed
  // near-dup of corpus vec 2; 14 = novel; 15/16 = identical novel
  // pair (intra-batch dedup)
  private val incoming = Seq(
    (11L, t(0), docText100, v(0.6, 0.6, 0, 0, 0, 0, 0, 0)),
    (12L, t(0), (1 to 11).map(i => s"w$i").mkString(" ") + " w12x",
      v(0, 0.6, 0.6, 0, 0, 0, 0, 0)),
    (13L, t(0), "completely different prose about something else " +
      "entirely unrelated", v(0, 0.1, 0.99, 0, 0, 0, 0, 0)),
    (14L, t(0), "novel content nothing shared with any corpus doc " +
      "at all", v(0.5, 0.5, 0.5, 0.5, 0, 0, 0, 0)),
    (15L, t(0), "twin text planted twice in this very batch body",
      v(0, 0, 0, 0, 1, 0, 0, 0)),
    (16L, t(0), "twin text planted twice in this very batch body",
      v(0, 0, 0, 0, 0, 1, 0, 0)))

  private def incomingDf = {
    val s = ssession
    import s.implicits._
    incoming.toDF("doc_id", "ts", "text", "embedding")
  }

  // ---------- exact gate

  test("exact batch face, frozen state == BloomIndex.gate exact_dup") {
    val (_, _, bdir, _, _) = fixtures
    val stateful = StatefulGates.exactGateStateful(incomingDf,
        "doc_id", tsKey, bdir, selfMaintain = false)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    val referee = graft.ext.BloomIndex.gate(incomingDf, "doc_id",
        tsKey, bdir)
      .select(col("doc_id"), col("exact_dup"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(stateful == referee, s"$stateful != $referee")
    assert(referee.contains((11L, true)) && referee.contains((15L, false))
      && referee.contains((16L, false)), s"referee sanity: $referee")
  }

  test("exact batch face, selfMaintain: the intra-batch twin pair " +
      "resolves deterministically — lower id admits, higher id dups") {
    val (_, _, bdir, _, _) = fixtures
    val out = StatefulGates.exactGateStateful(incomingDf, "doc_id",
        tsKey, bdir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out(11L) && !out(14L), s"corpus verdicts: $out")
    assert(!out(15L) && out(16L), s"twin pair order: $out")
  }

  test("exact stream: self-maintained state gates later " +
      "micro-batches, survives a RESTART from checkpoint, and does " +
      "NOT see an index mutation after start (snapshot semantics)") {
    val s = ssession
    import s.implicits._
    implicit val sc = s.sqlContext
    val (_, _, bdir0, _, _) = fixtures
    // private bloom dir: this test appends to it mid-stream
    val bdir = s"${java.nio.file.Files.createTempDirectory("sgexact")}/b"
    val corpus = Seq((100L, docText100)).toDF("doc_id", "text")
    graft.ext.BloomIndex.build(corpus, "doc_id", tsKey, bdir,
      k = 7, mBits = 1 << 14)
    val root = java.nio.file.Files.createTempDirectory("sgexactq")
    val srcDir = root.resolve("src")
    java.nio.file.Files.createDirectories(srcDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def drop(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.parquet(s"$srcDir/$name")
    def start() = StatefulGates.exactGateStateful(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$srcDir/*"), "doc_id", tsKey, bdir)
      .writeStream.format("parquet").option("path", s"$root/out")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").start()
    drop("f1", Seq((11L, docText100), (12L, "fresh words one")))
    var q = start(); q.processAllAvailable(); q.stop()
    // mutate the index AFTER gate start: the state snapshot must not
    // see it — "late corpus words" stays novel to THIS gate run
    graft.ext.BloomIndex.append(
      Seq((300L, "late corpus words")).toDF("doc_id", "text"),
      "doc_id", tsKey, bdir)
    // restart from checkpoint: 12's key must be in carried state
    drop("f2", Seq(
      (13L, "fresh words one"), (14L, "late corpus words")))
    q = start(); q.processAllAvailable(); q.stop()
    val out = s.read.parquet(s"$root/out")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out.size == 4, s"exactly-once: $out")
    assert(out(11L) && !out(12L), s"first batch: $out")
    assert(out(13L), s"12's key must gate 13 across the restart: $out")
    assert(!out(14L),
      s"index mutation after start must NOT be reflected: $out")
  }

  // ---------- text near-dup gate

  test("text batch candidates, frozen state == MinHashIndex.probe " +
      "at the same estimate gate (distinct pairs, self excluded)") {
    val (_, _, _, mdir, _) = fixtures
    val stateful = StatefulGates.nearDupCandidatesStateful(
        incomingDf.withColumn("ts", col("ts")), "doc_id", "text",
        "ts", mdir, estThreshold = 0.5)
      .filter(col("cand_id").isNotNull)
      .select(col("doc_id"), col("cand_id"), col("est")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val referee = graft.ext.MinHashIndex.probe(incomingDf, "doc_id",
        "text", mdir, threshold = 0.5)
      .filter(col("id_a") =!= col("id_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stateful == referee, s"$stateful != $referee")
    assert(referee.exists(p => p._1 == 11L && p._2 == 100L) &&
      referee.exists(p => p._1 == 12L && p._2 == 101L),
      s"referee sanity: $referee")
  }

  test("text stream gate == batch gate per doc; selfMaintain gates " +
      "a later micro-batch against an earlier streamed doc") {
    val s = ssession
    import s.implicits._
    implicit val sc = s.sqlContext
    val (_, _, _, mdir, _) = fixtures
    def gate(df: DataFrame) = StatefulGates.nearDupGateStateful(df,
      "doc_id", "text", "ts", mdir, threshold = 0.6,
      estThreshold = 0.5, selfMaintain = true)
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = gate(in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("sg_nd")
      .outputMode("append").start()
    val novel = (20L, t(0),
      "entirely new prose streamed before its twin arrives later")
    val twin = (21L, t(1),
      "entirely new prose streamed before its twin arrives today")
    in.addData(incoming.take(4).map(r => (r._1, r._2, r._3)) :+ novel)
    q.processAllAvailable()
    in.addData(twin)
    q.processAllAvailable()
    // flush row far ahead closes both windows
    in.addData((90L, t(200), "flush words for the final window close"))
    q.processAllAvailable()
    val streamed = s.table("sg_nd")
      .filter(col("doc_id") =!= 90L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    q.stop()
    // batch face on the SAME sequence (frozen vs corpus + planted
    // order): 11/12 hit corpus docs, 21 hits 20 via self-maintain
    assert(streamed(11L)._2 == false && streamed(12L)._2 == false,
      s"corpus near-dups flagged: $streamed")
    assert(streamed(20L)._2 == true,
      s"novel doc admitted: $streamed")
    assert(streamed(21L)._2 == false,
      s"selfMaintain must gate the twin in a later batch: $streamed")
    // stream == batch for the corpus-only verdicts (frozen face)
    val batch = StatefulGates.nearDupGateStateful(
        incomingDf.limit(4), "doc_id", "text", "ts", mdir,
        threshold = 0.6, estThreshold = 0.5)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(4)))).toMap
    for (id <- Seq(11L, 12L, 13L, 14L))
      assert(streamed(id) == batch(id),
        s"stream != batch for $id: ${streamed(id)} vs ${batch(id)}")
  }

  // ---------- embedding gate

  test("embedding batch gate, frozen state == StreamingOps.annGate " +
      "field for field on the same inputs") {
    val (_, corpusEmb, _, _, adir) = fixtures
    val batchIn = incomingDf
    val cells = graft.ext.AnnIndex.cellTable(corpusEmb, "vec_id",
      "embedding", adir, probes = 2)
    def key(df: DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e9) / 1e9, r.getBoolean(4))).toSet
    val stateful = key(StatefulGates.annGateStateful(batchIn,
      "doc_id", "embedding", "ts", corpusEmb, "vec_id", "embedding",
      adir, threshold = 0.9, probes = 2))
    val referee = key(StreamingOps.annGate(batchIn, "doc_id",
      "embedding", "ts", cells, adir, threshold = 0.9, probes = 2))
    assert(stateful == referee, s"$stateful != $referee")
    assert(referee.exists(r => r._1 == 13L && !r._5),
      s"13 must be an embedding near-dup: $referee")
  }

  test("embedding stream == batch; selfMaintain gates a later " +
      "micro-batch against an earlier streamed vector") {
    val s = ssession
    import s.implicits._
    implicit val sc = s.sqlContext
    val (_, corpusEmb, _, _, adir) = fixtures
    def gate(df: DataFrame, maintain: Boolean) =
      StatefulGates.annGateStateful(df, "doc_id", "embedding", "ts",
        corpusEmb, "vec_id", "embedding", adir, threshold = 0.9,
        probes = 2, selfMaintain = maintain)
    val in = MemoryStream[(Long, Timestamp, Array[Float])]
    val q = gate(in.toDF().toDF("doc_id", "ts", "embedding"),
        maintain = true)
      .writeStream.format("memory").queryName("sg_ann")
      .outputMode("append").start()
    val novel = (20L, t(0), v(0, 0, 0, 0, 0.7, 0.7, 0, 0))
    val twin = (21L, t(1), v(0, 0, 0, 0, 0.7, 0.71, 0, 0))
    in.addData(incoming.take(4).map(r => (r._1, r._2, r._4)) :+ novel)
    q.processAllAvailable()
    in.addData(twin)
    q.processAllAvailable()
    in.addData((90L, t(200), v(0, 0, 0, 0, 0, 0, 0, 1)))
    q.processAllAvailable()
    val streamed = s.table("sg_ann")
      .filter(col("doc_id") =!= 90L)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(4))).toMap
    q.stop()
    assert(!streamed(13L), s"13 is a corpus near-dup: $streamed")
    assert(streamed(14L) && streamed(20L), s"novels admitted: $streamed")
    assert(!streamed(21L),
      s"selfMaintain must gate the twin vector: $streamed")
    val batch = gate(incomingDf.limit(4), maintain = false)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    for (id <- Seq(11L, 12L, 13L, 14L))
      assert(streamed(id) == batch(id),
        s"stream != batch for $id: ${streamed(id)} vs ${batch(id)}")
  }
}
