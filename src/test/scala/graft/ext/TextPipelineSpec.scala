package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PiiSpec extends SparkSpec {

  test("redactPii replaces every PII class and counts match") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("mail a@b.com and c.d+x@e.org end", 2, 0, 0, 0),
      ("ip 10.0.0.1 and 192.168.255.3", 0, 2, 0, 0),
      ("ssn 123-45-6789 phone 555-867-5309", 0, 0, 1, 1),
      ("no pii here at all", 0, 0, 0, 0)
    ).toDF("t", "ne", "ni", "ns", "np")
    val got = df.select(
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailRe).as("ge"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.Ipv4Re).as("gi"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.SsnRe).as("gs"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.PhoneRe).as("gp"),
      TextAnalysis.redactPii(col("t")).as("red"),
      col("ne"), col("ni"), col("ns"), col("np")).collect()
    got.foreach { r =>
      assert(r.getAs[Int]("ge") == r.getAs[Int]("ne"))
      assert(r.getAs[Int]("gi") == r.getAs[Int]("ni"))
      assert(r.getAs[Int]("gs") == r.getAs[Int]("ns"))
      assert(r.getAs[Int]("gp") == r.getAs[Int]("np"))
    }
    val reds = got.map(_.getAs[String]("red"))
    assert(reds(0) == "mail <EMAIL> and <EMAIL> end")
    assert(reds(1) == "ip <IP> and <IP>")
    assert(reds(2) == "ssn <SSN> phone <PHONE>")
    assert(reds(3) == "no pii here at all")
  }

  test("ssn and phone shapes do not cross-match") {
    val s = spark
    import s.implicits._
    val df = Seq("a 123-45-6789 b 123-456-7890 c").toDF("t")
    val r = df.select(TextAnalysis.redactPii(col("t"))).head.getString(0)
    assert(r == "a <SSN> b <PHONE> c")
  }
}

class RepetitionSpec extends SparkSpec {

  test("dupBigramFraction on crafted docs") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a b a b a b", 3.0 / 5.0), // bigrams: ab ba ab ba ab -> 2 distinct of 5
      ("a b c d e", 0.0),         // all distinct
      ("solo", 0.0),              // < 2 tokens
      ("", 0.0)
    ).toDF("t", "want")
    val got = df.select(
      TextAnalysis.dupBigramFraction(Dedup.tokens(col("t"))).as("got"),
      col("want")).collect()
    got.foreach(r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12,
        s"got ${r.getDouble(0)} want ${r.getDouble(1)}"))
  }

  test("bigrams preserves adjacency and order") {
    val s = spark
    import s.implicits._
    val got = Seq("x y z").toDF("t")
      .select(TextAnalysis.bigrams(Dedup.tokens(col("t"))))
      .head.getSeq[String](0)
    assert(got == Seq("x y", "y z"))
  }
}

class TextPipelinePropertySpec extends SparkSpec {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(7L + i)))

  /** Independent Scala reference of the duplicate-bigram fraction. */
  private def refDupFrac(text: String): Double = {
    val ws = text.trim.toLowerCase.split("\\s+").toSeq
      .filter(_ => text.trim.nonEmpty)
    if (ws.size < 2) 0.0
    else {
      val gs = ws.sliding(2).map(_.mkString(" ")).toSeq
      1.0 - gs.distinct.size.toDouble / gs.size
    }
  }

  test("dupBigramFraction matches a sliding-window reference on random docs") {
    val s = spark
    import s.implicits._
    val word = Gen.oneOf("a", "b", "ab", "ba", "xy")
    val doc = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = samples(doc, 300).distinct
    val got = docs.toDF("t")
      .select(col("t"),
        TextAnalysis.dupBigramFraction(Dedup.tokens(col("t"))).as("f"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    docs.foreach { t =>
      assert(math.abs(got(t) - refDupFrac(t)) < 1e-12,
        s"'$t': got ${got(t)} want ${refDupFrac(t)}")
    }
  }

  test("redactPii never leaves a raw match and is idempotent") {
    val s = spark
    import s.implicits._
    val pii = Gen.oneOf(
      "u@example.com", "10.1.2.3", "123-45-6789", "555-123-4567")
    val filler = Gen.oneOf("hello", "x1", "a.b", "7", "-")
    val doc = for {
      n <- Gen.choose(0, 6)
      parts <- Gen.listOfN(n, Gen.frequency(3 -> filler, 2 -> pii))
    } yield parts.mkString(" ")
    val docs = samples(doc, 200).distinct
    val out = docs.toDF("t")
      .select(col("t"), TextAnalysis.redactPii(col("t")).as("r"),
        TextAnalysis.redactPii(TextAnalysis.redactPii(col("t"))).as("rr"))
      .collect()
    out.foreach { row =>
      val r = row.getString(1)
      assert(!r.contains("example.com") && !r.contains("10.1.2.3") &&
        !r.contains("123-45-6789") && !r.contains("555-123-4567"),
        s"'${row.getString(0)}' -> '$r'")
      assert(r == row.getString(2), "redaction must be idempotent")
    }
  }
}

class SamplingSpec extends SparkSpec {

  test("hashBucket is deterministic, uniform-ish, and in range") {
    val s = spark
    import s.implicits._
    val ids = (0L until 2000L).toDF("id")
    val b = ids.select(Sampling.hashBucket(col("id"), "salt", 100).as("b"))
    val stats = b.agg(min("b"), max("b"), countDistinct("b")).head
    assert(stats.getLong(0) >= 0 && stats.getLong(1) <= 99)
    assert(stats.getLong(2) == 100) // all buckets hit at n=2000
    // determinism: same salt → same buckets
    val again = ids.select(Sampling.hashBucket(col("id"), "salt", 100).as("b"))
    assert(b.exceptAll(again).count() == 0)
    // different salt → different assignment (overwhelmingly)
    val other = ids.select(Sampling.hashBucket(col("id"), "other", 100).as("b"))
    assert(b.exceptAll(other).count() > 0)
  }

  test("stratifiedKeep approximates the target rate per stratum") {
    val s = spark
    import s.implicits._
    val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    val df = rows.toDF("id", "lang")
    val pct = when(col("lang") === "en", lit(25)).otherwise(lit(75))
    val kept = df.filter(Sampling.stratifiedKeep(col("id"), "s", pct))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 per stratum; binomial sd ~19 at p=.25 — generous bounds
    assert(math.abs(kept("en") - 500L) < 150, s"en=${kept("en")}")
    assert(math.abs(kept("de") - 1500L) < 150, s"de=${kept("de")}")
  }
}

class GeoMeanSpec extends SparkSpec {

  test("geometric mean of known values") {
    val s = spark
    import s.implicits._
    val df = Seq(("g", 2.0), ("g", 8.0)).toDF("k", "x")
    val gm = df.groupBy("k")
      .agg(graft.functions.GeoMean.geoMean(col("x")).as("gm"))
      .head.getDouble(1)
    assert(math.abs(gm - 4.0) < 1e-9) // sqrt(2*8) = 4
  }

  test("result is independent of partitioning (exact decimal state)") {
    val s = spark
    import s.implicits._
    val xs = (1 to 1000).map(_.toDouble)
    val one = xs.toDF("x").coalesce(1)
      .agg(graft.functions.GeoMean.geoMean(col("x"))).head.getDouble(0)
    val many = xs.toDF("x").repartition(32)
      .agg(graft.functions.GeoMean.geoMean(col("x"))).head.getDouble(0)
    assert(one == many) // bit-identical, not just close
  }

  test("non-positive and non-finite inputs are skipped") {
    val s = spark
    import s.implicits._
    val gm = Seq(4.0, 0.0, -3.0, Double.NaN, Double.PositiveInfinity, 4.0)
      .toDF("x")
      .agg(graft.functions.GeoMean.geoMean(col("x"))).head.getDouble(0)
    assert(math.abs(gm - 4.0) < 1e-9)
  }
}

/** Differential test for the dedup_spans query: the distributed
  * window/semi pipeline vs an in-memory sliding-window reference, on
  * crafted corner cases AND seeded random corpora (small vocabulary →
  * dense gram collisions).
  */
class DedupSpansSpec extends SparkSpec {

  private def reference(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    // mirror Spark's lower(trim(text)) + split(_, "\\s+") EXACTLY:
    // trim strips SPACES only (not \t/\n), and Spark's split keeps
    // trailing empty tokens (limit -1) where Java's default drops them
    val toks = docs.map { case (id, t) =>
      val stripped = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse
      id -> stripped.toLowerCase.split("\\s+", -1).toSeq
    }.toMap
    val grams = toks.toSeq.flatMap { case (id, ws) =>
      ws.sliding(5).zipWithIndex.collect {
        case (g, i) if g.size == 5 => (id, i, g.mkString(" "))
      }
    }
    val counts = grams.groupBy(_._3).map { case (g, v) => g -> v.size }
    val dup = grams.filter(p => counts(p._3) > 1)
    toks.map { case (id, ws) =>
      val mine = dup.filter(_._1 == id)
      val covered = mine.flatMap(p => p._2 to (p._2 + 4)).toSet
      id -> (ws.size.toLong, mine.size.toLong, covered.size.toLong)
    }
  }

  private def run(docs: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("spans").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    graft.SparkEntry.queries("dedup_spans")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_grams"),
          r.getAs[Long]("dup_tokens"))))
      .toMap
  }

  test("crafted corners: identical docs, internal repetition, " +
      "short docs, overlap merging") {
    val docs = Seq(
      1L -> "a b c d e f g",          // dup of doc 2 → fully covered
      2L -> "a b c d e f g",
      3L -> "x y z w",                // < 5 tokens → no grams
      4L -> "p p p p p p p p p",      // self-repeating gram
      5L -> "unique words only here never repeated anywhere",
      6L -> " a b c d e f g\n",       // space trim + trailing \n →
      7L -> "\ta b c d e f g")        // phantom "" token; leading \t
    val got = run(docs)
    val want = reference(docs)
    assert(got == want, s"\ngot  $got\nwant $want")
    // spot-check the semantics the reference encodes
    assert(got(1L) == ((7L, 3L, 7L)))  // 3 positions, all 7 tokens covered
    assert(got(3L) == ((4L, 0L, 0L)))
    assert(got(4L)._2 == 5L)           // 9 tokens → 5 self-dup positions
  }

  test("seeded random corpora match the reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d")
    for (_ <- 1 to 3) {
      val docs = (1L to 15L).map { id =>
        val n = 3 + rnd.nextInt(12)
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      assert(run(docs) == reference(docs))
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedup_spans_clean removes exactly the covered tokens and " +
      "fingerprints the order-preserved remainder") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "a b c d e f g",
      2L -> "a b c d e f g",          // full dup → empty remainder
      3L -> "x y z a b c d e tail",   // prefix-shifted partial overlap
      4L -> "short doc here")
    val dir = java.nio.file.Files.createTempDirectory("spansc").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("dedup_spans_clean")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_kept"), r.getAs[String]("clean_fp")))).toMap
    // reference: recompute covered sets in-memory
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").toSeq }.toMap
    val grams = toks.toSeq.flatMap { case (id, ws) =>
      ws.sliding(5).zipWithIndex.collect {
        case (g, i) if g.size == 5 => (id, i, g.mkString(" ")) } }
    val counts = grams.groupBy(_._3).map { case (g, v) => g -> v.size }
    val want = toks.map { case (id, ws) =>
      val covered = grams
        .filter(p => p._1 == id && counts(p._3) > 1)
        .flatMap(p => p._2 to (p._2 + 4)).toSet
      val kept = ws.zipWithIndex.collect {
        case (w, i) if !covered(i) => w }
      id -> ((kept.size.toLong, md5hex(kept.mkString(" "))))
    }
    assert(got == want, s"\ngot  $got\nwant $want")
    assert(got(2L) == ((0L, md5hex(""))))          // fully removed
    assert(got(3L) == ((4L, md5hex("x y z tail")))) // gap-preserving
    assert(got(4L) == ((3L, md5hex("short doc here"))))
  }
}

class WinnowSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** In-memory mirror of Dedup.winnowFingerprints (k=5, w=4):
    * md5 over space-joined 5-gram, min per window of 4 consecutive
    * starts, full windows only except short docs (ng <= w) which keep
    * their truncated pos-0 window.
    */
  private def reference(docs: Seq[(Long, String)], k: Int = 5,
      w: Int = 4): Map[Long, Set[String]] =
    docs.map { case (id, t) =>
      val stripped = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse
      val ws = stripped.toLowerCase.split("\\s+", -1).toSeq
      val grams = ws.sliding(k).collect {
        case g if g.size == k => md5hex(g.mkString(" "))
      }.toSeq
      val fps =
        if (grams.isEmpty) Set.empty[String]
        else if (grams.size <= w) Set(grams.min)
        else grams.sliding(w).map(_.min).toSet
      id -> fps
    }.toMap

  private def run(docs: Seq[(Long, String)]): Map[Long, Set[String]] = {
    val s = spark
    import s.implicits._
    Dedup.winnowFingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("fp")))
      .groupBy(_._1).map { case (id, v) => id -> v.map(_._2).toSet }
  }

  test("fingerprints match the in-memory winnowing reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta", "iota", "kappa")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(30))(
        vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val got = run(docs)
    val want = reference(docs).filter(_._2.nonEmpty)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("SWA guarantee: docs sharing a k+w-1 token run share a fp") {
    // shared 8-token run (k=5, w=4 → guarantee threshold k+w-1=8)
    // embedded in unrelated prefixes/suffixes
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      1L -> s"xa xb xc $shared xd xe",
      2L -> s"ya yb $shared yc yd ye yf")
    val got = run(docs)
    assert((got(1L) intersect got(2L)).nonEmpty)
  }

  test("short docs: <k tokens none, k..k+w-1 tokens exactly one") {
    val docs = Seq(
      1L -> "a b c d",            // 4 tokens, no gram
      2L -> "a b c d e",          // 5 tokens → 1 gram → 1 fp
      3L -> "a b c d e f g h")    // 8 tokens → 4 grams = w → 1 fp
    val got = run(docs)
    assert(!got.contains(1L))
    assert(got(2L).size == 1)
    assert(got(3L).size == 1)
    assert(got(2L) == Set(md5hex("a b c d e")))
  }

  test("thinning: long doc keeps far fewer fingerprints than grams") {
    val rnd = new scala.util.Random(11)
    val text = Seq.fill(500)(s"t${rnd.nextInt(100000)}").mkString(" ")
    val got = run(Seq(1L -> text))(1L)
    val nGrams = 500 - 5 + 1
    // expected density ~2/(w+1) = 0.4; assert comfortably under 0.6
    assert(got.size < nGrams * 6 / 10,
      s"fp count ${got.size} not thinned vs $nGrams grams")
  }

  test("winnowPairs: dup docs pair; over-common fps are dropped") {
    val s = spark
    import s.implicits._
    val body = (1 to 20).map(i => s"w$i").mkString(" ")
    val boiler = "common header line for every document here now"
    val docs = Seq(
      1L -> s"$body tail one",
      2L -> s"$body tail two",             // near-dup of 1
      3L -> s"$boiler unrelated content a b c d e f",
      4L -> s"$boiler other words x y z p q r",
      5L -> s"$boiler more stuff m n o j k l")
    val df = docs.toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, "doc_id", "text",
        maxDocFreq = 64, minShared = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(pairs.contains((1L, 2L)))
    // with maxDocFreq = 2 the boilerplate fps (df = 3) are dropped, so
    // docs 3/4/5 cannot pair
    val capped = Dedup.winnowPairs(df, "doc_id", "text",
        maxDocFreq = 2, minShared = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    assert(!capped.exists(p => p._1 >= 3L))
  }
}

class NaiveBayesSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  // An INFORMATIVE corpus (the battery's synthetic documents table
  // draws every lang's text from one shared vocabulary, so there the
  // mathematically correct NB output is the majority class): each
  // label here has marker tokens plus shared filler.
  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    (0L until 40L).map { i =>
      val lbl = if (i % 2 == 0) "aa" else "bb"
      val marker = if (lbl == "aa") "alpha apple anchor" else "bravo berry basket"
      (i, s"$marker the of and common filler $marker", lbl)
    }.toDF("doc_id", "text", "label")
  }

  test("weight table is bounded by labels x buckets; weights are the " +
      "half-bit-quantized Laplace log-likelihood with the class-total " +
      "denominator, u the unseen weight") {
    val w = NaiveBayes.trainWeights(corpus, "label", 64).collect()
    assert(w.length <= 2 * 64)
    // re-derive counts and class totals independently and compare
    def bl2(n: Long) = 64L - java.lang.Long.numberOfLeadingZeros(n * n)
    val counts = corpus
      .select(col("label").as("wl"),
        explode(Dedup.tokens(col("text"))).as("t"))
      .select(col("wl"), Sampling.hashBucket(col("t"), "nb", 64).as("b"))
      .groupBy("wl", "b").count().collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = counts.groupBy(_._1._1).map { case (l, m) =>
      l -> m.values.sum }
    w.foreach { r =>
      val cnt = counts((r.getString(0), r.getLong(1)))
      val den = bl2(totals(r.getString(0)) + 64)
      assert(r.getLong(2) == bl2(cnt + 1) - den)
      assert(r.getLong(3) == 1L - den)
    }
  }

  test("held-out docs classify to their label on an informative " +
      "corpus; scores are integer and tie-break is total") {
    // split on doc_id % 4 so BOTH labels land in both halves (labels
    // alternate with parity, so a % 2 split would train one class)
    val tr = corpus.filter(col("doc_id") % 4 < 2)
    val weights = NaiveBayes.trainWeights(tr, "label", 64)
    val out = NaiveBayes.classify(
      corpus.filter(col("doc_id") % 4 >= 2), weights, "label", 64)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("correct")),
      "marker tokens must dominate shared filler")
  }

  test("a class absent from a doc's buckets never outranks a present " +
      "one, and docs with no trained bucket drop out") {
    val s = spark
    import s.implicits._
    val tr = Seq(
      (0L, "xx xx xx", "px"),
      (1L, "yy", "py")).toDF("doc_id", "text", "label")
    val weights = NaiveBayes.trainWeights(tr, "label", 64)
    // "xx zz": only class px has any overlapping bucket; py scores
    // the doc all-unseen and must lose (the unseen weight is the
    // class's smallest) -> px wins; "zz zz": no trained bucket for
    // ANY class -> dropped entirely.
    val te = Seq((10L, "xx zz", "px"), (11L, "zz zz", "px"))
      .toDF("doc_id", "text", "label")
    val got = NaiveBayes.classify(te, weights, "label", 64).collect()
    assert(got.length == 1 && got.head.getLong(0) == 10L &&
      got.head.getAs[String]("pred_label") == "px")
  }

  test("class imbalance: a 5x-volume class gains no systematic edge " +
      "— the denominator cancels volume, so a held-out minority doc " +
      "still classifies to its label (the hits-only bit_length(count) " +
      "scheme misclassifies this exact corpus)") {
    val s = spark
    import s.implicits._
    // identical shared-token distribution in both classes, one
    // marker each at the same RATE; "big" has 5x the volume
    val tr = ((0L until 40L).map(i =>
        (i, "the of and in to bigmark", "big")) ++
      (100L until 108L).map(i =>
        (i, "the of and in to smallmark", "small")))
      .toDF("doc_id", "text", "label")
    val weights = NaiveBayes.trainWeights(tr, "label", 64)
    // under the old hits-only scheme: big scores 5*bitlen(40)=30,
    // small 6*bitlen(8)=24 -> "big" wins on a doc that is
    // distributionally pure "small"
    val te = Seq((999L, "the of and in to smallmark", "small"))
      .toDF("doc_id", "text", "label")
    val got = NaiveBayes.classify(te, weights, "label", 64).collect()
    assert(got.length == 1 &&
      got.head.getAs[String]("pred_label") == "small",
      got.mkString(";"))
  }
}

class DsirSpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  // Informative corpus: target docs use marker tokens the raw pool
  // mostly lacks; raw docs 0..9 are target-LIKE (share the markers),
  // raw docs 10..29 are not. DSIR must select the target-like ones.
  private def corpus: DataFrame = {
    val s = spark
    import s.implicits._
    val tgt = (100L until 120L).map(i =>
      (i, "alpha apple anchor the of and", "target"))
    val rawLike = (0L until 10L).map(i =>
      (i, "alpha apple anchor the of and", "raw"))
    val rawFar = (10L until 30L).map(i =>
      (i, "zulu zebra zenith the of and", "raw"))
    (tgt ++ rawLike ++ rawFar).toDF("doc_id", "text", "src")
  }

  test("feature table is bounded by buckets and counts split by side") {
    val ft = Dsir.featureTable(corpus, col("src") === "target", 64)
    assert(ft.count() <= 64)
    val (tt, tr) = ft.agg(sum("ct"), sum("cr")).collect().head match {
      case r => (r.getLong(0), r.getLong(1))
    }
    assert(tt == 20 * 6 && tr == 30 * 6) // 6 tokens per doc
  }

  test("target-like raw docs outweigh far raw docs and top-k selects " +
      "exactly them, target pool excluded") {
    val w = Dsir.weights(corpus, col("src") === "target", 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val likeMin = (0L until 10L).map(w).min
    val farMax = (10L until 30L).map(w).max
    assert(likeMin > farMax, s"likeMin=$likeMin farMax=$farMax")
    val sel = Dsir.selectTopK(corpus, col("src") === "target", 64, 10)
      .collect().map(_.getLong(0)).toSet
    assert(sel == (0L until 10L).toSet) // never a target doc_id
  }

  test("weights are exact integers: re-derive one doc's weight from " +
      "independently computed bucket counts") {
    val s = spark
    import s.implicits._
    val b = 64
    val ft = Dsir.featureTable(corpus, col("src") === "target", b)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val tt = ft.values.map(_._1).sum
    val tr = ft.values.map(_._2).sum
    def bitlen(n: Long) = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val toks = "zulu zebra zenith the of and".split(" ")
    val expected = toks.map { t =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(("dsir" + t).getBytes("UTF-8"))
      val bucket = java.lang.Long.parseLong(
        h.take(4).map("%02x".format(_)).mkString, 16) % b
      val (ct, cr) = ft(bucket)
      (bitlen(ct + 1) - bitlen(cr + 1)).toLong
    }.sum + toks.length * (bitlen(tr + b) - bitlen(tt + b))
    val got = Dsir.weights(corpus, col("src") === "target", b)
      .filter(col("doc_id") === 15L).collect().head.getLong(1)
    assert(got == expected)
  }
}

class KneserNeySpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("bigram scores equal hand-derived exact KN rationals: seen " +
      "bigram, unseen bigram in a seen context, and unseen-context " +
      "backoff") {
    val s = spark
    import s.implicits._
    // ref doc: a b a b a c  ->  c(ab)=2, c(ba)=2, c(ac)=1, Ncc=3
    //   ctx a: cv=3, nv=2;  ctx b: cv=2, nv=1
    //   cont: nw(a)=nw(b)=nw(c)=1
    val docs = Seq((0L, "a b a b a c"), (1L, "a b c d"))
      .toDF("doc_id", "text")
    val got = KneserNey.bigramScores(docs, col("doc_id") === 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._3, r._2))
    // (a,b): p = (2-3/4)/3 + (3/4)(2/3)(1/3) = 21/36; wq = bl(21)-bl(36) = -1
    // (b,c): p = (3/4)(1/2)(1/3) = 3/24;              wq = bl(3)-bl(24) = -3
    // (c,d): unseen context -> p = 1/Ncc = 1/3;        wq = bl(1)-bl(3)  = -1
    assert(got.toSeq == Seq((1L, 0L, -3L), (1L, 0L, -1L), (1L, 1L, -1L)),
      got.mkString(";"))
  }

  test("doc roll-up sums the quantized logs; a doc made of seen " +
      "bigrams outscores a same-length doc of novel ones") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "a b a b a c"),
      (1L, "a b a b"), (2L, "x y z q")).toDF("doc_id", "text")
    val rows = KneserNey.docScores(docs, col("doc_id") === 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(rows(1L)._1 == 3 && rows(2L)._1 == 3)
    assert(rows(1L)._2 == 3, "all of doc 1's bigrams are known")
    assert(rows(2L)._2 == 0, "none of doc 2's bigrams are known")
    assert(rows(1L)._3 > rows(2L)._3,
      s"KN must rank in-distribution text higher: $rows")
  }
}
