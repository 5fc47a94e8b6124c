package graft.ext

import graft.SparkSpec

class CdcSpec extends SparkSpec {

  // Independent sequential reimplementation of the chunker: normalize,
  // scan window END positions left to right, cut where the base-257
  // mod-1,000,003 hash of the trailing `w` chars is 0 mod `m`.
  private def refChunks(text: String, w: Int = 8, m: Int = 32): Seq[String] = {
    val nt = text.toLowerCase.replaceAll("\\s+", " ").trim
    val cuts = (w - 1 until nt.length).filter { e =>
      var h = 0L
      (e - w + 1 to e).foreach(i => h = (h * 257L + nt(i).toLong) % 1000003L)
      h % m == 0
    }
    val bounds = (-1 +: cuts) ++
      (if (cuts.nonEmpty && cuts.last == nt.length - 1) Nil
       else Seq(nt.length - 1))
    bounds.sliding(2).map { case Seq(a, b) => nt.substring(a + 1, b + 1) }.toSeq
  }

  private def sparkChunks(texts: Seq[String]): Map[Long, Seq[String]] = {
    val s = spark
    import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Dedup.cdcChunks(df, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (id, rs) => id -> rs.sortBy(_._2).map(_._3).toSeq }
  }

  // deterministic word soup in the corpus's alphabet
  private def soup(seed: Int, n: Int): String = {
    val words = Seq("spark", "join", "window", "batch", "stream", "the",
      "sort", "merge", "hash", "key", "table", "scan", "a", "row")
    var x = seed
    (0 until n).map { _ =>
      x = (x * 1103515245 + 12345) & 0x7fffffff
      words(x % words.length)
    }.mkString(" ")
  }

  test("matches the sequential reference chunker on varied inputs, " +
      "chunks concatenate back to the normalized text") {
    val texts = Seq(soup(1, 40), soup(7, 25), soup(42, 60),
      "short", "exactly8", "the  the   the the", soup(9, 3))
    val got = sparkChunks(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val exp = refChunks(t)
      assert(got(i.toLong) == exp, s"doc $i: ${got(i.toLong)} vs $exp")
      val nt = t.toLowerCase.replaceAll("\\s+", " ").trim
      assert(got(i.toLong).mkString("") == nt, s"doc $i reassembly")
    }
  }

  test("content-defined shift resilience: prepending a word leaves " +
      "every chunk after the first boundary identical") {
    val base = soup(3, 50)
    val shifted = "zzz " + base
    val a = refChunks(base)
    val b = refChunks(shifted)
    // all chunks from the second boundary on must be shared verbatim
    // (the first chunk absorbs the perturbation)
    assert(a.drop(1).toSet.subsetOf(b.toSet) ||
      a.drop(2).toSet.subsetOf(b.toSet),
      s"shift broke chunk identity:\n$a\n$b")
    // and the Spark side agrees with the reference on both
    val got = sparkChunks(Seq(base, shifted))
    assert(got(0L) == a && got(1L) == b)
  }

  test("doc shorter than the window is one whole chunk") {
    val got = sparkChunks(Seq("tiny"))
    assert(got(0L) == Seq("tiny"))
  }
}
