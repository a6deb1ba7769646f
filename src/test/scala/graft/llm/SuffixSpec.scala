package graft.llm

import graft.SparkSpec

/** Prefix-doubling suffix ranks: exact equality with a brute-force
  * suffix sort (the in-memory model), the saturation early-exit, and
  * the any-alignment repeated-window witness that the gridded dedups
  * (fixed chunks, CDC chunks) structurally cannot provide. */
class SuffixSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sfx").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    dir
  }

  /** brute force: rank = HEAD ORDINAL of the suffix STRING in the
    * multiset-sorted suffix sequence — #suffix instances strictly
    * smaller (ASCII, so Java string order == code-point order == the
    * engine's sentinel semantics: a shorter prefix sorts first). */
  private def modelRanks(texts: Seq[String]): Map[(Long, Long), Long] = {
    val sfx = for {
      (t, d) <- texts.zipWithIndex
      p <- 0 until t.length
    } yield ((d.toLong, p.toLong), t.substring(p))
    val sorted = sfx.map(_._2).sorted
    val headOf = sorted.zipWithIndex.reverse.toMap // first index wins
      .map { case (s, i) => s -> i.toLong }
    sfx.map { case (k, s) => k -> headOf(s) }.toMap
  }

  private def engineRanks(texts: Seq[String], cap: Int): Map[(Long, Long), Long] = {
    val docs = graft.tables.Tables.documents(spark, docsDir(texts))
    Suffix.ranks(docs, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("ranks == brute-force suffix sort: cross-doc duplicate suffixes " +
    "share a rank, prefixes sort first, empty doc contributes nothing") {
    val texts = Seq(
      "banana",          // the classic overlapping-suffix torture test
      "anana",           // every suffix duplicates one of banana's
      "band",            // shares prefixes, diverges later
      "",                // no suffixes
      "b")               // single char, prefix of several
    val m = modelRanks(texts)
    val e = engineRanks(texts, 16)
    assert(e == m)
  }

  test("saturation early-exit: a cap far beyond the distinguishing " +
    "prefix still yields the full exact order") {
    val texts = Seq("abcdefgh", "ijklmnop") // all suffixes distinct by char 1
    assert(engineRanks(texts, 1024) == modelRanks(texts))
  }

  test("randomized: 30 ASCII docs with engineered sharing match the model") {
    val rnd = new scala.util.Random(7)
    val vocab = "abcdr "
    val texts = (0 until 30).map { i =>
      val own = (0 until 20 + rnd.nextInt(40))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString
      // splice a shared passage into every third doc at a random offset
      if (i % 3 == 0) {
        val at = rnd.nextInt(own.length)
        own.substring(0, at) + "the shared passage body" + own.substring(at)
      } else own
    }
    assert(engineRanks(texts, 128) == modelRanks(texts))
  }

  test("q_dedup_suffix_window: a 64-char passage planted at MISALIGNED " +
    "offsets in two docs is witnessed; a same-doc-only repeat is not") {
    val p = ("qwerty" * 11).take(64) // the 64-char passage
    assert(p.length == 64)
    // fillers are doc-UNIQUE (distinct tag letters) so the only 64-char
    // content shared across documents is the passage itself
    def fill(tag: Char, n: Int) = (1 to n).map(i => s"$tag$i").mkString(".")
    val texts = Seq(
      fill('a', 30).take(10) + p + fill('b', 20), // P at offset 10
      fill('c', 30).take(37) + p + fill('d', 20), // P at offset 37 (misaligned)
      fill('g', 10) + p.take(40) + fill('h', 10), // only a SHORT piece of P
      "z" * 70 + fill('m', 10) + "z" * 70)        // self-repeat, single doc
    val out = Suffix.dedupSuffixWindow(spark, docsDir(texts)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exactly the two planting docs report, with exactly the one shared
    // 64-window class (P itself; its sub-windows shorter than 64 in doc 2
    // cannot form a full cross-doc window)
    assert(out.keySet == Set(0L, 1L))
    assert(out(0L) == ((1L, 1L)) && out(1L) == ((1L, 1L)))
  }

  test("q_text_suffix_census fingerprint matches the model's ranks") {
    val texts = Seq("abab", "baba", "ab")
    val m = modelRanks(texts)
    val got = Suffix.suffixCensus(spark, docsDir(texts)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = texts.zipWithIndex.filter(_._1.nonEmpty).map { case (t, d) =>
      val fp = md5((0 until t.length)
        .map(p => s"$p:${m((d.toLong, p.toLong))}").mkString("|"))
      (d.toLong, t.length.toLong, fp)
    }
    assert(got.toSeq == want)
  }
}
