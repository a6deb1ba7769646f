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

  test("radix-ladder equivalence: maxRadix 2, 4, and 16 produce " +
    "identical head-ordinal ranks (the radix only changes round count)") {
    val texts = Seq("banana", "anana", "bandana band", "", "ban")
    val docs = graft.tables.Tables.documents(spark, docsDir(texts))
    def ranksAt(r: Int): Map[(Long, Long), Long] =
      Suffix.ranksWithLevels(docs, 16, None, maxRadix = r)._1.collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    val m = modelRanks(texts)
    assert(ranksAt(2) == m)
    assert(ranksAt(4) == m)
    assert(ranksAt(16) == m)
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

  test("q_dedup_suffix_maxrep: planted 100-char passage at misaligned " +
    "offsets -> exact length, pair count, and content hash") {
    val p = ("qwerty" * 17).take(100)
    // boundary chars around the passage differ per doc, so the repeat
    // cannot accidentally extend
    val texts = Seq(
      "A" * 10 + p + "B" * 30,
      "C" * 37 + p + "D" * 30)
    val out = Suffix.dedupSuffixMaxrep(spark, docsDir(texts)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 100L, s"max_rep_len ${r.getLong(0)}")
    assert(r.getLong(1) == 1L, s"n_max_pairs ${r.getLong(1)}")
    val md5p = java.security.MessageDigest.getInstance("MD5")
      .digest(p.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(2) == md5p)
  }

  test("q_dedup_suffix_maxrep: three copies -> two adjacent max pairs; " +
    "disjoint alphabets -> (0, 0, null)") {
    val p = ("zxcvbn" * 17).take(100)
    val texts3 = Seq(
      "A" * 10 + p + "B" * 30,
      "C" * 37 + p + "D" * 30,
      "E" * 5 + p + "F" * 30)
    val r3 = Suffix.dedupSuffixMaxrep(spark, docsDir(texts3)).collect().head
    assert(r3.getLong(0) == 100L && r3.getLong(1) == 2L)
    val rd = Suffix.dedupSuffixMaxrep(spark,
      docsDir(Seq("aaabbbccc", "dddeeefff"))).collect().head
    assert(rd.getLong(0) == 0L && rd.getLong(1) == 0L && rd.isNullAt(2))
  }

  test("q_dedup_suffix_maxrep: randomized docs match a brute-force " +
    "longest-common-cross-doc-substring model") {
    val rnd = new scala.util.Random(11)
    val vocab = "abcd"
    val texts = (0 until 8).map { i =>
      val own = (0 until 25 + rnd.nextInt(15))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString
      if (i % 3 == 0) { // splice a shared mid-length passage
        val at = rnd.nextInt(own.length)
        own.substring(0, at) + "sharedpiece" + own.substring(at)
      } else own
    }
    def subs(t: String): Set[String] =
      (for (a <- 0 until t.length; b <- a + 1 to t.length)
        yield t.substring(a, b)).toSet
    val perDoc = texts.map(subs)
    val brute = (for {
      i <- texts.indices; j <- texts.indices if i < j
      s <- perDoc(i) intersect perDoc(j)
    } yield s.length).foldLeft(0)(math.max)
    val got = Suffix.dedupSuffixMaxrep(spark, docsDir(texts)).collect().head
    assert(got.getLong(0) == brute.toLong, s"got ${got.getLong(0)}, brute $brute")
  }

  test("q_dedup_suffix_coverage: overlapping windows merge into one " +
    "span, separate passages count separately") {
    val p = ("qwerty" * 14).take(80) // 80-char passage -> 17 dup windows
    val q = ("zxcvbn" * 11).take(64) // second, disjoint 64-char passage
    def fill(tag: Char, n: Int) = (1 to n).map(i => s"$tag$i").mkString(".")
    // fill tags must not CONTINUE the periodic passages: p ends "…qw"
    // so an 'e' right after it would legitimately extend the repeat by
    // a character (the engine caught exactly that in an earlier fixture)
    val texts = Seq(
      fill('a', 30).take(11) + p + fill('b', 30) + q + fill('c', 10),
      fill('d', 30).take(23) + p + fill('m', 30),
      fill('g', 30).take(7) + q + fill('h', 30))
    val out = Suffix.dedupSuffixCoverage(spark, docsDir(texts)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L))
    // doc 0 carries BOTH passages: 80 + 64 dup chars in 2 spans
    assert(out(0L)._2 == 144L && out(0L)._3 == 2L, s"doc0 ${out(0L)}")
    assert(out(0L)._1 == texts(0).length.toLong)
    // docs 1 and 2 carry one passage each, one merged span
    assert(out(1L)._2 == 80L && out(1L)._3 == 1L, s"doc1 ${out(1L)}")
    assert(out(2L)._2 == 64L && out(2L)._3 == 1L, s"doc2 ${out(2L)}")
  }

  test("q_dedup_suffix_clip: the kept text equals the brute-force " +
    "anti-join of chars against the covered-offset union, md5-exact; " +
    "untouched and fully-clipped docs both keep their rows") {
    def fill(c: Char, n: Int) = c.toString * n
    val p = ('A' to 'Z').mkString + ('a' to 'z').mkString +
      "0123456789!@#$%^&*()_+-=[]{};:" // 92 chars, unique content
    val texts = Seq(
      fill('a', 11) + p + fill('b', 20), // passage mid-doc
      p,                                  // passage IS the doc: fully clipped
      fill('z', 40))                      // untouched
    def model(t: String, d: Int): (Long, Long, String) = {
      val wins = texts.zipWithIndex.flatMap { case (s, i) =>
        (0 to s.length - 64).map(q => (s.substring(q, q + 64), i))
      }
      val sharedW = wins.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val covered = (0 to t.length - 64)
        .filter(q => sharedW(t.substring(q, q + 64)))
        .flatMap(q => q until q + 64).toSet
      val kept = t.indices.filterNot(covered).map(t.charAt).mkString
      def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (t.length.toLong, kept.length.toLong, md5(kept))
    }
    val got = Suffix.dedupSuffixClip(spark, docsDir(texts)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got.keySet == texts.indices.map(_.toLong).toSet)
    texts.zipWithIndex.foreach { case (t, d) =>
      assert(got(d.toLong) == model(t, d), s"doc $d")
    }
    // the fully-clipped doc really emptied; the untouched doc really kept all
    assert(got(1L)._2 == 0L)
    assert(got(2L)._2 == 40L)
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
