package graft.llm

import graft.SparkSpec

/** Unigram-LM tokenizer gates: Viterbi optimality vs brute force on
  * small words, the (max score, min pieces) uniqueness contract, and
  * the EM fit's textbook properties — monotone corpus likelihood,
  * single-char closure, determinism. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("viterbi == brute-force best segmentation on every word ≤ 8 chars " +
    "of a crafted vocab, incl. the min-pieces tie rule") {
    val vocab = Map[String, Long](
      "a" -> 2, "b" -> 3, "c" -> 1, "ab" -> 8, "bc" -> 8, "abc" -> 10,
      "abca" -> 13, "ca" -> 4)
    def bruteBest(w: String): (Long, Int) = {
      def segs(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Seq())
        else (1 to math.min(UnigramLm.MaxPieceLen, s.length)).flatMap { l =>
          val h = s.take(l)
          if (vocab.contains(h)) segs(s.drop(l)).map(h +: _) else Seq()
        }
      val scored = segs(w).map(ss => (ss.map(vocab).sum, ss.length))
      val maxS = scored.map(_._1).max
      (maxS, scored.filter(_._1 == maxS).map(_._2).min)
    }
    for (w <- Seq("a", "abc", "abcabc", "abcabca", "cabcab", "aaaa",
      "bcabca", "abcabcab")) {
      assert(UnigramLm.viterbi(w, vocab) === bruteBest(w), s"word $w")
    }
    // the tie rule is real: "abca" = {"abca"}(13,1) vs {"ab","ca"}(12,2)
    // vs {"abc","a"}(12,2) — score wins; and "abcbc": "abc"+"bc"=18,2
    assert(UnigramLm.viterbi("abcbc", vocab) === (18L, 2))
    // unsegmentable (no 'd') fails loudly, not silently
    intercept[IllegalArgumentException] {
      UnigramLm.viterbi("ad", vocab)
    }
  }

  test("EM fit: corpus log-likelihood is monotone nondecreasing, the " +
    "support keeps single-char closure, and the fit is deterministic") {
    val docs = graft.tables.Tables.documents(spark, sf).limit(120)
      .select("doc_id", "text").cache()
    val (p1, ll1) = UnigramLm.fit(docs, iters = 5)
    // textbook EM gate (tolerance for float summation order only)
    ll1.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - math.abs(a) * 1e-12, s"likelihood dropped: $a -> $b")
    }
    assert(ll1.last > ll1.head, "EM must actually improve the likelihood")
    // closure: every char of every word is in the fitted support with
    // positive probability
    val chars = docs.select("text").as[String].collect()
      .flatMap(_.split(" ")).flatMap(_.toSeq).map(_.toString).toSet
    val support = p1.toMap
    chars.foreach(c => assert(support.get(c).exists(_ > 0), s"char '$c'"))
    // probabilities normalize (floor slack only)
    assert(math.abs(p1.map(_._2).sum - 1.0) < 1e-6)
    val (p2, ll2) = UnigramLm.fit(docs, iters = 5)
    assert(p1 == p2 && ll1 == ll2, "fit must be deterministic")
    docs.unpersist()
  }

  test("distributed vocabScores equals an independent driver counting loop") {
    import org.apache.spark.sql.functions._
    val docs = graft.tables.Tables.documents(spark, sf).limit(150)
      .select("doc_id", "text")
    val dist = UnigramLm.vocabScores(docs)
    // reference mirror: the pre-distribution driver loop, kept here as
    // the independent ground truth for the explode→keyed-agg plan
    val words = docs
      .select(explode(split($"text", " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val subs = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, cnt) =>
      for (l <- 2 to UnigramLm.MaxPieceLen; i <- 0 to w.length - l)
        subs.updateWith(w.substring(i, i + l))(p => Some(p.getOrElse(0L) + cnt))
    }
    val top = subs.toSeq.filter(_._2 >= UnigramLm.MinPieceCount)
      .sortBy { case (p, c) => (-c, p) }.take(UnigramLm.TopPieces)
    val chars = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, cnt) =>
      w.foreach(c =>
        chars.updateWith(c.toString)(p => Some(p.getOrElse(0L) + cnt)))
    }
    val expected = (top ++ chars).map { case (p, c) =>
      p -> p.length.toLong * p.length *
        (64 - java.lang.Long.numberOfLeadingZeros(c))
    }.toMap
    assert(dist == expected)
  }

  test("longer pieces win where the lexicon supports them (the len² " +
    "scoring makes subwords real, not a char fallback)") {
    val out = UnigramLm.unigramEncode(spark, sf).collect()
    assert(out.nonEmpty)
    val pieces = out.map(_.getAs[Long]("n_pieces")).sum.toDouble
    val words = out.map(_.getAs[Long]("n_words")).sum.toDouble
    val chars = graft.tables.Tables.documents(spark, sf)
      .select("text").as[String].collect()
      .map(_.split(" ").map(_.length).sum).sum.toDouble
    // meaningful compression: far fewer pieces than characters, and
    // more pieces than words (it IS a subword segmentation)
    assert(pieces < chars * 0.55, s"pieces=$pieces chars=$chars")
    assert(pieces >= words, s"pieces=$pieces words=$words")
  }
}
