package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adversarial corpus shapes for the suffix-rank machinery — the skew
  * bound is the largest AMBIGUOUS class, and a uniform-single-character
  * corpus is its worst case: every width-w class holds every suffix
  * with >= w chars remaining (content never distinguishes anything;
  * only remaining length does). The rounds must still complete in
  * log4(cap) passes with correct head-ordinal ranks, and the
  * longest-repeat query must report the exact answer. */
class SuffixStressSpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("sfxstress").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    dir
  }

  test("uniform 'aaaa…' corpus (worst-case class skew): ranks are exact " +
    "head ordinals by suffix length") {
    // 40 docs x 120 chars of one character: 4800 positions, every class
    // giant at every width, nothing ever saturates early
    val texts = Seq.fill(40)("a" * 120)
    val docs = graft.tables.Tables.documents(spark, docsDir(texts))
    val r = Suffix.ranks(docs, 128)
    // suffix of length k sorts before length k+1; all suffixes of equal
    // length are identical across docs, so rank(length k) = head ordinal
    // = 40 * (k - 1) (the 40 copies of each shorter length precede it)
    val got = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(got.length == 40 * 120)
    got.foreach { case (_, pos, rank) =>
      val k = 120 - pos // suffix length at this position
      assert(rank == 40L * (k - 1), s"pos $pos: rank $rank != ${40 * (k - 1)}")
    }
  }

  test("uniform corpus: maxrep = doc length (identical whole docs), " +
    "window census counts every eligible position") {
    val texts = Seq.fill(6)("z" * 100)
    val d = docsDir(texts)
    val mr = Suffix.dedupSuffixMaxrep(spark, d).collect().head
    // the longest cross-doc repeat is the whole 100-char document; the
    // max-achieving consecutive pairs are the 5 adjacent copies of the
    // full-length suffix
    assert(mr.getLong(0) == 100L, s"max_rep_len ${mr.getLong(0)}")
    assert(mr.getLong(1) == 5L, s"n_max_pairs ${mr.getLong(1)}")
    val wc = Suffix.dedupSuffixWindow(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every position with >= 64 remaining is a shared window; all those
    // windows are the same single string ("z" * 64)
    assert(wc.keySet == (0L until 6L).toSet)
    wc.values.foreach { case (nPos, nDistinct) =>
      assert(nPos == 100 - 64 + 1 && nDistinct == 1L)
    }
  }
}
