package graft.llm

import graft.SparkSpec

/** Hand-computed add-one bigram LM through LmScore.scoreDocs. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigram LM score matches the hand-computed smoothed model") {
    // corpus: unigrams a:3 b:2 c:1 → V=3; bigrams "a b":1, "b a":2
    val docs = Seq((1L, "a b a"), (2L, "b a"), (3L, "c"))
      .toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    // p(b|a) = (1+1)/(3+3) = 1/3 ; p(a|b) = (2+1)/(2+3) = 3/5
    val lp1 = BigDecimal(math.log(1.0 / 3.0) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lp2 = BigDecimal(math.log(0.6) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2.get - ((lp1 + lp2) / 2)) < 5e-5)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2.get - lp2) < 5e-5)
    // single-token doc: visible, zero bigrams, NULL score
    assert(out(3L) === ((0L, None)))
  }

  test("repeated bigram raises its probability above an unseen-heavy doc") {
    val docs = Seq((1L, "x y x y x y"), (2L, "x q")).toDF("doc_id", "text")
    val out = LmScore.scoreDocs(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L))
  }
}
