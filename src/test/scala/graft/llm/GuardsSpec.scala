package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Totality / derived-parameter guards (VERDICT r3 "What's wrong" #3/#4):
  * wordNGrams must be safe without a caller-side size pre-filter, and the
  * LSH path must derive the embedding width from the data instead of
  * assuming the testbed's 64. */
class GuardsSpec extends SparkSpec {
  import spark.implicits._

  test("wordNGrams is total: docs shorter than n yield empty arrays") {
    val docs = Seq((0L, "a b"), (1L, "a"), (2L, ""), (3L, "a b c d"))
      .toDF("doc_id", "text")
    val grams = docs.select(col("doc_id"),
        TextOps.wordNGrams(TextOps.tokens(col("text")), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(grams(0L).isEmpty && grams(1L).isEmpty && grams(2L).isEmpty, grams)
    assert(grams(3L) == Seq("a b c", "b c d"), grams(3L))
  }

  test("both gram consumers survive sub-n docs with no pre-filter") {
    val docs = Seq((0L, "x y"), (1L, "a b c a b c a b c"))
      .toDF("doc_id", "text")
    // repetition: the 2-token doc contributes no 3-grams (and is dropped
    // by the semantic >=3 filter); the 9-token doc has 7 grams
    val rep = TextOps.repetitionOf(docs).collect()
    assert(rep.map(_.getLong(0)).toSeq == Seq(1L), rep.toSeq)
    // contamination-shaped consumer, deliberately WITHOUT the size filter:
    // the guard alone must keep the short doc from producing garbage grams
    val g5 = docs.select(col("doc_id"),
        explode(TextOps.wordNGrams(TextOps.tokens(col("text")), 5)).as("g"))
      .collect()
    assert(g5.forall(_.getLong(0) == 1L) && g5.length == 5, g5.toSeq)
  }

  test("lshPairs derives dim from the data (8-d fixture, no dim arg)") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.999, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0))
    ).toDF("id", "v")
    val pairs = Similarity.lshPairs(vecs, tau = 0.9)
      .select("id1", "id2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), pairs)
  }

  test("lloyd rejects empty input with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Similarity.lloyd(Array.empty, k = 4, iters = 2, seed = 1L)
    }
    assert(e.getMessage.contains("lloyd"))
  }
}
