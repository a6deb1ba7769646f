package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-5 LLM-pipeline ops: repeated-passage detection (shingle-level
  * substring dedup) and the logistic quality classifier. */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  test("repeatedPassages flags exactly the docs sharing a planted passage") {
    val passage = "the quick brown fox jumps over the lazy dog"  // 9 tokens
    val docs = Seq(
      (0L, s"intro alpha $passage outro beta"),
      (1L, s"different start $passage and a different end here"),
      (2L, s"$passage"),
      (3L, "no shared passage in this document at all nothing repeats " +
           "unique tokens only padding padding2 padding3 padding4"),
      (4L, "too short to shingle"),
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedPassages(docs, 8, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 0,1,2 share the 9-token passage → both of its 8-gram shingles
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got.values.forall(_ == 2L))
  }

  test("repeatedPassages: n_rep ≤ n_shingles, frac in (0,1], nonempty on sf") {
    val out = Dedup.dedupSubstring(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= r.getLong(2)))
    assert(rows.forall { r =>
      val f = r.getDouble(3); f > 0.0 && f <= 1.0 + 1e-9
    })
    // whole-doc duplicates (the exact-dup pairs known to exist in the
    // corpus) must show rep_frac = 1
    assert(rows.exists(r => r.getDouble(3) >= 1.0))
  }

  test("classifier score is a proper probability and ranks as designed") {
    val docs = Seq(
      (0L, "select join filter where group order from select join filter " +
           "where group order from select join filter where group order"),
      (1L, "9734 8123 4457 1189 0042 7581 2290 3364 8810 5521"),
    ).toDF("doc_id", "text")
      .select(col("doc_id"), TextOps.classifierScore(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(docs.values.forall(s => s >= 0.0 && s <= 1.0))
    // keyword-rich, low-digit text must out-score pure digits
    assert(docs(0L) > docs(1L))
  }

  test("textClassifier: keep is exactly score >= 0.5 on the corpus") {
    val out = TextOps.textClassifier(spark, sf).collect()
    assert(out.length == 500)
    assert(out.forall(r => r.getBoolean(2) == (r.getDouble(1) >= 0.5)))
    val kept = out.count(_.getBoolean(2))
    assert(kept > 0 && kept < out.length,
      s"degenerate classifier: kept $kept of ${out.length}")
  }
}
