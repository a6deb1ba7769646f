package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the streaming MinHash-LSH near-dedup:
  *  - differential vs the BATCH near-dup operator (same banding, same
  *    verification): the stream's per-doc verdicts must equal
  *    minHashPairs grouped by its later doc — the stream and batch
  *    paths may never disagree on what is a near-duplicate;
  *  - wave-boundary invariance: 1 wave (everything in one micro-batch,
  *    all matching same-batch) vs many waves (state-resident matching)
  *    produce identical results — the state hand-off loses nothing;
  *  - prefix semantics: every partner id is strictly smaller than the
  *    flagged doc id. */
class NearDedupStreamSpec extends SparkSpec {

  private def batchExpected() = {
    Dedup.minHashPairs(
        graft.tables.Tables.documents(spark, sf)
          .filter(col("doc_id") < NearDedupStream.Block),
        NearDedupStream.NumHashes, NearDedupStream.Bands, NearDedupStream.Tau)
      .groupBy(col("id2").as("doc_id"))
      .agg(min("id1").as("first_dup_of"), countDistinct("id1").as("n_dups"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  test("stream verdicts equal the batch near-dup operator's") {
    val expected = batchExpected()
    assert(expected.nonEmpty, "fixture must contain near-dup pairs")
    val got = NearDedupStream.streamDedupNear(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("wave boundaries do not change the result") {
    val one = NearDedupStream.run(spark, sf, 1)
      .collect().map(_.toSeq).toSeq
    val many = NearDedupStream.run(spark, sf, 10)
      .collect().map(_.toSeq).toSeq
    assert(one == many)
  }

  test("every partner precedes the doc it flags") {
    val rows = NearDedupStream.streamDedupNear(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
  }
}
