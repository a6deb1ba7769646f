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

  test("fixture buckets sit far below the hot-bucket cap (oracle unaffected)") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") < NearDedupStream.Block)
    val maxBucket = Dedup.bandHashes(docs,
        NearDedupStream.NumHashes, NearDedupStream.Bands)
      .groupBy("band", "bh").count()
      .agg(max("count")).head.getLong(0)
    // measured 66 at sf0.001 (a cluster of near-identical docs sharing
    // a band) — ~4x headroom below the 256 cap
    assert(maxBucket < NearDedupStream.MaxBucket / 2,
      s"fixture bucket $maxBucket too close to cap ${NearDedupStream.MaxBucket}")
  }

  test("a saturated bucket stops matching and growing (state O(MaxBucket))") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import org.apache.spark.api.java.Optional
    val cap = NearDedupStream.MaxBucket
    val toks = Seq("a", "b", "c") // identical sets -> every pair is a dup
    val arrivals = (0 until cap + 50).iterator
      .map(i => (0, 0L, i.toLong, toks: Seq[String]))
    val st = TestGroupState.create[List[(Long, Seq[String])]](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long](), hasTimedOut = false)
    val out = NearDedupStream.matchAgainstState((0, 0L), arrivals, st).toVector
    assert(st.get.size == cap) // growth stopped exactly at the cap
    // arrivals past the cap emit nothing; the capped prefix emits all pairs
    assert(out.forall(_._1 < cap))
    assert(out.size == cap * (cap - 1) / 2)
  }
}
