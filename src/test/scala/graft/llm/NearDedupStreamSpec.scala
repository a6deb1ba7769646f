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
  *    flagged doc id;
  *  - the three PRODUCTION levers: file-source feed (no driver
  *    collect) equality, RocksDB state backend equality, event-time
  *    horizon equality at a covering horizon AND bounded state under a
  *    10k-doc replay, signatures-only state equality on this corpus. */
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

  test("file-source feed (corpus never collected) produces identical " +
    "verdicts whatever order the files replay in") {
    val mem = NearDedupStream.run(spark, sf, NearDedupStream.Waves)
      .collect().map(_.toSeq).toSeq
    val file = NearDedupStream.runFileFeed(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(file == mem)
  }

  test("RocksDB state backend: same topology, same verdicts") {
    val (k, v) = NearDedupStream.rocksDbConf
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try {
      assert(spark.conf.get(k).contains("RocksDB"))
      val got = NearDedupStream.run(spark, sf, NearDedupStream.Waves)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == batchExpected())
    } finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("signatures-only state: deterministic, never misses an exact " +
    "duplicate, and every flag is a true high-Jaccard pair") {
    // the estimated-Jaccard trade is real (measured: 30 flagged docs vs
    // the exact path's 17 at τ=0.95 — the 32-hash estimate is noisy
    // exactly at the threshold), so the gate pins the properties the
    // estimate DOES guarantee rather than a false equality:
    val run1 = NearDedupStream
      .run(spark, sf, NearDedupStream.Waves, signaturesOnly = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val run2 = NearDedupStream
      .run(spark, sf, NearDedupStream.Waves, signaturesOnly = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run1 == run2, "signatures-only run must be deterministic")
    val docs = graft.tables.Tables.documents(spark, sf)
      .filter(col("doc_id") < NearDedupStream.Block)
    val tok = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("t")).distinct()
    // (a) identical token sets ⇒ identical signatures ⇒ est = 1 ≥ τ:
    // every doc with an exact-duplicate predecessor MUST be flagged
    val exactDupDocs = tok.groupBy("doc_id")
      .agg(sort_array(collect_list("t")).as("ts"))
      .groupBy("ts").agg(sort_array(collect_list("doc_id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr("slice(ids, 2, size(ids) - 1)")).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val flaggedDocs = run1.map(_._1).toSet
    assert(exactDupDocs.nonEmpty && exactDupDocs.subsetOf(flaggedDocs),
      s"missed exact dups: ${(exactDupDocs -- flaggedDocs).toSeq.sorted}")
    // (b) precision at a relaxed bound: a flag needs ≥31/32 agreeing
    // hashes, which a pair below true J = 0.7 produces with negligible
    // probability — every flagged (doc, first_dup_of) must be a true
    // ≥ 0.7-Jaccard pair
    val highJ = Dedup.jaccardPairs(tok, 0.7)
      .select(least(col("id1"), col("id2")), greatest(col("id1"), col("id2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    run1.foreach { case (d, p) =>
      assert(highJ.contains((math.min(d, p), math.max(d, p))),
        s"signature flag ($d, $p) is not a true ≥0.7-Jaccard pair")
    }
  }

  test("a covering event-time horizon changes nothing; a short one " +
    "bounds state under a 10k-doc replay (timeout eviction is real)") {
    import spark.implicits._
    // 10k mostly-unique synthetic docs: each doc its own token family,
    // every 100th a near-dup of its immediate predecessor (gap 1 —
    // inside any horizon), so some verdicts must survive eviction
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 8).map(t =>
          concat(lit(s"w${t}_"), when(col("id") % 100 === 99,
            col("id") - 1).otherwise(col("id")))): _*).as("text"))
    val feed = NearDedupStream.prepFeedDocs(docs)
      .orderBy("doc_id").as[NearDedupStream.FeedRow].collect().toSeq
    val (vNoTtl, rowsNoTtl) = NearDedupStream.runWithMetrics(
      spark, sf, waves = 20, feedOverride = Some(feed))
    val (vCover, rowsCover) = NearDedupStream.runWithMetrics(
      spark, sf, waves = 20, horizonSec = Some(100000000L),
      feedOverride = Some(feed))
    // a horizon covering the whole replay is a no-op on verdicts
    assert(vCover.collect().map(_.toSeq).toSeq ==
      vNoTtl.collect().map(_.toSeq).toSeq)
    assert(rowsCover >= rowsNoTtl / 2) // nothing evicted under cover
    val (vShort, rowsShort) = NearDedupStream.runWithMetrics(
      spark, sf, waves = 20, horizonSec = Some(600L),
      feedOverride = Some(feed))
    // unique docs stop touching their buckets after one wave: the
    // short horizon times them out and state stays ~a horizon's worth
    // of arrivals instead of all history
    assert(rowsShort < rowsNoTtl / 5,
      s"state not bounded: short=$rowsShort noTtl=$rowsNoTtl")
    // the gap-1 dup pairs are inside every horizon: still flagged
    val flagged = vShort.collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedPairs = (0 until 10000).filter(_ % 100 == 99)
      .map(i => (i.toLong, i.toLong - 1))
    assert(expectedPairs.forall(flagged.contains),
      s"missing in-horizon dups: got ${flagged.length}")
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
    val arrivals = (0 until cap + 50).iterator.map(i =>
      NearDedupStream.Arrival(0, 0L, i.toLong, toks, Nil,
        new java.sql.Timestamp(i * 1000L)))
    val st = TestGroupState.create[List[NearDedupStream.Member]](
      Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      Optional.empty[Long](), hasTimedOut = false)
    val out = NearDedupStream.matchAgainstState(None, signaturesOnly = false)(
      (0, 0L), arrivals, st).toVector
    assert(st.get.size == cap) // growth stopped exactly at the cap
    // arrivals past the cap emit nothing; the capped prefix emits all pairs
    assert(out.forall(_._1 < cap))
    assert(out.size == cap * (cap - 1) / 2)
  }
}
