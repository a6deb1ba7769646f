package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards for the round-2 pipeline rewiring: the near-dup verify stage of
  * pipelineDocs consumes LSH candidates instead of the token-equi-join
  * all-pairs, and LSH banding drops degenerate (oversized) buckets. */
class PipelineLshSpec extends SparkSpec {
  import spark.implicits._

  test("LSH-candidate verify equals exact all-pairs verify on testdata") {
    // This equality is what keeps q_pipeline_docs oracle-able: the DuckDB
    // oracle runs the exact pair SQL, the engine runs the LSH path.
    val docs = graft.tables.Tables.documents(spark, sf)
      .filter($"doc_id" < 200).select("doc_id", "text")
    val tok = docs.select($"doc_id", explode(split($"text", " ")).as("t"))
      .distinct()
    val exact = Dedup.jaccardPairs(tok, 0.95)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaLsh = Dedup.jaccardPairs(tok, 0.95,
        Some(Dedup.minHashCandidates(docs, numHashes = 32, bands = 16)))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaLsh == exact, s"lsh=$viaLsh exact=$exact")
  }

  test("degenerate bucket is dropped: candidate count stays bounded") {
    // Adversarial fixture: 40 IDENTICAL docs (collide on EVERY band →
    // one 40-doc bucket per band → 780 pairs × 16 bands uncapped) plus a
    // planted near-dup pair that must survive the cap.
    val clones = (0L until 40L).map(i => (i, "the the the common flood text"))
    val planted = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
    val docs = (clones ++ planted).toDF("doc_id", "text")
    val capped = Dedup.minHashCandidates(docs, numHashes = 32, bands = 16,
      maxBucket = 8)
    val n = capped.count()
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 780 clone-pairs came from buckets of size 40 > 8 → dropped
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 }, s"n=$n")
    // the planted near-dup pair shares most tokens → survives via its own
    // small buckets
    assert(pairs.contains((100L, 101L)), pairs.toString)
    assert(n < 50, s"candidate count not bounded: $n")
  }

  test("uncapped default still admits normal-size buckets") {
    val docs = Seq(
      (0L, "spark sql join filter window group order by"),
      (1L, "spark sql join filter window group order by extra"),
    ).toDF("doc_id", "text")
    val cand = Dedup.minHashCandidates(docs, numHashes = 32, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((0L, 1L)))
  }
}
