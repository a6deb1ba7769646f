package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness: library operators must return empty results (or
  * sane defaults), never throw, when fed zero rows — the behavior a
  * partition-pruned 100 TB job hits constantly. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private val emptyMatrix = Seq.empty[(Long, Seq[Double])].toDF("id", "vec")
  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("sc-matrix ops on an empty matrix") {
    assert(sc.ScMatrix.filterCells(emptyMatrix, 1, 0.0).count() == 0)
    assert(sc.ScMatrix.geneStats(emptyMatrix, 0.0).count() == 0)
    assert(sc.ScMatrix.normalizePerCell(emptyMatrix, Some(10.0)).count() == 0)
    assert(sc.ScMatrix.log1p(emptyMatrix).count() == 0)
    assert(sc.ScMatrix.scaleZ(emptyMatrix, 3.0).count() == 0)
    assert(sc.ScMatrix.hvgTopK(emptyMatrix, 5).count() == 0)
  }

  test("dedup ops on an empty corpus") {
    assert(llm.Dedup.simhash(emptyDocs).count() == 0)
    assert(llm.Dedup.minHashPairs(emptyDocs, 8, 4, 0.5).count() == 0)
    assert(llm.Dedup.jaccardPairs(
      emptyDocs.select($"doc_id", lit("t").as("t")).limit(0), 0.5).count() == 0)
  }

  test("similarity ops on an empty vector set") {
    val emptyVecs = Seq.empty[(Long, Seq[Double])].toDF("id", "v")
    assert(llm.Similarity.lshPairs(emptyVecs, 0.5, dim = 4).count() == 0)
  }

  test("round-2 operators on empty / no-match inputs") {
    // salted join with an empty build side: no matches, no throw
    val probe = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
    val emptyBuild = Seq.empty[(Long, String)].toDF("k", "name")
    assert(rel.Skew.saltedJoin(probe, emptyBuild, "k", 4).count() == 0)
    assert(rel.Skew.saltedCount(probe.limit(0), "k", 4).count() == 0)
    // interval join with no overlapping pairs
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val later = java.sql.Timestamp.valueOf("2024-01-02 10:00:00")
    val sgn = Seq((1L, 100L, ts)).toDF("user_id", "signup_id", "s_ts")
    val pur = Seq((1L, later, 5.0)).toDF("p_user", "p_ts", "value")
    assert(stream.Events.intervalJoinPairs(sgn, pur).count() == 0)
    // dedup keys of an empty stream; keep-latest via empty window input
    assert(stream.Events.dedupKeys(
      Seq.empty[(Long, String)].toDF("user_id", "event_type")).count() == 0)
    // sparse ops on an empty COO frame (dim inferred elsewhere)
    val emptyCoo = Seq.empty[(Long, Int, Double)].toDF("id", "pos", "val")
    assert(sc.ScSparse.geneStatsSparse(emptyCoo, 0).count() == 0)
    assert(sc.ScSparse.hvgSparse(spark, emptyCoo, 0, 4, 4)
      .collect().forall(_.isNullAt(1)))  // all-NULL dispersion padding rows
  }

  test("sessionization of an empty event set") {
    val e = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "value")
    assert(stream.Events.sessionsBatch(e).count() == 0)
    assert(stream.Events.tumbling(e.withColumn("event_type", lit("x")))
      .count() == 0)
  }
}
