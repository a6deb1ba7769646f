package graft

/** VERDICT r6 #2: execute — not just plan — every declared query at
  * sf0.001 before any snapshot. PlanAuditSpec catches analysis-time
  * failures (it flagged the r5/r6 events crashes); this catches the
  * runtime class (codegen, cast overflow, partition-read errors) the
  * planner can't see. The noop sink materializes every output column
  * through the full physical plan, same as Bench. ~1–2 min at sf0.001,
  * and it turns "did the round break a query?" into a single red test
  * instead of an artifact diff two rounds later. */
class SmokeSpec extends SparkSpec {

  test("every SparkEntry query executes end-to-end at sf0.001") {
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        None
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
      } finally spark.sharedState.cacheManager.clearCache()
    }
    assert(failures.isEmpty,
      s"${failures.size} queries failed:\n${failures.mkString("\n")}")
  }

  test("every query has an oracle entry or is a declared rows-only op") {
    // The correctness gate only hashes queries with oracle SQL; a query
    // silently missing BOTH would never be checked at all. Pin the split.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // Declared rows-only set: approximate / engine-internal ops. r8
    // oracled four former members (q_sc_recipe, q_text_langid,
    // q_text_bpe_encode, q_dedup_minhash) and added the state-store
    // diagnostic (engine-internal metrics by contract); r10 oracled
    // q_multimodal_features/binfile (exact integer-mean features).
    val declaredRowsOnly = Set(
      "q_agg_approx_distinct", // HLL estimate; DuckDB's sketch differs
      "q_agg_approx_percentile", "q_agg_sketch_merge",
      "q_sc_pca",
      "q_sc_anndata_pca", // same sign contract as q_sc_pca; obsm
                          // round-trip exactness pinned in AnnDataSpec
      "q_similarity_ivf", "q_similarity_lsh",
      "q_similarity_pq", "q_similarity_recall",
      "q_stream_state_metrics")
    assert(noOracle == declaredRowsOnly,
      s"undeclared rows-only queries: ${(noOracle -- declaredRowsOnly).toSeq.sorted}; " +
        s"stale declarations: ${(declaredRowsOnly -- noOracle).toSeq.sorted}")
  }
}
