package graft.rel

import graft.SparkSpec

/** Config robustness: AQE rewrites physical plans at runtime (coalesced
  * partitions, demoted broadcasts, skew splits), and every spec/gate in
  * this repo runs with it ON. A cluster with AQE disabled must get the
  * SAME answers — especially from the paths that interact with
  * EnsureRequirements directly (the custom AsOfJoinExec's declared
  * distribution/ordering) and from plans AQE rewrites most (decorrelated
  * subqueries, count-based multiset ops, object aggregation). Runs each
  * on a child session with adaptive=false and diffs row-for-row. */
class AqeOffSpec extends SparkSpec {

  private val targets = Seq(
    "q_join_asof_native", // custom exec: requirements met by static planning
    "q_topk_grouped",     // ObjectHashAggregate partial/final split
    "q_sql_tpch_q2",      // decorrelated scalar-min + value-keyed SMJ
    "q_except_all",       // count-based generate rewrite
    "q_similarity_sparse" // persisted frames + self-join
  )

  test("AQE-off results equal AQE-on results, row for row") {
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.enabled", "false")
    targets.foreach { name =>
      val on = graft.SparkEntry.queries(name)(spark, sf).collect()
      val noAqe = graft.SparkEntry.queries(name)(off, sf).collect()
      assert(on.toSeq == noAqe.toSeq,
        s"$name diverges with adaptive=false: " +
          s"on=${on.take(2).mkString(";")} off=${noAqe.take(2).mkString(";")}")
      off.sharedState.cacheManager.clearCache()
    }
  }
}
