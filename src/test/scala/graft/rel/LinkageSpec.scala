package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {

  test("every dirty record links back to its source with the right distance") {
    val out = Linkage.joinFuzzy(spark, sf).cache()
    try {
      val n = Tables.customer(spark, sf).count()
      assert(out.count() == n, "100% recall on the planted perturbations")
      // ground truth: d_key identifies the source row
      assert(out.filter(col("c_custkey") =!= col("d_key")).count() == 0)
      // distance matches the planted perturbation class
      val wrong = out.filter(
        (col("d_key") % 3 === 0 && col("dist") =!= 1) ||   // appended char
        (col("d_key") % 3 === 1 && col("dist") =!= 1) ||   // dropped char
        (col("d_key") % 3 === 2 && col("dist") =!= 0))     // passthrough
      assert(wrong.count() == 0)
    } finally out.unpersist()
  }

  test("candidates come from a keyed equi-join, best-match is group-limited") {
    val plan = planOf(Linkage.joinFuzzy(spark, sf))
    // blocking is an equi-join (hash-joinable) — not a nested-loop
    // over all pairs
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // rank-1 selection pushes below the shuffle
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
