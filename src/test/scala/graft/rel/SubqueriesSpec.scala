package graft.rel

import graft.SparkSpec
import graft.stream.Funnel
import org.apache.spark.sql.functions._

class SubqueriesSpec extends SparkSpec {
  import spark.implicits._

  test("runtime bloom filter is injected on the probe side") {
    val df = Subqueries.joinBloom(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no bloom runtime filter in plan:\n$plan")
    // and the thresholds were lowered on a CHILD session, not ours
    assert(spark.conf.get(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
      ) != "0")
  }

  test("NOT IN goes empty when the subquery yields a NULL (3VL)") {
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").createOrReplaceTempView("probe")
    Seq(Some(1L), None).toDF("k").createOrReplaceTempView("sub")
    val n = spark.sql(
      "SELECT count(1) FROM probe WHERE k NOT IN (SELECT k FROM sub)")
      .head().getLong(0)
    assert(n == 0) // the semantics the null-aware anti join exists for
  }

  test("anti + semi partition the customer set") {
    val anti = Subqueries.joinAntiNull(spark, sf)
      .agg(sum($"n_cust")).head().getLong(0)
    val semi = Subqueries.subqueryExists(spark, sf)
      .agg(sum($"n_cust")).head().getLong(0)
    val total = graft.tables.Tables.customer(spark, sf).count()
    assert(anti + semi == total)
  }

  test("EXISTS decorrelates to a join (no per-row subquery)") {
    val plan = planOf(Subqueries.subqueryExists(spark, sf))
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
  }

  test("funnel step counts are monotonically non-increasing") {
    val steps = Funnel.funnelConversion(spark, sf)
      .orderBy("step").collect().map(_.getLong(1))
    assert(steps.length == 3)
    assert(steps(0) >= steps(1) && steps(1) >= steps(2))
    assert(steps(0) > 0)
  }
}
