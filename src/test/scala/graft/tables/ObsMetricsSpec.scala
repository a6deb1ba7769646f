package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dataset.observe metrics equal the direct aggregation — the observed
  * accumulator path must not drift from the declarative agg. */
class ObsMetricsSpec extends SparkSpec {

  test("observed metrics equal the direct agg over the same table") {
    val got = Profile.obsMetrics(spark, sf).head()
    val want = Tables.lineitem(spark, sf).agg(
      count(lit(1)).as("n_rows"),
      round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
      count(when(col("l_discount") > 0.05, 1)).as("n_heavy_discount"))
      .head()
    assert(got.getLong(0) === want.getLong(0))
    assert(got.getDouble(1) === want.getDouble(1))
    assert(got.getLong(2) === want.getLong(2))
    assert(got.getLong(0) > 0)
  }

  test("each invocation gets a fresh Observation (re-runnable)") {
    val a = Profile.obsMetrics(spark, sf).head()
    val b = Profile.obsMetrics(spark, sf).head()
    assert(a === b)
  }
}
