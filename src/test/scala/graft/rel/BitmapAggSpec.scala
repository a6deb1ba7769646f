package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {

  test("bitmap distinct equals count(DISTINCT) per group") {
    val got = BitmapAgg.bitmapDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("bitmap plan has map-side partial aggregation, no expand") {
    val plan = planOf(BitmapAgg.bitmapDistinct(spark, sf))
    // count(DISTINCT) plans an Expand; the bitmap form must not
    assert(!plan.contains("Expand"), plan.take(1500))
    assert(plan.contains("HashAggregate"), plan.take(1500))
  }
}
