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

  test("bitmap set algebra equals direct distinct set operations") {
    val r = BitmapAgg.bitmapSetOps(spark, sf).collect()(0)
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
    val a = o.filter(col("yr") === 1995).select("o_custkey").distinct()
    val b = o.filter(col("yr") === 1996).select("o_custkey").distinct()
    assert(r.getLong(0) == a.count())
    assert(r.getLong(1) == b.count())
    assert(r.getLong(2) == a.union(b).distinct().count())
    assert(r.getLong(3) == a.intersect(b).count())
    assert(r.getLong(4) == a.except(b).count())
  }

  test("bitmap plan has map-side partial aggregation, no expand") {
    val plan = planOf(BitmapAgg.bitmapDistinct(spark, sf))
    // count(DISTINCT) plans an Expand; the bitmap form must not
    assert(!plan.contains("Expand"), plan.take(1500))
    assert(plan.contains("HashAggregate"), plan.take(1500))
  }
}
