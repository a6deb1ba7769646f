package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MoreJoinsSpec extends SparkSpec {

  test("full outer preserves both unmatched sides and agrees with a " +
    "left+anti reconstruction") {
    val full = MoreJoins.joinFull(spark, sf)
    val c = graft.tables.Tables.customer(spark, sf)
    val o = graft.tables.Tables.orders(spark, sf)
    // every customer key and every order custkey appears exactly once
    val nCust = c.select("c_custkey").distinct().count()
    val nOrderCust = o.select("o_custkey").distinct().count()
    val keys = full.select("custkey")
    assert(keys.distinct().count() === full.count())
    val expectedKeys = c.select(col("c_custkey").as("k"))
      .union(o.select(col("o_custkey").as("k"))).distinct().count()
    assert(full.count() === expectedKeys)
    // side labels partition the output consistently with the inputs
    val sides = full.groupBy("side").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.getOrElse("both", 0L) + sides.getOrElse("customer_only", 0L)
      === nCust)
    assert(sides.getOrElse("both", 0L) + sides.getOrElse("order_only", 0L)
      === nOrderCust)
    // customer_only rows carry n_orders=0 and NULL spend
    val co = full.filter(col("side") === "customer_only")
    assert(co.filter(col("n_orders") =!= 0 || col("spend").isNotNull)
      .count() === 0)
  }

  test("lateral top-3 equals the window-rank formulation and is " +
    "decorrelated (no per-row subquery in the physical plan)") {
    val lat = MoreJoins.joinLateral(spark, sf)
    val c = graft.tables.Tables.customer(spark, sf)
    val n = graft.tables.Tables.nation(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val expected = c.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal"))
      .orderBy(col("n_name"), col("c_acctbal").desc, col("c_name"))
    assert(lat.collect().toSeq === expected.collect().toSeq)
    // decorrelation: runtime plan is window+join, no LateralJoin/subquery
    val plan = planOf(lat)
    assert(!plan.contains("LateralJoin"), plan)
    assert(plan.contains("Window"), plan)
  }
}
