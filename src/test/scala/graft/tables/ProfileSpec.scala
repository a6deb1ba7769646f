package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {

  test("profile report: counts reconcile, formatting is fixed-precision") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val rows = Profile.profileTable(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[Long]("n_rows") == n))
    // this testbed has no nulls; the profiler must agree
    assert(rows.forall(_.getAs[Long]("n_null") == 0L))
    // primary key cardinality == row count
    val pk = rows.find(_.getString(0) == "o_orderkey").get
    assert(pk.getAs[Long]("n_distinct") == n)
    // fixed-precision formatting, not shortest-round-trip
    val price = rows.find(_.getString(0) == "o_totalprice").get
    assert(price.getAs[String]("min_s").matches("""\d+\.\d{4}"""))
    val date = rows.find(_.getString(0) == "o_orderdate").get
    assert(date.getAs[String]("max_s")
      .matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"""))
    // min really is min: spot-check against a direct aggregate
    val wantMin = orders.agg(min("o_custkey")).head.getLong(0)
    val ck = rows.find(_.getString(0) == "o_custkey").get
    assert(ck.getAs[String]("min_s") == wantMin.toString)
  }

  test("profile is one scan: multi-distinct plans via a single Expand") {
    val df = Profile.profileTable(spark, sf)
    df.collect()
    // count scans in the final plan only (AQE prints initial+final)
    val plan = planOf(df).split("== Initial Plan ==")(0)
    assert(plan.contains("Expand"), plan)
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected exactly one table scan\n$plan")
  }
}
