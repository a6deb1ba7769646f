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

  test("dq rules reconcile with independent per-rule filters") {
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val rows = Profile.dqRules(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.size == 5 && rows.values.forall(_._1 == n))
    // independent recomputation of each violation count
    assert(rows("price_positive")._2 ==
      orders.filter(!(col("o_totalprice") > 0)).count())
    assert(rows("orderdate_in_window")._2 ==
      orders.filter(!col("o_orderdate")
        .between("1992-01-01", "1998-12-31")).count())
    assert(rows("custkey_references_customer")._2 ==
      orders.join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_anti").count())
    // the window rule genuinely fires on this testbed (dates past 1998)
    assert(rows("orderdate_in_window")._2 > 0)
    assert(rows("status_in_domain")._2 == 0 && rows("custkey_not_null")._2 == 0)
  }

  test("union form == Expand reference form, row for row") {
    val a = Profile.profileTable(spark, sf).collect().toSeq
    val b = Profile.profileTableExpand(spark, sf).collect().toSeq
    assert(a == b, s"union form diverged from Expand reference\n$a\n$b")
  }

  test("union branches are column-pruned; reference form is one Expand scan") {
    // the shipped form: one branch per column, each scanning ONLY its
    // column (total bytes ≈ the wide single scan, minus the Expand's
    // 7x row duplication through the aggregate — 5x faster at sf0.1)
    val plan = planOf(Profile.profileTable(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Expand"), plan)
    val reads = """ReadSchema: struct<[^>]*>""".r.findAllIn(plan).toSeq
    assert(reads.size == 6, s"expected 6 pruned scans\n$plan")
    assert(reads.forall(r => r.count(_ == ':') == 2), // "ReadSchema:" + one field
      s"branch scans must read exactly one column\n$reads")
    // the semantic reference keeps the single-scan Expand shape
    val ref = planOf(Profile.profileTableExpand(spark, sf))
      .split("== Initial Plan ==")(0)
    assert(ref.contains("Expand"), ref)
    assert("FileScan parquet".r.findAllIn(ref).size == 1, ref)
  }
}
