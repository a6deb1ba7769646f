package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** The 12 remaining TPC-H shapes (TpchDeep). Two layers per interesting
  * query: an independent DataFrame re-derivation of the same quantity
  * (the DuckDB oracle then re-proves text-level parity at sf0.01), and a
  * plan assertion that the correlated subqueries DECORRELATED — a
  * surviving per-row subquery would plan as a nested loop, the one shape
  * that cannot survive 100 TB. */
class TpchDeepSpec extends SparkSpec {

  private def assertNoLoops(name: String): Unit = {
    val plan = planOf(TpchDeep.queries(name)(spark, sf))
    assert(!plan.contains("CartesianProduct"), s"$name: ${plan.take(1500)}")
    // BroadcastNestedLoopJoin appears when decorrelation fails and the
    // rewrite falls back to a join with no extractable equi-condition
    assert(!plan.contains("NestedLoop"), s"$name: ${plan.take(1500)}")
  }

  test("q2/q17/q20/q21: correlated subqueries decorrelate to equi-joins") {
    Seq("q_sql_tpch_q2", "q_sql_tpch_q17", "q_sql_tpch_q20",
      "q_sql_tpch_q21").foreach(assertNoLoops)
  }

  test("tpch q2: every returned supplier hits its part's min unit cost") {
    val rows = TpchDeep.queries("q_sql_tpch_q2")(spark, sf).collect()
    assert(rows.nonEmpty)
    // independent derivation: window-min over the same supply relation
    val li = Tables.lineitem(spark, sf)
    val supply = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("uc"))
    val eur = supply
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val minPerPart = eur.groupBy(col("l_partkey").as("pk"))
      .agg(min(col("uc")).as("min_uc"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      val uc = r.getAs[Double]("unit_cost")
      assert(math.abs(uc - minPerPart(pk)) < 1e-2,
        s"part $pk: returned $uc, true min ${minPerPart(pk)}")
    }
  }

  test("tpch q13: the count distribution partitions every customer") {
    val rows = TpchDeep.queries("q_sql_tpch_q13")(spark, sf).collect()
    val totalCustomers = rows.map(_.getAs[Long]("custdist")).sum
    assert(totalCustomers == Tables.customer(spark, sf).count(),
      "histogram must cover each customer exactly once (LEFT join keeps " +
        "zero-order customers; an inner join here would drop them)")
    // and the weighted count must equal the non-urgent order total
    val weighted = rows.map(r =>
      r.getAs[Int]("c_count").toLong * r.getAs[Long]("custdist")).sum
    val nonUrgent = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(weighted == nonUrgent)
  }

  test("tpch q15: returned supplier(s) carry the window's max revenue") {
    val rows = TpchDeep.queries("q_sql_tpch_q15")(spark, sf).collect()
    assert(rows.nonEmpty)
    val rev = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("tr"))
    val trueMax = rev.agg(max(col("tr"))).head().getDouble(0)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("total_revenue") - trueMax) < 1e-2)
    }
  }

  test("tpch q17: revenue equals the join-side derivation") {
    val rows = TpchDeep.queries("q_sql_tpch_q17")(spark, sf).collect()
    assert(rows.length == 1)
    val li = Tables.lineitem(spark, sf)
    val avgPerPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(avg(col("l_quantity")).as("avg_qty"))
    val expectedRow = li
      .join(Tables.part(spark, sf).filter(
        col("p_brand") === "Brand#3" && col("p_type") === "MEDIUM"),
        col("l_partkey") === col("p_partkey"))
      .join(avgPerPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg(sum(col("l_extendedprice")) / 7.0)
      .head()
    // sf0.001 has no qualifying line (sum over ∅ = NULL); both sides must
    // agree on the empty case, not just the happy path
    if (expectedRow.isNullAt(0))
      assert(rows.head.isNullAt(rows.head.fieldIndex("avg_yearly")))
    else
      assert(math.abs(rows.head.getAs[Double]("avg_yearly") -
        expectedRow.getDouble(0)) < 1e-2)
  }

  test("tpch q21: qualifying lines are sole-late-supplier on shared orders") {
    val numwait = TpchDeep.queries("q_sql_tpch_q21")(spark, sf).collect()
      .map(_.getAs[Long]("numwait")).sum
    // independent derivation: per-order supplier/late-supplier profiles
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
    val lines = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
          .cast("int"))
    val profile = lines.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late") === 1, col("l_suppkey"))).as("n_late"))
    val saudi = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_11"),
        col("s_nationkey") === col("n_nationkey"))
    val expected = lines.filter(col("late") === 1)
      .join(saudi, col("l_suppkey") === col("s_suppkey"))
      .join(profile, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .count()
    assert(numwait == expected,
      s"q21 numwait $numwait != profile-derived $expected")
  }

  test("tpch q22: every counted customer clears the global threshold") {
    val rows = TpchDeep.queries("q_sql_tpch_q22")(spark, sf).collect()
    assert(rows.nonEmpty)
    val c = Tables.customer(spark, sf)
      .withColumn("code", substring(col("c_name"), 18, 1))
    val codes = Seq("1", "2", "3", "4", "5", "6", "7")
    val threshold = c
      .filter(col("c_acctbal") > 0 && col("code").isin(codes: _*))
      .agg(avg(col("c_acctbal"))).head().getDouble(0)
    val inactive = c.filter(col("code").isin(codes: _*) &&
        col("c_acctbal") > threshold)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
    assert(rows.map(_.getAs[Long]("numcust")).sum == inactive.count())
  }

  test("tpch q8: market share is a ratio in [0, 1]") {
    val rows = TpchDeep.queries("q_sql_tpch_q8")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0 && share <= 1, s"mkt_share $share")
    }
  }

  test("tpch q11: every surviving part clears the global-fraction bar") {
    val rows = TpchDeep.queries("q_sql_tpch_q11")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPart = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("v"))
    val bar = byPart.agg(avg(col("v")) * 1.25).head().getDouble(0)
    rows.foreach { r =>
      assert(r.getAs[Double]("value") > bar - 1e-2)
    }
    // and nothing above the bar is missing
    assert(rows.length == byPart.filter(col("v") > bar).count())
  }
}
