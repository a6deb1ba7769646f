package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("grid-bucketed overlap join == naive theta join (differential)") {
    val got = IntervalJoin.intervalJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sorted
    val epoch = lit("1970-01-01").cast("date")
    val a = Tables.orders(spark, sf).filter($"o_totalprice" > 498000)
      .select($"o_orderkey",
        datediff($"o_orderdate".cast("date"), epoch).as("a_s"))
      .withColumn("a_e", $"a_s" + lit(7))
    val b = Tables.lineitem(spark, sf).filter($"l_quantity" >= 48)
      .select($"l_orderkey", $"l_linenumber",
        datediff($"l_shipdate".cast("date"), epoch).as("b_s"),
        ($"l_quantity".cast("int") % 7 + 3).as("dur"))
      .withColumn("b_e", $"b_s" + $"dur")
    val want = a.join(b, $"a_s" <= $"b_e" && $"b_s" <= $"a_e")
      .select($"o_orderkey", $"l_orderkey", $"l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      .sorted
    // multiset compare: the owner-cell trick must emit each pair ONCE
    assert(got == want && got.nonEmpty)
  }

  test("plan is an equi-join on the day cell, not a nested loop") {
    val plan = planOf(IntervalJoin.intervalJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
