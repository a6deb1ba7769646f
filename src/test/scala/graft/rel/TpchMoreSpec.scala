package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Round-7 TPC-H additions (Q4/Q6/Q12/Q14/Q19 shapes). Each test checks
  * the SQL result against an independently-derived DataFrame computation
  * of the same quantity — the oracle gate then re-proves it against
  * DuckDB at sf0.01. */
class TpchMoreSpec extends SparkSpec {

  test("tpch q6: scalar revenue equals the DataFrame-side computation") {
    val rows = Relational.sqlTpchQ6(spark, sf).collect()
    assert(rows.length == 1)
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount")))
      .head().getDouble(0)
    assert(math.abs(rows.head.getAs[Double]("revenue") - expected) < 1e-2)
    // the predicates must reach the scan as pushed filters (nonempty —
    // a bare "PushedFilters: []" would pass a substring check) … though
    // note SortedSkipSpec's pin: pushed NTZ timestamp filters display
    // here but build no parquet-level predicate; the numeric ones do
    val plan = formattedPlan(Relational.sqlTpchQ6(spark, sf))
    assert(plan.contains("LessThan(l_quantity") &&
      plan.contains("GreaterThanOrEqual(l_discount"), plan.take(2000))
  }

  test("tpch q4: per-priority counts total the late-order set exactly") {
    val rows = Relational.sqlTpchQ4(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val total = rows.map(_.getAs[Long]("order_count")).sum
    // independent derivation: semi join spelled as distinct-key inner join
    val o = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val lateKeys = Tables.lineitem(spark, sf)
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .select("l_orderkey").distinct()
    assert(total == lateKeys.count())
  }

  test("tpch q12: late/ontime priority counts partition the window") {
    val rows = Relational.sqlTpchQ12(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 2)
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val window = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    // every windowed lineitem has exactly one order (FK): the CASE split
    // must account for each of them exactly once
    assert(total == window.count())
  }

  test("tpch q14: promo revenue is a percentage in (0, 100)") {
    val rows = Relational.sqlTpchQ14(spark, sf).collect()
    assert(rows.length == 1)
    val pct = rows.head.getAs[Double]("promo_revenue")
    assert(pct > 0 && pct < 100, s"promo_revenue $pct")
    // p_type is uniform over 6 values → the ratio should be loosely
    // around 1/6th; a wildly-off value means the CASE sides diverged
    assert(pct > 2 && pct < 50, s"promo_revenue $pct implausible")
  }

  test("tpch q19: disjunctive-predicate join still plans as an equi-join") {
    val df = Relational.sqlTpchQ19(spark, sf)
    val rows = df.collect()
    assert(rows.length == 1)
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(rows.head.getAs[Double]("revenue") - expected) < 1e-2)
    // the common key must be extracted from the OR — a nested-loop plan
    // here would be quadratic at scale
    val plan = planOf(df)
    assert(!plan.contains("NestedLoop"), plan.take(2000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(2000))
  }
}
