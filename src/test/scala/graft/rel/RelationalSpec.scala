package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows on sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("scan pushes filter and prunes columns at the parquet scan") {
    val plan = formattedPlan(Relational.scanProjectFilter(spark, sf))
    assert(plan.contains("PushedFilters:") && plan.contains("l_shipdate"),
      s"expected shipdate pushdown in:\n$plan")
    // projection pruned to the 4 selected + filter column
    assert(!plan.contains("l_comment") && !plan.contains("l_returnflag"))
  }

  test("dim join broadcasts the small side") {
    val plan = planOf(Relational.joinBroadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("rollup/cube/grouping-sets have expected group structure") {
    val rollup = Relational.aggRollup(spark, sf).collect()
    // grand total + per-region + per-(region,nation)
    assert(rollup.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
    val cube = Relational.aggCube(spark, sf).collect()
    assert(cube.count(r => r.isNullAt(0) && r.isNullAt(1)) == 1)
  }

  test("anti and semi partition customers") {
    val semi = Relational.joinSemi(spark, sf).count()
    val anti = Relational.joinAnti(spark, sf).count()
    assert(semi > 0 && anti > 0)
  }

  test("q1 aggregate matches a hand-computed invariant") {
    val rows = Relational.aggHash(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = graft.tables.Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'1998-09-02 00:00:00'").count()
    assert(total == liCount)
  }

  test("tpch q1: full 8-aggregate summary over the flag/status groups") {
    val rows = Relational.sqlTpchQ1(spark, sf).collect()
    assert(rows.length == 6)   // 3 returnflags × 2 linestatus
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = graft.tables.Tables.lineitem(spark, sf)
      .filter("l_shipdate <= timestamp'2000-09-02 00:00:00'").count()
    assert(total == liCount)
    // avg_qty must equal sum_qty / count_order within rounding slack
    rows.foreach { r =>
      val implied = r.getAs[Double]("sum_qty") / r.getAs[Long]("count_order")
      assert(math.abs(implied - r.getAs[Double]("avg_qty")) < 1e-2)
    }
  }

  test("tpch q10: top-20 returned-item revenue, descending and distinct") {
    val rows = Relational.sqlTpchQ10(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val rev = rows.map(_.getAs[Double]("revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
    val keys = rows.map(_.getAs[Long]("c_custkey"))
    assert(keys.distinct.length == keys.length)
  }

  test("modeBy: exact mode with deterministic larger-value tie-break") {
    import spark.implicits._
    // group a: 7 is the clear mode; group b: 3 and 9 tie at 2 → pick 9
    val df = Seq(("a", 7), ("a", 7), ("a", 1),
      ("b", 3), ("b", 3), ("b", 9), ("b", 9), ("b", 1))
      .toDF("g", "v")
    val out = Relational.modeBy(df, col("g"), col("v"))
      .orderBy("k").as[(String, Int, Long)].collect()
    assert(out.toSeq == Seq(("a", 7, 2L), ("b", 9, 2L)))
    // no window in the plan: both stages are hash aggregates, so the
    // per-group work stays partial-aggregable at scale
    val plan = planOf(Relational.modeBy(df, col("g"), col("v")))
    assert(!plan.contains("Window"), plan)
  }

  test("mode over lineitem agrees with an independent count ranking") {
    val out = Relational.aggMode(spark, sf)
    val counts = graft.tables.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), month(col("l_shipdate")).as("m"))
      .count()
    val best = counts.groupBy("l_returnflag").agg(max("count").as("mx"))
    val mism = out.join(best, Seq("l_returnflag"))
      .filter(col("mode_n") =!= col("mx"))
    assert(mism.count() == 0)
  }

  test("eqdepth: 10 near-equal buckets, contiguous non-overlapping ranges") {
    val rows = Relational.aggEqDepth(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    val total = rows.map(_.getLong(1)).sum
    // depth within ±2% of n/10 (bound ties all go low, so not exact)
    rows.foreach { r =>
      assert(math.abs(r.getLong(1) - total / 10.0) <= total * 0.02,
        s"bucket ${r.getInt(0)} depth ${r.getLong(1)} vs ${total / 10.0}")
    }
    // ranges ordered: bucket k's max <= bucket k+1's min
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
    }
    // assignment never sorts the table: the bounds side is broadcast
    val plan = planOf(Relational.aggEqDepth(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"))
    // no Window operator: ranking never global-sorts the table
    assert(!plan.contains("Window"))
  }
}
