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
}
