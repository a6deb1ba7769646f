package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- range join --

  test("bucketed range join == direct inequality join (differential)") {
    val got = Temporal.rangeJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val promos = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 495000)
      .select($"o_orderkey", $"o_orderdate".as("start_ts"),
        expr("o_orderdate + INTERVAL 7 DAYS").as("end_ts"))
    val want = promos
      .join(Tables.lineitem(spark, sf),
        $"l_shipdate" >= $"start_ts" && $"l_shipdate" < $"end_ts")
      .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want && got.nonEmpty)
  }

  test("range join plan is an equi-join on the day bucket, not a nested loop") {
    val plan = planOf(Temporal.rangeJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  // ---------------------------------------------------------------- scd2 --

  private val OpenEnd = 253402214400000000L // 9999-12-31 UTC in micros

  private def changelog(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("k", "st", "ts_us", "tie")
      .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")

  private def runs(rows: Seq[(Long, String, Long, Long)]) =
    Temporal.buildScd2(changelog(rows), "k", "st", "ts", "tie")
      .orderBy("k", "valid_from_us")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSeq

  test("consecutive equal statuses collapse into one run") {
    val got = runs(Seq(
      (1L, "A", 100L, 1L), (1L, "A", 200L, 2L), (1L, "B", 300L, 3L),
      (1L, "A", 400L, 4L)))
    assert(got == Seq(
      (1L, "A", 100L, 300L), (1L, "B", 300L, 400L), (1L, "A", 400L, OpenEnd)))
  }

  test("single-row and single-status keys produce one open-ended run") {
    val got = runs(Seq((1L, "A", 100L, 1L),
      (2L, "B", 50L, 2L), (2L, "B", 90L, 3L)))
    assert(got == Seq((1L, "A", 100L, OpenEnd), (2L, "B", 50L, OpenEnd)))
  }

  test("same-timestamp changes order by the tie column") {
    val got = runs(Seq((1L, "B", 100L, 2L), (1L, "A", 100L, 1L)))
    assert(got == Seq((1L, "A", 100L, 100L), (1L, "B", 100L, OpenEnd)))
  }

  test("sf0.001 scd2: ranges tile per customer and never overlap") {
    val df = Temporal.scd2(spark, sf)
    // ranges never invert; zero-length [t, t) is legitimate — a status
    // superseded within the same timestamp granularity (see the
    // same-timestamp hand test above)
    assert(df.filter($"valid_from_us" > $"valid_to_us").count() == 0)
    // ranges tile: each run's valid_to equals the next run's valid_from,
    // and exactly one open-ended row per customer
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("valid_from_us")
    val gaps = df.withColumn("nxt", lead($"valid_from_us", 1).over(w))
      .filter($"nxt".isNotNull && $"nxt" =!= $"valid_to_us").count()
    assert(gaps == 0)
    val open = df.filter($"valid_to_us" === OpenEnd)
      .groupBy("o_custkey").count().filter($"count" =!= 1).count()
    assert(open == 0)
  }
}
