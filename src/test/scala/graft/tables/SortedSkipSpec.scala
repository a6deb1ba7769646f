package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Row-group skipping through the sort-clustered layout — and the
  * measured NTZ gap that shaped it (see Sorted's scaladoc). */
class SortedSkipSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect() // metrics exist only after execution
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  test("date-band predicate skips row groups on the sorted layout") {
    val total = Tables.lineitem(spark, sf).count()
    val sorted = spark.read.parquet(Sorted.fixture(spark, sf))
      .filter(col("ship_day") >= lit("1996-06-01").cast("date") &&
        col("ship_day") < lit("1996-07-01").cast("date"))
    val matching = sorted.count()
    assert(matching > 0, "probe month is empty — fixture window drifted")

    val plan = sorted.queryExecution.executedPlan.collectLeaves().head.toString
    assert(plan.contains("PushedFilters") && plan.contains("ship_day"), plan)

    val read = scanOutputRows(sorted)
    // 1 month of ~84 falls in at most 2 of the 8 date bands; DATE stats
    // skip at row-group (here: whole-file) granularity
    assert(read * 3 < total, s"scan read $read of $total — no skipping")
    assert(read >= matching, "scan cannot output fewer rows than match")
  }

  test("NTZ-timestamp predicate on the SAME files reads everything (pin)") {
    // Spark 4.1: the NTZ filter shows under PushedFilters and the files
    // have valid min/max stats, but no parquet-level predicate is built
    // for TIMESTAMP_NTZ — measured 6000/6000 read at sf0.001. This pin
    // documents WHY the cluster key is a DATE; if a Spark upgrade makes
    // this fail, NTZ pushdown got fixed — simplify the layout then.
    val total = Tables.lineitem(spark, sf).count()
    val viaNtz = spark.read.parquet(Sorted.fixture(spark, sf))
      .filter(col("l_shipdate") >=
          lit("1996-06-01 00:00:00").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-07-01 00:00:00").cast("timestamp_ntz"))
    val read = scanOutputRows(viaNtz)
    assert(read > total / 2,
      s"NTZ scan read only $read of $total — NTZ pushdown now works; " +
        "update Sorted's layout notes")
  }

  test("sort-clustered rewrite is content-preserving for the query") {
    val viaSorted = Sorted.scanSortedSkip(spark, sf).collect().toSeq
    val viaPlain = Tables.lineitem(spark, sf)
      .filter(to_date(col("l_shipdate")) >= lit("1996-06-01").cast("date") &&
        to_date(col("l_shipdate")) < lit("1996-07-01").cast("date"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")) + lit(1e-6), 2).as("sum_price"))
      .orderBy("l_returnflag").collect().toSeq
    assert(viaSorted == viaPlain)
  }
}
