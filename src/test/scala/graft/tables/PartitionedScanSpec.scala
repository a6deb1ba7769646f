package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Static partition pruning through the Hive-style layout: the year
  * filter must reach the scan as a PartitionFilter and cut PartitionCount
  * — directory-level pruning, zero I/O on pruned years. */
class PartitionedScanSpec extends SparkSpec {

  test("partition filter prunes directories at planning time") {
    val path = Partitioned.fixture(spark, sf)
    val all = spark.read.parquet(path)
    val years = all.select("yr").distinct().count()
    assert(years > 1, s"fixture has $years year partitions — no pruning possible")

    val pruned = all.filter(col("yr") === 1995)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("1995"), scan)
    // planner-visible partition count must be 1 of the >1 years
    val cntRe = "PartitionCount: (\\d+)".r
    cntRe.findFirstMatchIn(
      pruned.queryExecution.executedPlan.toString) match {
      case Some(m) => assert(m.group(1).toInt == 1, m.matched)
      case None    => // formatting differs across versions; filters asserted above
    }
  }

  test("partitioned read equals unpartitioned read for the same predicate") {
    val path = Partitioned.fixture(spark, sf)
    val viaPart = spark.read.parquet(path)
      .filter(col("yr") === 1995).agg(count(lit(1))).head().getLong(0)
    val viaPlain = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate")) === 1995)
      .agg(count(lit(1))).head().getLong(0)
    assert(viaPart == viaPlain && viaPart > 0)
  }
}
