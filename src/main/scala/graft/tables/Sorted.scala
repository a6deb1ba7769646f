package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sort-clustered layout: the third physical-layout lever after
  * directory partitioning (Partitioned) and bucketing (Bucketed). A
  * range-partitioned, sorted-within-partitions rewrite gives every
  * parquet row group a narrow min/max band on the cluster column, so a
  * range predicate skips whole row groups at READ time via footer
  * stats — no directory scheme, no bucket metadata, works for any
  * pushdown-able predicate on the cluster column. At 100 TB this is
  * how a time-series fact table makes "one month of seven years" cost
  * one month of I/O; the same mechanism generalizes to multi-column
  * interleavings (Z-order) for multi-predicate skipping.
  *
  * THE CLUSTER COLUMN IS A DERIVED DATE, NOT THE NTZ TIMESTAMP —
  * measured finding (SortedSkipSpec pins it): Spark 4.1 shows a
  * TIMESTAMP_NTZ range predicate under `PushedFilters`, and the files
  * carry valid min/max stats, but no parquet-level filter is built for
  * NTZ columns, so every row group is read (6000/6000 at sf0.001 vs
  * 837/6000 for DATE — exact-match skipping). A date-granular cluster
  * key is also what a time-series layout wants anyway: coarser bands,
  * stable across timezone semantics, and DATE stats skip perfectly.
  *
  * SortedSkipSpec measures both halves: DATE-predicate reads a small
  * fraction; the NTZ-predicate fallback on the same files reads all.
  */
object Sorted {
  type Q = (SparkSession, String) => DataFrame

  /** One-time sort-clustered rewrite of the sf dir's lineitem table:
    * derive `ship_day DATE`, range-partition by it (8 bands), sort
    * within each, write. The global range exchange at write time buys
    * row-group skipping on every later read. */
  def fixture(s: SparkSession, sfDir: String): String =
    Fixtures.cached("sorted2", "lineitem_by_shipday", sfDir) { dir =>
      Tables.lineitem(s, sfDir)
        .withColumn("ship_day", to_date(col("l_shipdate")))
        .repartitionByRange(8, col("ship_day"))
        .sortWithinPartitions("ship_day")
        .write.mode("overwrite").parquet(dir.toString)
    }()

  /** One month of a ~7-year fact table, read through the sort-clustered
    * layout: the ship_day band predicate reaches the scan as a pushed
    * DATE filter and row-group stats exclude every band outside June
    * 1996. Oracle computes the same from the unsorted original — the
    * rewrite must be content-preserving. */
  def scanSortedSkip(s: SparkSession, d: String): DataFrame =
    Tables.readParquet(s, fixture(s, d))
      .filter(col("ship_day") >= lit("1996-06-01").cast("date") &&
        col("ship_day") < lit("1996-07-01").cast("date"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")) + lit(1e-6), 2).as("sum_price"))
      .orderBy("l_returnflag")

  val queries: Map[String, Q] = Map(
    "q_scan_sorted_skip" -> scanSortedSkip _,
  )

  val oracle: Map[String, String] = Map(
    "q_scan_sorted_skip" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_items,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
                round(sum(l_extendedprice) + 1e-6, 2) AS sum_price
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-06-01'
           AND CAST(l_shipdate AS DATE) <  DATE '1996-07-01'
         GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
