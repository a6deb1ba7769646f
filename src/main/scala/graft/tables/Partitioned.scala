package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout: the 100 TB table organization where a
  * predicate on the partition column prunes whole directories at PLANNING
  * time — the scan never opens a pruned partition's files (PartitionCount
  * in the scan node, asserted in PartitionedScanSpec). Complements
  * DynamicPruningSpec, which covers the RUNTIME variant (dim-filter →
  * fact-partition pruning through a join).
  *
  * The fixture partitions orders by order year — a low-cardinality,
  * monotone column is what you'd partition a fact table by in practice
  * (time-based ingest). Written once per sf dir, cached in tmpdir.
  */
object Partitioned {
  type Q = (SparkSession, String) => DataFrame

  /** One-time partitioned rewrite of the sf dir's orders table. */
  def fixture(s: SparkSession, sfDir: String): String =
    Fixtures.cached("part", "orders_by_year", sfDir) { dir =>
      Tables.orders(s, sfDir)
        .withColumn("yr", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("yr").parquet(dir.toString)
    }()

  /** Monthly order counts + revenue for one year, read through the
    * partitioned layout — the planner prunes every other year's
    * directory before any file I/O. Oracle computes the same from the
    * unpartitioned orders table. */
  def scanPartitionPruned(s: SparkSession, d: String): DataFrame =
    Tables.readParquet(s, fixture(s, d))
      .filter(col("yr") === 1995)
      .groupBy(month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        // +1e-6 round-boundary epsilon, both engines (repo convention)
        round(sum(col("o_totalprice")) + lit(1e-6), 2).as("revenue"))
      .orderBy("mo")

  val queries: Map[String, Q] = Map(
    "q_scan_partition_pruned" -> scanPartitionPruned _,
  )

  val oracle: Map[String, String] = Map(
    "q_scan_partition_pruned" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS mo,
                CAST(count(1) AS BIGINT) AS n_orders,
                round(sum(o_totalprice) + 1e-6, 2) AS revenue
         FROM orders WHERE year(o_orderdate) = 1995
         GROUP BY mo ORDER BY mo""",
  )
}
