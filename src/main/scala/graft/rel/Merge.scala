package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** CDC MERGE apply (upsert/delete): fold a changelog into a snapshot with
  * the three MERGE branches — matched+update, matched+delete,
  * not-matched+insert — as one full-outer join. The reference repo has no
  * mutable-table story (north-star extension); this is the batch apply
  * step every training-corpus refresh pipeline runs (Delta/Iceberg MERGE
  * executes the same logical shape before its file rewrite).
  *
  * Testbed wiring: the "table" is the even-key half of customer, the
  * changelog is the LATEST order per customer (o_orderstatus = 'F' means
  * delete, anything else upserts the account balance to that order's
  * total). Odd-key customers with orders exercise the insert branch;
  * even-key customers without a changelog row exercise keep.
  *
  * Scale shape: changelog compaction is one keyed window (latest-wins —
  * same core as Dedup.keepLatest); the merge itself is a single
  * full-outer sort-merge join on the table key. No broadcast (both sides
  * are table-sized), no driver state; AQE splits a skewed key. At 100 TB
  * the join key would also be the table's partition/bucket key so the
  * SMJ degenerates to a co-located zip per bucket.
  */
object Merge {
  type Q = (SparkSession, String) => DataFrame

  /** Latest changelog row per key: op ('D' for final/closed orders, 'U'
    * otherwise) + the new balance payload. */
  def changelog(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("k"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
        col("o_totalprice").as("bal"))
  }

  /** MERGE the compacted changelog into the snapshot. Emits the post-merge
    * table with the branch that produced each row; deletes (matched + 'D')
    * and no-op deletes (unmatched + 'D') vanish. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val snap = Tables.customer(s, d)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
    val chg = changelog(s, d)
    snap.join(chg, col("c_custkey") === col("k"), "full_outer")
      .withColumn("action",
        when(col("c_custkey").isNotNull && col("op") === "D", "delete")
          .when(col("c_custkey").isNotNull && col("op") === "U", "update")
          .when(col("c_custkey").isNotNull, "keep")
          .when(col("op") === "U", "insert"))
      .filter(col("action").isin("update", "keep", "insert"))
      .select(
        coalesce(col("c_custkey"), col("k")).as("c_custkey"),
        // +1e-6 round-boundary epsilon (repo convention, both engines)
        round(when(col("op") === "U", col("bal"))
          .otherwise(col("c_acctbal")) + lit(1e-6), 2).as("c_acctbal"),
        col("action"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------- incremental CDC apply --

  /** The running CDC table as (k, bal, op, d, okey): op='U' live row /
    * 'D' tombstone, (d, okey) = version of the writing change. Snapshot
    * rows enter at a sentinel version so any real change outranks them.
    * The sentinel is TIMESTAMP_NTZ to match o_orderdate's parquet type
    * exactly — a plain-TIMESTAMP sentinel would make every applyBatch
    * union coerce the NTZ changelog column through the session timezone,
    * and a DST fold could reorder wall-clock-ordered versions. */
  def initialTable(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        lit("U").as("op"),
        to_timestamp_ntz(lit("1900-01-01")).as("d"), lit(-1L).as("okey"))

  /** One orders slice as changelog rows (uncompacted — applyBatch's
    * window compacts). */
  def changelogRows(orders: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("k"),
      when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"),
      col("o_totalprice").as("bal"),
      col("o_orderdate").as("d"), col("o_orderkey").as("okey"))

  /** Incremental CDC apply: fold one changelog batch into the running
    * table — the highest (d, okey) version wins per key, and deletes
    * persist as TOMBSTONES so an out-of-order older upsert cannot
    * resurrect a deleted row. Because the winner is the global max
    * version, folding batches in ANY arrival order converges to the
    * same table as the one-shot batch MERGE — MergeStreamSpec proves
    * exactly that through a foreachBatch stream with shuffled batches.
    * This is the micro-batch half of the Delta/Iceberg streaming-upsert
    * sink (minus the file rewrite). */
  def applyBatch(table: DataFrame, batch: DataFrame): DataFrame = {
    val w = Window.partitionBy("k")
      .orderBy(col("d").desc, col("okey").desc)
    table.unionByName(batch)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Live rows of the running table in the mergeUpsert output shape. */
  def liveRows(table: DataFrame): DataFrame =
    table.filter(col("op") === "U")
      .select(col("k").as("c_custkey"),
        round(col("bal") + lit(1e-6), 2).as("c_acctbal"))
      .orderBy("c_custkey")

  val queries: Map[String, Q] = Map(
    "q_merge_upsert" -> mergeUpsert _,
  )

  val oracle: Map[String, String] = Map(
    "q_merge_upsert" ->
      """WITH snap AS (
           SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 2 = 0),
         chg AS (
           SELECT o_custkey AS k,
                  CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
                  o_totalprice AS bal
           FROM orders
           QUALIFY row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) = 1),
         m AS (
           SELECT coalesce(s.c_custkey, c.k) AS c_custkey,
                  CASE WHEN s.c_custkey IS NOT NULL AND c.op = 'D' THEN 'delete'
                       WHEN s.c_custkey IS NOT NULL AND c.op = 'U' THEN 'update'
                       WHEN s.c_custkey IS NOT NULL THEN 'keep'
                       WHEN c.op = 'U' THEN 'insert' END AS action,
                  CASE WHEN c.op = 'U' THEN c.bal ELSE s.c_acctbal END AS bal
           FROM snap s FULL OUTER JOIN chg c ON s.c_custkey = c.k)
         SELECT c_custkey, round(bal + 1e-6, 2) AS c_acctbal, action
         FROM m WHERE action IN ('update', 'keep', 'insert')
         ORDER BY c_custkey""",
  )
}
