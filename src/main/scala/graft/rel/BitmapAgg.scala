package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** EXACT distinct counting via fixed-size bitmaps — the
  * re-aggregatable alternative to `count(DISTINCT ...)` for pipelines
  * that maintain rollups incrementally: a `count(DISTINCT)` partial
  * cannot be merged with tomorrow's batch, but a bitmap partial can
  * (bitwise OR), which is why warehouse rollup tables store bitmaps.
  * Spark 4 ships the primitives (`bitmap_bucket_number` /
  * `bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_count`),
  * and this query is the canonical two-level plan over them.
  *
  * Scale shape: level 1 groups by (group, bucket) — each bucket covers
  * 32768 ids so the per-group state is a fixed 4 KB bitmap, built with
  * map-side partial aggregation (bitmaps OR-combine before the
  * exchange); level 2 sums the per-bucket cardinalities per group.
  * Both levels are keyed shuffles with bounded state — unlike
  * `count(DISTINCT)`, which Spark plans as an expand + two exchanges
  * carrying every distinct value. The exactness contract is proven by
  * the `count(DISTINCT)` DuckDB oracle on every gate run. */
object BitmapAgg {
  type Q = (SparkSession, String) => DataFrame

  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        expr("bitmap_bucket_number(o_custkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
        .as("bm"))
      .groupBy("o_orderpriority")
      .agg(sum(expr("bitmap_count(bm)")).as("n_cust"))
      .orderBy("o_orderpriority")

  val queries: Map[String, Q] =
    Map("q_agg_bitmap_distinct" -> bitmapDistinct _)

  val oracle: Map[String, String] = Map(
    "q_agg_bitmap_distinct" ->
      """SELECT o_orderpriority,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
}
