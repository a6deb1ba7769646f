package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Incremental rollup maintenance: the algebraic-merge contract that
  * makes a 100 TB rollup updatable without rescanning history. The
  * query SIMULATES the real pipeline shape — yesterday's partial
  * aggregate frame (events before the cutover) merged with today's
  * batch partial (events after) — and the oracle computes the same
  * rollup from the full stream in one pass: hash equality IS the
  * algebraic-merge proof (count/sum merge by +, max by max). Only
  * algebraic aggregates appear; a non-mergeable statistic
  * (count(DISTINCT), exact median) must route through the mergeable
  * sketches instead (q_agg_bitmap_distinct / q_agg_hll — that is what
  * they exist for).
  *
  * Scale shape: each partial is one keyed agg over its slice; the
  * merge is a keyed agg over the UNION of partial frames — user-sized,
  * not event-sized. In production the "old" side is a stored table, so
  * the day's cost is the new slice's scan plus a user-sized merge. */
object Incremental {
  type Q = (SparkSession, String) => DataFrame

  /** Cutover: mid-January 2024 in epoch microseconds (events span
    * 2024-01-01..30). */
  val CutUs = 1705276800000000L // 2024-01-15T00:00:00Z

  private def partial(ev: DataFrame): DataFrame =
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        max(col("us")).as("last_us"))

  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
    val old = partial(ev.filter(col("us") < CutUs))
    val fresh = partial(ev.filter(col("us") >= CutUs))
    old.unionByName(fresh)
      .groupBy("user_id")
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_purchases")).as("n_purchases"),
        max(col("last_us")).as("last_us"))
      .orderBy("user_id")
  }

  val queries: Map[String, Q] = Map("q_agg_incremental" -> incrementalAgg _)

  val oracle: Map[String, String] = Map(
    // single-pass rollup over the FULL stream — equality proves the
    // split-partial-merge path reconstructs it exactly
    "q_agg_incremental" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                         END) AS BIGINT) AS n_purchases,
                max(epoch_us(ts)) AS last_us
         FROM events GROUP BY user_id ORDER BY user_id""")
}
