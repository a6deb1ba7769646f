package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Funnel (ordered multi-step conversion) analysis over the events table:
  * signup → click within 24 h of the FIRST signup → purchase within 24 h
  * of that first qualifying click, per user; output is users surviving each
  * step.
  *
  * Scale shape: each step is a keyed aggregation (min event time) plus an
  * equi-join on user_id against the previous step's survivors — three
  * linear shuffles, survivor sets shrink monotonically, no window over the
  * whole event stream and no per-user event-list collection. Exact nanos
  * (`ts_ns`) are compared so step boundaries cannot drift through the
  * micros-truncated timestamp column.
  */
object Funnel {
  type Q = (SparkSession, String) => DataFrame

  private val DayNs = 86400L * 1000000000L

  /** Users' first qualifying time for `step`, bounded to [prev, prev+24h). */
  private def stepTimes(events: DataFrame, step: String,
                        prev: DataFrame): DataFrame =
    events.filter(col("event_type") === step)
      .join(prev, Seq("user_id"))
      .filter(col("ts_ns") >= col("t") && col("ts_ns") < col("t") + DayNs)
      .groupBy("user_id")
      .agg(min(col("ts_ns")).as("t"))

  def funnelConversion(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
      col("ts_ns"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_ns")).as("t"))
    val s2 = stepTimes(ev, "click", s1)
    val s3 = stepTimes(ev, "purchase", s2)
    // step labels carry an ordering prefix so the output sort is total
    // and engine-independent
    def count1(df: DataFrame, label: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(label).as("step"),
        col("n_users"))
    count1(s1, "1_signup")
      .unionAll(count1(s2, "2_click_24h"))
      .unionAll(count1(s3, "3_purchase_24h"))
      .orderBy("step")
  }

  val queries: Map[String, Q] = Map(
    "q_funnel_conversion" -> funnelConversion _,
  )

  val oracle: Map[String, String] = Map(
    "q_funnel_conversion" ->
      """WITH s1 AS (SELECT user_id, min(epoch_ns(ts)) AS t
                     FROM events WHERE event_type = 'signup'
                     GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t
                FROM events e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click'
                  AND epoch_ns(e.ts) >= s1.t
                  AND epoch_ns(e.ts) < s1.t + 86400000000000
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(epoch_ns(e.ts)) AS t
                FROM events e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase'
                  AND epoch_ns(e.ts) >= s2.t
                  AND epoch_ns(e.ts) < s2.t + 86400000000000
                GROUP BY e.user_id)
         SELECT step, n_users FROM (
           SELECT '1_signup' AS step, CAST(count(1) AS BIGINT) AS n_users
           FROM s1
           UNION ALL
           SELECT '2_click_24h', CAST(count(1) AS BIGINT) FROM s2
           UNION ALL
           SELECT '3_purchase_24h', CAST(count(1) AS BIGINT) FROM s3)
         ORDER BY step""",
  )
}
