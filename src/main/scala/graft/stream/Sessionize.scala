package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** BATCH sessionization — the offline twin of the streaming
  * session-window query (`Events.sessionWindows`): split each user's
  * event log into sessions at inactivity gaps > 30 min, then emit
  * per-session stats. This is the log-replay form every pipeline needs
  * when backfilling session features over historical data, where
  * Structured Streaming's session windows don't apply.
  *
  * Semantics are deterministic under timestamp ties: the break flags
  * depend only on consecutive DIFFS of the per-user sorted timestamp
  * multiset, which is invariant to how equal timestamps are ordered —
  * so no tiebreak column is needed and the DuckDB oracle (the same two
  * windows in SQL) matches bit-exactly. All outputs are exact integers
  * (counts + epoch-microsecond bounds/durations).
  *
  * Scale shape: two windows over ONE shuffle — both partition by
  * user_id (lag to flag breaks, running sum to number sessions), so
  * Spark plans a single hash-partition exchange + one sort feeding
  * both, then the session agg is keyed on (user, session) which is a
  * prefix-refinement of the same partitioning — no second shuffle of
  * the raw events. Per-user state in the window is O(1) (running sum);
  * parallelism = |users|, the natural key of the workload. */
object Sessionize {
  type Q = (SparkSession, String) => DataFrame

  /** Inactivity gap that closes a session, in microseconds (30 min). */
  val GapUs = 1800000000L

  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("us")
    Tables.events(s, d)
      .select(col("user_id"), expr("ts_ns div 1000").as("us"))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(byUser) > GapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(byUser))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_events"),
        min(col("us")).as("start_us"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "sid")
  }

  val queries: Map[String, Q] = Map("q_sessionize" -> sessionize _)

  val oracle: Map[String, String] = Map(
    "q_sessionize" ->
      s"""WITH e AS (
           SELECT user_id, epoch_us(ts) AS us FROM events),
         f AS (
           SELECT user_id, us,
                  CASE WHEN us - lag(us) OVER
                         (PARTITION BY user_id ORDER BY us) > $GapUs
                       THEN 1 ELSE 0 END AS brk
           FROM e),
         g AS (
           SELECT user_id, us,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY us
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM f)
         SELECT user_id, CAST(sid AS BIGINT) AS sid,
                CAST(count(*) AS BIGINT) AS n_events,
                min(us) AS start_us,
                max(us) - min(us) AS duration_us
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, sid""")
}
