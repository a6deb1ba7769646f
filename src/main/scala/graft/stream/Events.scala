package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Event-time windowing — tumbling, sliding, session — written ONCE as
  * plain DataFrame transforms and applied to BOTH the batch events table
  * (DuckDB-oracle'd queries below) and Structured Streaming inputs
  * (StreamingSpec drives the same functions through MemoryStream with
  * watermarks). That stream/batch duality is the Spark-native design: the
  * plan is identical, only the source/sink differ.
  *
  * Scale: all three window shapes shuffle once on (key, window) and use
  * partial aggregation; session windows in streaming keep per-key state
  * bounded by the watermark (late state evicted), the batch twin is a
  * keyed window sort — both skew-safe under AQE.
  */
object Events {
  type Q = (SparkSession, String) => DataFrame

  val SessionGap = expr("INTERVAL 10 MINUTES")

  /** Tumbling 1-hour counts per event_type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // +1e-6 round-boundary epsilon (repo convention, both engines):
        // a float sum landing on a .00005 boundary would otherwise round
        // apart nondeterministically across engines / partition orders
        round(sum(col("value")) + lit(1e-6), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding 1-hour windows every 30 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start_us"),
        col("event_type"), col("n"))

  /** Batch sessionization (gaps-and-islands): a new session starts when the
    * gap from the previous event of the same user is >= the session gap —
    * the same boundary rule as streaming session_window (an event at
    * exactly prev + gap does NOT extend the session). */
  def sessionsBatch(events: DataFrame, gapMinutes: Int = 10): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_us")
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") >= gapUs, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_us",
        col("session_end_us") - col("session_start_us"))
  }

  /** Streaming sessionization via the native session_window operator —
    * used by StreamingSpec to prove stream/batch agreement. */
  def sessionsStreaming(events: DataFrame, gapMinutes: Int = 10): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))

  /** A closed user session. */
  case class UserSession(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Int)
  /** One still-open session run (public: Catalyst's encoder codegen must be
    * able to construct it from generated code). */
  case class OpenSession(start_us: Long, end_us: Long, n: Int)
  /** Per-key state: ALL runs the watermark hasn't sealed yet — more than
    * one can be open when a single batch carries several gap-separated
    * bursts that the watermark still trails. */
  case class SessionState(runs: List[OpenSession])

  /** Event-time micros from a java.sql.Timestamp — millis + the nanos
    * field, matching sessionsBatch's `unix_micros` exactly (getTime alone
    * truncates sub-millisecond precision and would shift boundaries). */
  private def tsMicros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  /** Stateful streaming sessionization via flatMapGroupsWithState +
    * EventTimeTimeout — append-mode emission of CLOSED sessions only (the
    * control `session_window` doesn't give you: custom state, custom
    * emission timing, per-key timeout eviction).
    *
    * Each batch interval-merges the incoming events with every open run.
    * A run is emitted only once `end_us + gap <= watermark` — the
    * watermark proof that no in-order-or-late event can still extend or
    * merge with it (emitting earlier would split sessions whenever a
    * late-but-within-watermark event lands in the emitted run's gap
    * window). Unsealed runs stay in state with the event-time timeout at
    * the EARLIEST unsealed run's end+gap. State per key is O(open runs),
    * watermark-bounded.
    *
    * Input: (user_id, ts) with a watermark already applied on ts.
    */
  def statefulSessions(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
                       gapMinutes: Int = 10)
      : org.apache.spark.sql.Dataset[UserSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapUs = gapMinutes * 60L * 1000000L
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prior = state.getOption.map(_.runs).getOrElse(Nil)
          val merged: List[OpenSession] =
            if (state.hasTimedOut) prior
            else {
              // interval-merge open runs with ALL incoming events
              // (late-but-within-watermark rows may fall inside or even
              // before an open run — they extend/backfill it, never get
              // dropped; Spark already filtered sub-watermark rows)
              val points = rows.map { r =>
                val us = tsMicros(r._2); (us, us, 1)
              }
              val intervals =
                (prior.map(o => (o.start_us, o.end_us, o.n)) ++ points)
                  .sortBy(_._1)
              var runs = List.empty[(Long, Long, Int)]
              intervals.foreach { case (s0, e0, n0) =>
                runs match {
                  case (cs, ce, cn) :: rest if s0 - ce < gapUs =>
                    runs = (cs, math.max(ce, e0), cn + n0) :: rest
                  case _ =>
                    runs = (s0, e0, n0) :: runs
                }
              }
              runs.reverse.map(r => OpenSession(r._1, r._2, r._3))
            }
          val (closed, open) = merged.partition(_.end_us + gapUs <= wmUs)
          if (open.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessionState(open))
            // ceiling-to-ms keeps the timeout strictly after the current
            // watermark (Spark rejects timeouts at/before the watermark)
            state.setTimeoutTimestamp(
              (open.map(_.end_us).min + gapUs + 999L) / 1000L)
          }
          closed.iterator.map(c => UserSession(uid, c.start_us, c.end_us, c.n))
      }
  }

  /** The matched (signup, purchase) pairs — the shape a streaming
    * two-input join emits in append mode. Both inputs may come from the
    * same watermarked stream (a filtered self-join) or two sources. */
  def intervalJoinPairs(signups: DataFrame, purchases: DataFrame): DataFrame =
    signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("signup_id"), col("user_id"), col("p_ts"), col("value"))

  /** LEFT-OUTER twin of [[intervalJoinPairs]]: signups with no in-window
    * purchase survive null-padded. In streaming this is the shape whose
    * unmatched rows are emitted only once the watermark PROVES no match
    * can still arrive (state eviction = emission trigger) —
    * StreamStreamJoinSpec drives exactly that through MemoryStreams. */
  def intervalJoinPairsLeft(signups: DataFrame,
                            purchases: DataFrame): DataFrame =
    signups.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("s_ts") &&
          col("p_ts") < col("s_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
      .select(col("signup_id"), col("user_id"), col("p_ts"), col("value"))

  /** Stream-stream interval join (batch twin): for each signup, the
    * purchases by the same user within 1 hour AFTER it. Written once as a
    * DataFrame transform; StreamStreamJoinSpec drives the identical join
    * condition through watermarked MemoryStreams — the watermark bound
    * on (p_ts - s_ts) is what lets streaming evict join state.
    *
    * Scale: equi-join on user_id (one shuffle) with the time-range
    * predicate evaluated as a post-join filter inside the same SMJ —
    * no cartesian, no broadcast of an unbounded side. */
  def intervalJoin(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    intervalJoinPairs(signups, purchases)
      .groupBy(col("signup_id"), col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")) + lit(1e-6), 4).as("purchase_value"))
  }

  /** Streaming exact-dedup (batch twin): the distinct key set. The
    * streaming form is `dropDuplicates(keys)` with a watermark so seen-key
    * state is evicted; StreamingDedupSpec proves the streamed set equals
    * this batch distinct. Emitting only the keys keeps the result
    * deterministic under both executions (which PHYSICAL row survives a
    * duplicate group is arrival-order-dependent; the key set is not). */
  def dedupKeys(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_type")).distinct()

  // ------------------------------------------------------------- queries --

  def streamTumbling(s: SparkSession, d: String): DataFrame =
    tumbling(Tables.events(s, d))
      .orderBy("win_start_us", "event_type")

  def streamSliding(s: SparkSession, d: String): DataFrame =
    sliding(Tables.events(s, d))
      .orderBy("win_start_us", "event_type")

  def streamSession(s: SparkSession, d: String): DataFrame =
    sessionsBatch(Tables.events(s, d))
      .select("user_id", "session_start_us", "n_events", "duration_us")
      .orderBy("user_id", "session_start_us")

  def streamJoin(s: SparkSession, d: String): DataFrame =
    intervalJoin(Tables.events(s, d))
      .orderBy("signup_id")

  /** Per-signup rollup KEEPING zero-purchase signups (n_purchases = 0,
    * NULL value) — the conversion-funnel view where the unconverted
    * rows are the point. Same one-shuffle equi-join scale shape as
    * q_stream_join; count(value) counts only matched rows. */
  def streamJoinLeft(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
        col("ts").as("s_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value"))
    intervalJoinPairsLeft(signups, purchases)
      .groupBy(col("signup_id"), col("user_id"))
      .agg(count(col("value")).as("n_purchases"),
        round(sum(col("value")) + lit(1e-6), 4).as("purchase_value"))
      .orderBy("signup_id")
  }

  def streamDedup(s: SparkSession, d: String): DataFrame =
    dedupKeys(Tables.events(s, d))
      .orderBy("user_id", "event_type")

  /** Cohort retention: users grouped by first-seen week, counted in each
    * later week they return — the activation/retention staple next to
    * the funnel. Week ids are PURE INTEGER epoch arithmetic
    * (µs div 7·86400·10⁶), not date_trunc('week'), so both engines bin
    * identically with no week-start convention in play; the retention
    * rate is a ratio of exact BIGINT counts.
    *
    * Scale shape: one keyed agg to first-seen week (map-side combinable
    * min), one shuffle join back on user_id (both sides hash on the
    * same key), one (cohort, offset) distinct-count agg, and a
    * broadcast of the |weeks|-row cohort-size frame. Nothing scans the
    * event log twice. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val wk = events.select(col("user_id"),
      expr("unix_micros(ts) div 604800000000").as("wk"))
    val cohort = wk.groupBy("user_id").agg(min(col("wk")).as("c0"))
    val agg = wk.join(cohort, "user_id")
      .groupBy(col("c0"), (col("wk") - col("c0")).as("offset_w"))
      .agg(count_distinct(col("user_id")).as("n_users"))
    val sizes = agg.filter(col("offset_w") === 0)
      .select(col("c0"), col("n_users").as("cohort_size"))
    agg.join(broadcast(sizes), "c0")
      .select(col("c0").as("cohort_w"), col("offset_w"), col("n_users"),
        col("cohort_size"),
        round(col("n_users") / col("cohort_size") + lit(1e-9), 6)
          .as("retention"))
      .orderBy("cohort_w", "offset_w")
  }

  def streamCohort(s: SparkSession, d: String): DataFrame =
    cohortRetention(Tables.events(s, d))

  val queries: Map[String, Q] = Map(
    "q_stream_tumbling" -> streamTumbling _,
    "q_stream_sliding"  -> streamSliding _,
    "q_stream_session"  -> streamSession _,
    "q_stream_join"     -> streamJoin _,
    "q_stream_join_left" -> streamJoinLeft _,
    "q_stream_dedup"    -> streamDedup _,
    "q_cohort_retention" -> streamCohort _,
  )

  val oracle: Map[String, String] = Map(
    // integer week ids (µs // 604800000000) sidestep any week-start
    // convention; retention is a ratio of exact BIGINT counts
    "q_cohort_retention" ->
      """WITH wk AS (SELECT user_id,
                            epoch_us(ts) // 604800000000 AS wk
                     FROM events),
         c AS (SELECT user_id, min(wk) AS c0 FROM wk GROUP BY user_id),
         a AS (SELECT c0, wk.wk - c0 AS offset_w,
                      CAST(count(DISTINCT wk.user_id) AS BIGINT) AS n_users
               FROM wk JOIN c ON wk.user_id = c.user_id
               GROUP BY c0, wk.wk - c0),
         sz AS (SELECT c0, n_users AS cohort_size FROM a WHERE offset_w = 0)
         SELECT a.c0 AS cohort_w, a.offset_w, a.n_users, sz.cohort_size,
                round(CAST(a.n_users AS DOUBLE) / sz.cohort_size + 1e-9, 6)
                  AS retention
         FROM a JOIN sz ON a.c0 = sz.c0
         ORDER BY cohort_w, offset_w""",
    "q_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
                CAST(count(1) AS BIGINT) AS n,
                round(sum(value) + 1e-6, 4) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    "q_stream_sliding" ->
      """WITH halves AS (
           SELECT epoch_us(ts) - epoch_us(ts) % 1800000000 AS half_us,
                  event_type
           FROM events),
         wins AS (
           SELECT unnest([half_us, half_us - 1800000000]) AS win_start_us,
                  event_type
           FROM halves)
         SELECT win_start_us, event_type, CAST(count(1) AS BIGINT) AS n
         FROM wins GROUP BY 1, 2 ORDER BY win_start_us, event_type""",
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
         lagged AS (
           SELECT user_id, ts_us,
                  lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
                    AS prev_us
           FROM e),
         marked AS (
           SELECT user_id, ts_us,
                  CASE WHEN prev_us IS NULL
                         OR ts_us - prev_us >= 600000000 THEN 1
                       ELSE 0 END AS new_session
           FROM lagged),
         numbered AS (
           SELECT user_id, ts_us,
                  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
           FROM marked)
         SELECT user_id, min(ts_us) AS session_start_us,
                CAST(count(1) AS BIGINT) AS n_events,
                max(ts_us) - min(ts_us) AS duration_us
         FROM numbered GROUP BY user_id, session_id
         ORDER BY user_id, session_start_us""",
    "q_stream_join" ->
      """WITH s AS (SELECT user_id, event_id AS signup_id, ts AS s_ts
                    FROM events WHERE event_type = 'signup'),
           p AS (SELECT user_id, ts AS p_ts, value
                 FROM events WHERE event_type = 'purchase')
         SELECT s.signup_id, s.user_id,
                CAST(count(1) AS BIGINT) AS n_purchases,
                round(sum(p.value) + 1e-6, 4) AS purchase_value
         FROM s JOIN p ON s.user_id = p.user_id
              AND p.p_ts >= s.s_ts
              AND p.p_ts < s.s_ts + INTERVAL 1 HOUR
         GROUP BY s.signup_id, s.user_id
         ORDER BY signup_id""",
    // count(p.value) counts only matched rows; unmatched signups keep
    // n_purchases = 0 and NULL purchase_value
    "q_stream_join_left" ->
      """WITH s AS (SELECT user_id, event_id AS signup_id, ts AS s_ts
                    FROM events WHERE event_type = 'signup'),
           p AS (SELECT user_id, ts AS p_ts, value
                 FROM events WHERE event_type = 'purchase')
         SELECT s.signup_id, s.user_id,
                CAST(count(p.value) AS BIGINT) AS n_purchases,
                round(sum(p.value) + 1e-6, 4) AS purchase_value
         FROM s LEFT JOIN p ON s.user_id = p.user_id
              AND p.p_ts >= s.s_ts
              AND p.p_ts < s.s_ts + INTERVAL 1 HOUR
         GROUP BY s.signup_id, s.user_id
         ORDER BY signup_id""",
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
  )
}
