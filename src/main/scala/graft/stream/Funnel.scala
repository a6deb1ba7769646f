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

  /** A user's sealed funnel outcome: highest step reached (1 = signed
    * up, 2 = clicked within 24 h, 3 = purchased within 24 h of that). */
  case class UserFunnel(user_id: Long, step: Int)
  /** Per-user funnel state (public: Catalyst encoder codegen).
    * `s1` = min signup time seen (Long.MaxValue = none yet); `clicks` /
    * `purchases` = retained candidate event times (see retention rule in
    * statefulFunnel); `done` = outcome already emitted — the tombstone
    * that makes emission exactly-once-per-user when later events (a
    * second signup episode) arrive after the seal. */
  case class FunnelState(s1: Long, clicks: List[Long],
                         purchases: List[Long], done: Boolean)

  private val NoSignup = Long.MaxValue

  /** Timeout sentinel for sealed (`done`) states: 9999-12-31T23:59:59Z
    * in ms — beyond any real watermark. A state kept WITHOUT re-arming
    * its (now expired) event-time timeout is re-invoked as timed-out on
    * later batches (TimeoutRefireSpec probes this Spark behavior), which
    * at scale means a no-op callback per sealed user per microbatch.
    * Arming the sentinel keeps the tombstone while opting it out of the
    * timeout scan for the stream's lifetime. */
  private val NeverMs = 253402300799000L

  /** Streaming funnel via flatMapGroupsWithState + EventTimeTimeout —
    * the per-user multi-step conversion state machine, append-mode
    * emission of each user's FINAL funnel outcome. Exactly matches the
    * batch funnelConversion on the same events (FunnelStreamSpec).
    *
    * Sealing: a user's outcome is final once the watermark passes
    * s1 + 48 h — the min signup s1 itself is frozen (no event below the
    * watermark can arrive, so no earlier signup), the click window ends
    * at s1 + 24 h and the purchase window at most 24 h after that.
    *
    * Bounded state: an event is retained only while it could still
    * qualify under the FINAL s1' ∈ [min(wm, s1), s1] — i.e. it is at or
    * after min(wm, s1) and before the step horizon (s1 + 24 h for
    * clicks, s1 + 48 h for purchases); with no signup seen yet, only
    * events at/above the watermark are kept (a future signup must be
    * ≥ wm, so anything older can never fall inside its window). State is
    * therefore O(events per user in a watermark-delay + 48 h horizon) —
    * the same watermark-bounded class as statefulSessions.
    *
    * Input: (user_id, event_type, ts_ns, ts) with a watermark already
    * applied on ts; the exact nanos drive the step arithmetic (micros
    * truncation must not shift a 24 h boundary), ts exists only to carry
    * the event-time watermark.
    */
  def statefulFunnel(
      events: org.apache.spark.sql.Dataset[(Long, String, Long, java.sql.Timestamp)])
      : org.apache.spark.sql.Dataset[UserFunnel] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, UserFunnel](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          // watermark ms → ns floor: arriving events satisfy
          // ts_ns >= ts_us*1000 >= wmMs*1e6, so this bound is safe
          val wmNs = state.getCurrentWatermarkMs() * 1000000L
          val prior = state.getOption
            .getOrElse(FunnelState(NoSignup, Nil, Nil, done = false))
          if (prior.done) {
            // outcome already emitted: swallow any later activity (the
            // batch twin scores each user once, on the GLOBAL min
            // signup). The tombstone is O(1) per sealed user and never
            // times out — the same state class as a streaming
            // dropDuplicates on user_id. Re-arm the never-fires sentinel
            // in case this state predates it (old checkpoint) and its
            // expired seal-time timeout just re-fired.
            if (state.hasTimedOut) state.setTimeoutTimestamp(NeverMs)
            Iterator.empty
          } else {
          var s1 = prior.s1
          var clicks = prior.clicks
          var purchases = prior.purchases
          if (!state.hasTimedOut) rows.foreach { r =>
            r._2 match {
              case "signup"   => if (r._3 < s1) s1 = r._3
              case "click"    => clicks ::= r._3
              case "purchase" => purchases ::= r._3
              case _          => ()
            }
          }
          // retention rule (see scaladoc): keep while a FINAL signup in
          // [min(wm, s1), s1] could still put the event in its window
          val floorNs = math.min(wmNs, s1)
          def retain(ts: Long, horizon: Long): Boolean =
            if (s1 == NoSignup) ts >= wmNs
            else ts >= floorNs && ts < horizon
          clicks = clicks.filter(t => retain(t, if (s1 == NoSignup) 0L else s1 + DayNs))
          purchases = purchases.filter(t => retain(t, if (s1 == NoSignup) 0L else s1 + 2 * DayNs))
          if (s1 != NoSignup && wmNs >= s1 + 2 * DayNs) {
            // sealed: s1, its click window and the purchase window are
            // all behind the watermark — the outcome is final; leave the
            // `done` tombstone so a later signup episode can't re-emit
            val c1 = clicks.filter(t => t >= s1 && t < s1 + DayNs)
              .minOption
            val p1 = c1.flatMap(c => purchases.filter(t => t >= c && t < c + DayNs)
              .minOption)
            state.update(FunnelState(s1, Nil, Nil, done = true))
            state.setTimeoutTimestamp(NeverMs)
            Iterator.single(UserFunnel(uid,
              1 + c1.map(_ => 1).getOrElse(0) + p1.map(_ => 1).getOrElse(0)))
          } else if (s1 == NoSignup && clicks.isEmpty && purchases.isEmpty) {
            // nothing retained and nothing to wait for
            if (state.exists) state.remove()
            Iterator.empty
          } else {
            state.update(FunnelState(s1, clicks, purchases, done = false))
            // wake at the seal point (signup present) or when the oldest
            // retained orphan event falls below the watermark; ceiling to
            // ms keeps the timeout strictly after the current watermark
            val targetNs =
              if (s1 != NoSignup) s1 + 2 * DayNs
              else (clicks ++ purchases).min + 1L
            state.setTimeoutTimestamp(
              math.max(targetNs + 999999L, wmNs + 1000000L) / 1000000L)
            Iterator.empty
          }
          }
      }
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
