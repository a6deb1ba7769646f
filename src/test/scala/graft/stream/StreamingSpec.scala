package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Structured Streaming suites (SURVEY.md §2B stream rows + §5.2.4):
  * MemoryStream in, memory sink out; the SAME Events.* transforms the
  * batch oracle queries use — stream/batch consistency is the oracle. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(s: String) = Timestamp.valueOf(s)

  private val base = Seq(
    Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
    Ev(2, t("2024-01-01 10:05:00"), 1, "click", 2.0),
    Ev(3, t("2024-01-01 10:20:00"), 1, "view", 3.0),   // same session (gap 15m? no: >=10m → NEW session)
    Ev(4, t("2024-01-01 11:40:00"), 1, "click", 4.0),  // new session + new hour
    Ev(5, t("2024-01-01 10:02:00"), 2, "view", 5.0),
    Ev(6, t("2024-01-01 10:11:59"), 2, "view", 6.0),   // gap 9:59 < 10m → same session
    Ev(7, t("2024-01-01 10:22:00"), 2, "click", 7.0),  // gap 10:01 ≥ 10m → new session
  )

  private def runStream[T](s: MemoryStream[Ev], df: org.apache.spark.sql.DataFrame,
                           mode: OutputMode, name: String) = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling: streaming complete-mode result == batch transform result") {
    val ms = MemoryStream[Ev]
    ms.addData(base: _*)
    val got = runStream(ms, Events.tumbling(ms.toDF()),
      OutputMode.Complete, "tumble_out")
      .select("win_start_us", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = Events.tumbling(base.toDF())
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("session_window streaming == batch gaps-and-islands (boundary exact)") {
    val ms = MemoryStream[Ev]
    ms.addData(base: _*)
    val got = runStream(ms, Events.sessionsStreaming(ms.toDF()),
      OutputMode.Complete, "sess_out")
      .select("user_id", "session_start_us", "n_events")
      .collect().map(_.toSeq).toSet
    val want = Events.sessionsBatch(base.toDF())
      .select("user_id", "session_start_us", "n_events")
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // boundary checks: user1 10:00+10:05 together, 10:20 separate (gap>=10m);
    // user2 10:02+10:11:59 together (9:59<10m), 10:22 separate (10:01>=10m)
    val u1 = Events.sessionsBatch(base.toDF()).filter($"user_id" === 1).count()
    val u2 = Events.sessionsBatch(base.toDF()).filter($"user_id" === 2).count()
    assert(u1 == 3 && u2 == 2)
  }

  test("watermark drops events later than the delay behind max event time") {
    val ms = MemoryStream[Ev]
    val agg = ms.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_out").start()
    // batch 1: events up to 12:00 → watermark advances to 11:50
    ms.addData(Ev(1, t("2024-01-01 10:30:00"), 1, "click", 1.0),
      Ev(2, t("2024-01-01 12:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    // batch 2: a 10:40 event is > 10 min late → must be dropped;
    //          the closed 10:00 window emits WITHOUT it
    ms.addData(Ev(3, t("2024-01-01 10:40:00"), 1, "click", 99.0))
    q.processAllAvailable()
    // batch 3: advance watermark far so the 12:00 window also closes
    ms.addData(Ev(4, t("2024-01-01 14:00:00"), 1, "click", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("wm_out")
      .select(unix_micros($"window.start").as("w"), $"n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000
    assert(rows(w10) == 1L, s"late event leaked into closed window: $rows")
  }

  test("dropDuplicates with watermark: stateful exactly-once by event_id") {
    val ms = MemoryStream[Ev]
    val dedup = ms.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
    val q = dedup.writeStream.outputMode(OutputMode.Complete)
      .format("memory").queryName("dd_out").start()
    ms.addData(base: _*)
    ms.addData(base.take(3): _*)     // replay duplicates
    q.processAllAvailable()
    q.stop()
    val total = spark.table("dd_out").agg(sum($"n")).head().getLong(0)
    assert(total == base.length, s"expected ${base.length} distinct, got $total")
  }

  test("flatMapGroupsWithState: custom per-user session reducer") {
    val ms = MemoryStream[Ev]
    val sessions = ms.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], (Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[List[Long]]) =>
          val seen = state.getOption.getOrElse(Nil) ++ evs.map(_.event_id)
          state.update(seen)
          Iterator.single((uid, seen.size))
      }
    val q = sessions.toDF("user_id", "n_seen")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("fmgs_out").start()
    ms.addData(base.take(4): _*)   // all user 1
    q.processAllAvailable()
    ms.addData(base.drop(4): _*)   // user 2
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fmgs_out").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.contains((1L, 4)) && rows.contains((2L, 3)), rows.mkString(","))
  }

  test("stream-static join: each micro-batch enriches against the dim") {
    // the remaining join shape: a STREAM against a STATIC dimension —
    // planned as a broadcast join re-resolved per micro-batch, no state
    // store involved (unlike stream-stream). Result must equal the batch
    // join of the same inputs.
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val ms = MemoryStream[Ev]
    ms.addData(base: _*)
    val enriched = ms.toDF().join(dim, Seq("user_id"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val got = runStream(ms, enriched, OutputMode.Complete, "ss_join_out")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    val want = base.toDF().join(dim, Seq("user_id"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == want && got.nonEmpty)
  }

  test("sliding windows: each event lands in exactly two 1h/30m windows") {
    val counts = Events.sliding(base.toDF())
      .agg(sum($"n")).head().getLong(0)
    assert(counts == base.length * 2)
  }
}

/** Stream-stream interval join: purchases ⋈ signups of the same user where
  * the purchase lands within 1 hour after the signup — both sides
  * watermarked so join state is evicted once the interval can no longer
  * match. The last major Structured Streaming surface (stateful two-input
  * joins). */
class StreamStreamJoinSpec extends graft.SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import org.apache.spark.sql.functions._
  import java.sql.Timestamp
  private def t(s: String) = Timestamp.valueOf(s)

  test("interval join matches within the window, drops outside it") {
    val purchases = MemoryStream[(Long, Timestamp)]
    val signups = MemoryStream[(Long, Timestamp)]
    val p = purchases.toDS().toDF("user_id", "p_ts")
      .withWatermark("p_ts", "10 minutes")
    val sgn = signups.toDS().toDF("user_id", "s_ts")
      .withWatermark("s_ts", "10 minutes")
    val cond = p("user_id") === sgn("user_id") &&
      col("p_ts") >= col("s_ts") &&
      col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR")
    val q = p.join(sgn, cond)
      .select(p("user_id"), col("p_ts"), col("s_ts"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_out").start()
    signups.addData((1L, t("2024-01-01 10:00:00")),
      (2L, t("2024-01-01 10:00:00")))
    purchases.addData(
      (1L, t("2024-01-01 10:30:00")),   // in window -> match
      (2L, t("2024-01-01 12:00:00")),   // 2h later -> no match
      (3L, t("2024-01-01 10:15:00")))   // no signup -> no match
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_out").collect()
      .map(r => r.getLong(0)).toSet
    assert(rows == Set(1L), s"got $rows")
  }

  test("streamed self-join pairs == Events.intervalJoinPairs batch twin") {
    val evs = Seq(
      Ev(10, t("2024-01-01 10:00:00"), 1, "signup", 0.0),
      Ev(11, t("2024-01-01 10:30:00"), 1, "purchase", 5.0),  // in window
      Ev(12, t("2024-01-01 10:59:59"), 1, "purchase", 7.0),  // in window
      Ev(13, t("2024-01-01 11:00:00"), 1, "purchase", 9.0),  // p_ts == s_ts+1h → out
      Ev(14, t("2024-01-01 10:10:00"), 2, "signup", 0.0),
      Ev(15, t("2024-01-01 10:05:00"), 2, "purchase", 3.0),  // before signup → out
      Ev(16, t("2024-01-01 12:00:00"), 3, "purchase", 4.0))  // no signup → out
    val ms = MemoryStream[Ev]
    ms.addData(evs: _*)
    val wm = ms.toDF().withWatermark("ts", "10 minutes")
    val sgn = wm.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("s_ts"))
    val pur = wm.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val q = Events.intervalJoinPairs(sgn, pur)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_twin_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ssj_twin_out").collect().map(_.toSeq).toSet
    val bs = evs.toDF().filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("s_ts"))
    val bp = evs.toDF().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val want = Events.intervalJoinPairs(bs, bp).collect().map(_.toSeq).toSet
    assert(got == want && want.map(_.head).contains(10L), s"got $got")
    assert(want.size == 2, s"boundary semantics drifted: $want")
  }

  test("left-outer emits unmatched signups only after the watermark " +
    "proves no match can arrive") {
    val evs = Seq(
      Ev(20, t("2024-01-01 10:00:00"), 1, "signup", 0.0),
      Ev(21, t("2024-01-01 10:30:00"), 1, "purchase", 5.0),  // matches 20
      Ev(22, t("2024-01-01 10:00:00"), 2, "signup", 0.0))    // never matches
    val ms = MemoryStream[Ev]
    ms.addData(evs: _*)
    val wm = ms.toDF().withWatermark("ts", "10 minutes")
    val sgn = wm.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("s_ts"))
    val pur = wm.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val q = Events.intervalJoinPairsLeft(sgn, pur)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj_left_out").start()
    q.processAllAvailable()
    val early = spark.table("ssj_left_out").collect()
      .map(r => r.getLong(1)).toSet
    // watermark hasn't passed signup 22's window yet: no null-padded row
    assert(!early.contains(2L) || spark.table("ssj_left_out")
      .filter($"user_id" === 2L && $"p_ts".isNotNull).count() > 0,
      s"unmatched emitted before watermark: $early")
    // advance the watermark far past every join window. Two subtleties:
    // (1) the watermark is recomputed at batch END and outer-null
    // emission happens in the FOLLOWING batch → two sentinel batches;
    // (2) the event_type filters are pushed BELOW each branch's
    // EventTimeWatermarkExec, so a sentinel only advances a branch's
    // watermark if it SURVIVES that branch's filter — and the global
    // watermark is the min across branches. Each sentinel batch is
    // therefore a matched signup+purchase pair (user 9), which also
    // keeps the streamed output equal to the batch twin (matched pairs
    // emit immediately; a lone sentinel signup would be held forever).
    ms.addData(Ev(23, t("2024-01-02 00:00:00"), 9, "signup", 0.0),
      Ev(24, t("2024-01-02 00:01:00"), 9, "purchase", 1.0))
    q.processAllAvailable()
    ms.addData(Ev(25, t("2024-01-03 00:00:00"), 9, "signup", 0.0),
      Ev(26, t("2024-01-03 00:01:00"), 9, "purchase", 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ssj_left_out").collect()
      .map(r => (r.getLong(1), Option(r.get(2)))).toSet
    // matched signup with its purchase ts, unmatched signup null-padded
    assert(rows.exists { case (u, p) => u == 1L && p.nonEmpty })
    assert(rows.exists { case (u, p) => u == 2L && p.isEmpty }, s"got $rows")
    // and the streamed multiset equals the batch left-outer twin
    val bs = evs.toDF().filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"), $"ts".as("s_ts"))
    val bp = evs.toDF().filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"value")
    val want = Events.intervalJoinPairsLeft(bs, bp).collect()
      .map(_.toSeq).toSet
    // sentinel (user 9) rows are outside the batch fixture — exclude them
    val got = spark.table("ssj_left_out").filter($"user_id" =!= 9L)
      .collect().map(_.toSeq).toSet
    assert(got == want, s"streamed $got != batch $want")
  }
}

/** Streaming exact dedup: dropDuplicates keeps per-key state and emits the
  * first arrival; dropDuplicatesWithinWatermark bounds that state by the
  * watermark — the form a 100 TB infinite-stream dedup must use. The
  * batch twin (distinct key set) is the q_stream_dedup oracle. */
class StreamingDedupSpec extends graft.SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private def t(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    Ev(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
    Ev(2, t("2024-01-01 10:01:00"), 1, "click", 2.0),   // dup key
    Ev(3, t("2024-01-01 10:02:00"), 1, "view", 3.0),
    Ev(4, t("2024-01-01 10:03:00"), 2, "click", 4.0),
    Ev(5, t("2024-01-01 10:04:00"), 2, "click", 5.0))   // dup key

  test("streaming dropDuplicates emits exactly the batch-distinct key set") {
    val ms = MemoryStream[Ev]
    ms.addData(evs.take(2): _*)   // duplicate split across two batches
    ms.addData(evs.drop(2): _*)
    val q = ms.toDF().withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select("user_id", "event_type")
      .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Events.dedupKeys(evs.toDF()).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && want.size == 3, s"got $got want $want")
  }

  test("cohort retention: planted churn yields exact per-offset rates") {
    import spark.implicits._
    val WEEK = 604800000000L
    def at(w: Long) = new java.sql.Timestamp(w * WEEK / 1000)
    // A: weeks 0,1,2 · B: weeks 0,2 · C: week 1 only
    val ev = Seq(
      (1L, at(0)), (1L, at(1)), (1L, at(2)),
      (2L, at(0)), (2L, at(2)),
      (3L, at(1)))
      .toDF("user_id", "ts")
    val out = Events.cohortRetention(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out((0L, 0L)) == ((2L, 2L, 1.0)))   // cohort {A,B}
    assert(out((0L, 1L)) == ((1L, 2L, 0.5)))   // only A returns in w1
    assert(out((0L, 2L)) == ((2L, 2L, 1.0)))   // both return in w2
    assert(out((1L, 0L)) == ((1L, 1L, 1.0)))   // cohort {C}
    assert(out.size == 4)                      // no phantom offsets
  }
}
