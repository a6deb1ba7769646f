package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(s: String) = Timestamp.valueOf(s)

  test("stateful sessions: in-batch gap split emits, tail closes by timeout") {
    val ms = MemoryStream[(Long, Timestamp)]
    val sessions = Events.statefulSessions(
      ms.toDS().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)], gapMinutes = 10)
    val q = sessions.toDF()
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_out").start()

    // batch 1: two sessions for user 1 in ONE batch (gap 30m). The data
    // batch itself emits nothing (watermark still at epoch — neither run
    // is provably closed), but processAllAvailable then runs Spark's
    // no-data micro-batch with the advanced watermark (10:40, 0s delay):
    // the first run (sealed at 10:05+10m = 10:15 <= 10:40) times out and
    // emits watermark-justified; the second (sealed 10:50 > 10:40) stays.
    ms.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")),
      (1L, t("2024-01-01 10:40:00")))
    q.processAllAvailable()
    val afterB1 = spark.table("ss_out").as[Events.UserSession].collect()
    assert(afterB1.length == 1 && afterB1.head.n_events == 2,
      afterB1.mkString(","))

    // batch 2: advance the watermark far past 10:50 → open session times out
    ms.addData((2L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // one more batch so the timeout (evaluated at batch start) fires
    ms.addData((2L, t("2024-01-01 12:00:30")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("ss_out").as[Events.UserSession].collect()
    val u1 = all.filter(_.user_id == 1L).sortBy(_.start_us)
    assert(u1.length == 2, all.mkString(","))
    assert(u1(1).n_events == 1 &&
      u1(1).start_us == t("2024-01-01 10:40:00").getTime * 1000)
  }

  test("stateful session boundaries agree with the batch islands twin") {
    val data = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:09:59")),
      (1L, t("2024-01-01 10:20:00")),                       // >=10m: new
      (7L, t("2024-01-01 09:00:00")), (7L, t("2024-01-01 09:30:00")))
    val ms = MemoryStream[(Long, Timestamp)]
    val q = Events.statefulSessions(
        ms.toDS().toDF("user_id", "ts").withWatermark("ts", "0 seconds")
          .as[(Long, Timestamp)])
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss2_out").start()
    ms.addData(data: _*)
    q.processAllAvailable()
    ms.addData((99L, t("2024-02-01 00:00:00")))  // watermark push
    q.processAllAvailable()
    ms.addData((99L, t("2024-02-01 00:00:01")))  // let timeouts fire
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ss2_out")
      .filter($"user_id" < 99)
      .select("user_id", "start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val batch = Events.sessionsBatch(
        data.toDF("user_id", "ts").withColumn("value", lit(0.0)))
      .select("user_id", "session_start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2).toInt)).toSet
    assert(got == batch, s"stream=$got batch=$batch")
  }
}

class LateEventSessionSpec extends graft.SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import org.apache.spark.sql.streaming.OutputMode
  import java.sql.Timestamp
  private def t(s: String) = Timestamp.valueOf(s)

  test("late-but-within-watermark event joins the open session (not dropped)") {
    val ms = MemoryStream[(Long, Timestamp)]
    val q = Events.statefulSessions(
        ms.toDS().toDF("user_id", "ts")
          .withWatermark("ts", "1 hour")          // generous watermark delay
          .as[(Long, Timestamp)], gapMinutes = 10)
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late_out").start()
    // batch 1: open session [10:00, 10:05]
    ms.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // batch 2: a LATE event at 10:03 (within watermark) — must merge in
    ms.addData((1L, t("2024-01-01 10:03:00")))
    q.processAllAvailable()
    // close the session via watermark + follow-up batch
    ms.addData((9L, t("2024-01-02 00:00:00")))
    q.processAllAvailable()
    ms.addData((9L, t("2024-01-02 00:00:01")))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("late_out").as[Events.UserSession]
      .collect().filter(_.user_id == 1L)
    assert(u1.length == 1 && u1.head.n_events == 3,
      s"late event lost: ${u1.mkString(",")}")
  }

  test("late event merges with the EARLIER of two in-batch sessions") {
    // Round-1 emitted every non-trailing run immediately; with a watermark
    // delay > 0 a late event landing near the earlier run then produced a
    // split/spurious session. Now the earlier run must wait in state until
    // the watermark seals it.
    val ms = MemoryStream[(Long, Timestamp)]
    val q = Events.statefulSessions(
        ms.toDS().toDF("user_id", "ts")
          .withWatermark("ts", "1 hour")
          .as[(Long, Timestamp)], gapMinutes = 10)
      .toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("late2_out").start()
    // batch 1: TWO gap-separated runs for user 1 in one batch
    ms.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")),
      (1L, t("2024-01-01 10:40:00")))
    q.processAllAvailable()
    // batch 2: late 10:12 (within the 1h watermark) — extends the FIRST
    // run to [10:00, 10:12], still 28m away from 10:40
    ms.addData((1L, t("2024-01-01 10:12:00")))
    q.processAllAvailable()
    // advance the watermark far past both, then let timeouts fire
    ms.addData((9L, t("2024-01-02 00:00:00")))
    q.processAllAvailable()
    ms.addData((9L, t("2024-01-02 00:00:01")))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("late2_out").as[Events.UserSession]
      .collect().filter(_.user_id == 1L).sortBy(_.start_us)
    assert(u1.map(_.n_events).toSeq == Seq(3, 1),
      s"split/merge wrong: ${u1.mkString(",")}")
    assert(u1.head.end_us == t("2024-01-01 10:12:00").getTime * 1000)
  }
}
