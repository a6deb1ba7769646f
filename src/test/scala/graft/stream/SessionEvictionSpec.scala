package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** VERDICT r4 #7: the session_window state store must EVICT sealed
  * sessions as the watermark passes them — state is O(open sessions),
  * not O(all sessions ever). The batch-islands form is oracle'd
  * (q_stream_session); this drives the streaming twin through several
  * watermark advances and reads the state-store row counts from query
  * progress. */
class SessionEvictionSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def t(s: String) = Timestamp.valueOf(s)

  test("state rows stay bounded across >2 watermark advances") {
    val ms = MemoryStream[Ev]
    val sessions = Events.sessionsStreaming(
      ms.toDF().withWatermark("ts", "10 minutes"))
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sess_evict").start()

    // 5 waves, 1 hour apart, 2 users each, 2 events per session: every
    // wave advances the watermark ~1h (≫ gap + delay), sealing and
    // emitting the previous wave's 2 sessions. 10 sessions total flow
    // through, but at most 2 are ever open.
    val waves = (0 until 5).map { w =>
      val hh = 10 + w
      Seq(
        Ev(4L * w + 1, t(f"2024-01-01 $hh%02d:00:00"), 1, "click", 1.0),
        Ev(4L * w + 2, t(f"2024-01-01 $hh%02d:02:00"), 1, "view", 1.0),
        Ev(4L * w + 3, t(f"2024-01-01 $hh%02d:00:30"), 2, "click", 1.0),
        Ev(4L * w + 4, t(f"2024-01-01 $hh%02d:03:00"), 2, "view", 1.0))
    }
    waves.foreach { wave => ms.addData(wave: _*); q.processAllAvailable() }
    // flush wave far past everything: seals wave 5 too
    ms.addData(Ev(99, t("2024-01-02 09:00:00"), 3, "noop", 0.0))
    q.processAllAvailable()

    val stateRows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(p => p.stateOperators.map(_.numRowsTotal).sum)
    q.stop()

    // >2 watermark advances actually happened and were observed
    assert(stateRows.size > 2, s"only ${stateRows.size} progress samples")
    // every emitted session leaves the store: the data batch transiently
    // holds previous wave + current wave (4) until the watermark-advance
    // batch evicts back to the open wave (2) — the healthy sawtooth. A
    // leak would climb toward 10; a cap of two-waves-in-flight pins it.
    assert(stateRows.max <= 4,
      s"state grew to ${stateRows.max} rows (history: $stateRows)")
    // after the flush the store holds at most the flush key itself
    assert(stateRows.last <= 1,
      s"final state ${stateRows.last} rows (history: $stateRows)")
    // and all 10 sealed sessions were emitted downstream, 2 events each
    val emitted = spark.table("sess_evict").filter($"user_id" < 3)
    assert(emitted.count() == 10, s"emitted ${emitted.count()}")
    assert(emitted.filter($"n_events" =!= 2).count() == 0)
  }
}
