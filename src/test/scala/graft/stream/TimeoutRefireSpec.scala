package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger

object TimeoutRefireSpec {
  val timedOutInvocations = new AtomicInteger(0)
}

/** Behavioral probe pinning the Spark semantics behind Funnel.NeverMs:
  * a state whose event-time timeout has expired and whose callback
  * neither removes the state nor arms a new timeout KEEPS the expired
  * timestamp in the store, so the per-batch timeout scan re-invokes it
  * as timed-out on later batches. That re-fire is why statefulFunnel
  * arms the far-future sentinel when it seals a `done` tombstone —
  * without it every sealed user costs a no-op callback per microbatch. */
class TimeoutRefireSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("expired timeout re-fires every batch when not reset") {
    val ms = MemoryStream[(Long, Long)] // (key, ts_ms)
    val out = ms.toDS().toDF("k", "ms")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ms")))
      .withWatermark("ts", "0 seconds")
      .as[(Long, Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Boolean, (Long, Int)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k: Long, rows: Iterator[(Long, Long, Timestamp)],
         state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            // count ONLY the kept-without-reset key 1 — key 99 arms its
            // own timeout and would otherwise mask the probed behavior
            if (k == 1L) TimeoutRefireSpec.timedOutInvocations.incrementAndGet()
            // like the done-tombstone: keep state, set no new timeout
            Iterator.empty
          } else if (!state.exists) {
            rows.size // drain
            state.update(true)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            Iterator.empty
          } else {
            rows.size
            Iterator.empty
          }
      }
    val q = out.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("refire").start()
    // batch 1: key 1 at t=1000 -> sets timeout at wm+1
    ms.addData((1L, 1000L)); q.processAllAvailable()
    // batches 2..6: unrelated key advances the watermark each batch
    for (i <- 2 to 6) { ms.addData((99L, 1000L * i)); q.processAllAvailable() }
    q.stop()
    info(s"timed-out invocations for key 1: ${TimeoutRefireSpec.timedOutInvocations.get()}")
    assert(TimeoutRefireSpec.timedOutInvocations.get() >= 1)
  }
}
