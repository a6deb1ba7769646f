package graft.stream

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def runFunnel(name: String,
                        batches: Seq[Seq[(Long, String, Long)]],
                        flushFromNs: Long): Array[Funnel.UserFunnel] = {
    val ms = MemoryStream[(Long, String, Long)]
    val out = Funnel.statefulFunnel(
      ms.toDS().toDF("user_id", "event_type", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        .withWatermark("ts", "1 hour")
        .as[(Long, String, Long, Timestamp)])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    // two sentinel batches: the first advances the watermark past every
    // seal point, the second lets the (batch-start-evaluated) timeouts fire
    ms.addData((-1L, "noop", flushFromNs)); q.processAllAvailable()
    ms.addData((-1L, "noop", flushFromNs + 1000000000L)); q.processAllAvailable()
    q.stop()
    spark.table(name).filter($"user_id" >= 0)
      .as[Funnel.UserFunnel].collect()
  }

  test("streaming funnel equals the batch funnel on sf0.001 events") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
      .orderBy("ts_ns")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // 4 contiguous event-time chunks = a roughly-ordered stream
    val chunks = ev.grouped(math.max(1, ev.length / 4 + 1)).map(_.toSeq).toSeq
    val flush = ev.map(_._3).max + 3 * 86400L * 1000000000L
    val got = runFunnel("funnel_stream", chunks, flush)

    val batch = Funnel.funnelConversion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.length.toLong == batch("1_signup"))
    assert(got.count(_.step >= 2).toLong == batch("2_click_24h"))
    assert(got.count(_.step == 3).toLong == batch("3_purchase_24h"))
    // append-mode finality: exactly one outcome per user
    assert(got.map(_.user_id).distinct.length == got.length)
  }

  test("out-of-order arrivals inside the watermark are handled") {
    val H = 3600L * 1000000000L // 1h in ns
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000000L
    // user 1: click arrives BEFORE its signup (same batch, reversed);
    // user 2: a LATER batch delivers an EARLIER signup (within the 1 h
    //   watermark delay) that retroactively qualifies the click;
    // user 3: click outside the 24 h window — stalls at step 1
    val b1 = Seq(
      (1L, "click", base + H), (1L, "signup", base),
      (2L, "click", base + 2 * H),
      (3L, "signup", base))
    // watermark after b1 = base+2H − 1h = base+1H
    val b2 = Seq(
      (2L, "signup", base + 3 * H / 2), // ts < b1 max, but above watermark
      (1L, "purchase", base + 2 * H))
    val b3 = Seq(
      (3L, "click", base + 25 * 3600L * 1000000000L))
    val flush = base + 30 * 86400L * 1000000000L
    val got = runFunnel("funnel_ooo", Seq(b1, b2, b3), flush)
      .map(u => u.user_id -> u.step).toMap
    assert(got == Map(1L -> 3, 2L -> 2, 3L -> 1), got.toString)
  }

  test("a second signup episode after the seal does not re-emit") {
    val D = 86400L * 1000000000L // 24h in ns
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000000L
    // b1: user 1 signs up and clicks; b2 advances the watermark past
    // s1 + 48h (+ the 1h delay) so user 1 seals at step 2; b3..b5: a
    // fresh signup+click+purchase episode for the SAME user, weeks
    // later, with further watermark-advancing batches behind it — the
    // done tombstone (armed with the never-fires timeout) must swallow
    // it, matching the batch twin's one-outcome-per-user-on-global-min
    // semantics.
    val b1 = Seq((1L, "signup", base), (1L, "click", base + D / 2))
    val b2 = Seq((9L, "noop", base + 3 * D))
    val b3 = Seq((1L, "signup", base + 10 * D),
                 (1L, "click", base + 10 * D + 1000L),
                 (1L, "purchase", base + 10 * D + 2000L))
    val b4 = Seq((9L, "noop", base + 15 * D))
    val b5 = Seq((9L, "noop", base + 20 * D))
    val flush = base + 40 * D
    val got = runFunnel("funnel_tombstone", Seq(b1, b2, b3, b4, b5), flush)
    assert(got.toSeq == Seq(Funnel.UserFunnel(1L, 2)), got.mkString(","))
  }
}
