package graft.stream

import graft.SparkSpec
import graft.rel.AsOf
import graft.stream.AsOfStream.{AsOfLeftMatch, AsOfMatch, AsOfTick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

class AsOfStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val BaseNs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000000L

  private def run(name: String, batches: Seq[Seq[(Long, String, Long, Long)]],
                  flushNs: Long, delay: String = "10 seconds"): Array[AsOfMatch] = {
    val ms = MemoryStream[(Long, String, Long, Long)]
    val out = AsOfStream.streamingAsOf(
      ms.toDS().toDF("key", "side", "ts_ns", "payload")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        .withWatermark("ts", delay)
        .as[AsOfTick])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    // sentinel pair: advance the watermark past every probe, then let
    // the batch-start-evaluated timeouts fire (FunnelStreamSpec pattern)
    ms.addData((-1L, "build", flushNs, 0L)); q.processAllAvailable()
    ms.addData((-1L, "build", flushNs + 1000000000L, 0L)); q.processAllAvailable()
    q.stop()
    spark.table(name).filter($"key" >= 0).as[AsOfMatch].collect()
  }

  test("streaming as-of == native batch as-of on random out-of-order input") {
    val rnd = new scala.util.Random(11)
    val S = 1000000000L // 1s in ns
    val ticks = (1 to 120).map { i =>
      val side = if (rnd.nextBoolean()) "probe" else "build"
      (rnd.nextInt(5).toLong, side, BaseNs + rnd.nextInt(300) * S, i.toLong)
    }
      // one build per (key, ts): as-of "latest row" is undefined under
      // in-side ties (same contract as the batch operator's spec)
      .groupBy(t => (t._1, t._2, t._3)).map(_._2.head).toSeq
    // shuffle into 4 arbitrary-order batches — arrival order ⊥ event
    // time. The watermark delay (1 h) exceeds the whole 300 s event
    // span, so NOTHING is contractually late: every tick must be
    // buffered and every answer must come out exact at the flush. The
    // 10 s-delay tests below cover the incremental-sealing path; this
    // one proves full out-of-order buffering + retro-matching.
    val batches = rnd.shuffle(ticks).grouped(30).map(_.toSeq).toSeq
    val flush = ticks.map(_._3).max + 7200 * S

    val got = run("asof_stream", batches, flush, delay = "1 hour")
      .map(m => (m.key, m.probe_payload, m.probe_ns, m.build_payload, m.build_ns))
      .toSet

    val probeDf = ticks.filter(_._2 == "probe")
      .map(t => (t._1, t._3, t._4)).toDF("k", "t", "pid")
    val buildDf = ticks.filter(_._2 == "build")
      .map(t => (t._1, t._3, t._4)).toDF("bk", "bt", "bid")
    val expect = AsOf.asOfJoinNative(probeDf, buildDf, "k", "t", "bk", "bt")
      .select("k", "pid", "t", "bid", "bt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect,
      s"stream-only: ${got.diff(expect).take(3)}; batch-only: ${expect.diff(got).take(3)}")
    assert(got.nonEmpty)
  }

  test("a late build inside the watermark retroactively wins") {
    val S = 1000000000L
    val batches = Seq(
      // probe at t=100s and a build at t=10s arrive first
      Seq((1L, "probe", BaseNs + 100 * S, 7L), (1L, "build", BaseNs + 10 * S, 70L)),
      // a LATER batch delivers a build at t=99s — earlier than the
      // probe, later than everything seen; the probe is still pending
      // (watermark ≈ 90s < 100s), so the answer must flip to it
      Seq((1L, "build", BaseNs + 99 * S, 99L)))
    val got = run("asof_retro", batches, BaseNs + 200 * S)
    assert(got.length == 1)
    assert(got.head.build_payload == 99L && got.head.build_ns == BaseNs + 99 * S)
  }

  test("probes with no prior build emit nothing (inner as-of)") {
    val S = 1000000000L
    val batches = Seq(Seq(
      (1L, "probe", BaseNs + 5 * S, 1L),        // before any build
      (2L, "probe", BaseNs + 50 * S, 2L),       // key with no builds at all
      (1L, "build", BaseNs + 10 * S, 10L),
      (1L, "probe", BaseNs + 20 * S, 3L)))      // matched
    val got = run("asof_inner", batches, BaseNs + 200 * S)
    assert(got.map(_.probe_payload).toSet == Set(3L))
    assert(got.head.build_payload == 10L)
  }

  private def runLeft(name: String,
                      batches: Seq[Seq[(Long, String, Long, Long)]],
                      flushNs: Long,
                      delay: String = "10 seconds"): Array[AsOfLeftMatch] = {
    val ms = MemoryStream[(Long, String, Long, Long)]
    val out = AsOfStream.streamingAsOfLeft(
      ms.toDS().toDF("key", "side", "ts_ns", "payload")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        .withWatermark("ts", delay)
        .as[AsOfTick])
    val q = out.toDF().writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(name).start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    ms.addData((-1L, "build", flushNs, 0L)); q.processAllAvailable()
    ms.addData((-1L, "build", flushNs + 1000000000L, 0L)); q.processAllAvailable()
    q.stop()
    spark.table(name).filter($"key" >= 0).as[AsOfLeftMatch].collect()
  }

  test("left streaming as-of == native batch left as-of (differential)") {
    val rnd = new scala.util.Random(23)
    val S = 1000000000L
    val ticks = (1 to 120).map { i =>
      val side = if (rnd.nextBoolean()) "probe" else "build"
      (rnd.nextInt(5).toLong, side, BaseNs + rnd.nextInt(300) * S, i.toLong)
    }.groupBy(t => (t._1, t._2, t._3)).map(_._2.head).toSeq
    val batches = rnd.shuffle(ticks).grouped(30).map(_.toSeq).toSeq
    val flush = ticks.map(_._3).max + 7200 * S
    val got = runLeft("asof_left_stream", batches, flush, delay = "1 hour")
      .map(m => (m.key, m.probe_payload, m.probe_ns,
        m.build_payload.getOrElse(-1L), m.build_ns.getOrElse(-1L))).toSet
    val probeDf = ticks.filter(_._2 == "probe")
      .map(t => (t._1, t._3, t._4)).toDF("k", "t", "pid")
    val buildDf = ticks.filter(_._2 == "build")
      .map(t => (t._1, t._3, t._4)).toDF("bk", "bt", "bid")
    val expect = AsOf.asOfJoinNative(probeDf, buildDf, "k", "t", "bk", "bt",
        leftOuter = true)
      .select(col("k"), col("pid"), col("t"),
        coalesce(col("bid"), lit(-1L)), coalesce(col("bt"), lit(-1L)))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expect,
      s"stream-only: ${got.diff(expect).take(3)}; batch-only: ${expect.diff(got).take(3)}")
    // EVERY probe emitted exactly once — the left contract
    assert(got.size == ticks.count(_._2 == "probe"))
    // and at least one null-padded row exists (probe before any build)
    assert(got.exists(_._4 == -1L))
  }
}
