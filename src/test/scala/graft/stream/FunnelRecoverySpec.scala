package graft.stream

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Checkpointed recovery of the STATEFUL funnel: stop the stream after
  * half the events, restart from the checkpoint over the rest, and the
  * accumulated outcomes must equal the batch funnel exactly-once — the
  * flatMapGroupsWithState state (open funnels, seals, tombstones) must
  * survive the restart through the state store, not just the source
  * offsets (CheckpointSpec covers those). */
class FunnelRecoverySpec extends SparkSpec {

  test("funnel state survives a checkpoint restart; outcomes stay exactly-once") {
    val src = Files.createTempDirectory("graft_fr_src").toString
    val out = Files.createTempDirectory("graft_fr_out").toString
    val chk = Files.createTempDirectory("graft_fr_chk").toString

    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts_ns"))
      .orderBy("ts_ns")
    val rows = ev.collect()
    val half = rows.length / 2
    val maxNs = rows.map(_.getLong(2)).max
    def writeChunk(chunk: Seq[(Long, String, Long)], name: String): Unit = {
      import spark.implicits._
      chunk.toDF("user_id", "event_type", "ts_ns")
        .coalesce(1).write.parquet(s"$src/$name")
    }
    writeChunk(rows.take(half).map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))), "c1")

    val schema = spark.read.parquet(s"$src/c1").schema
    def startQuery() = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$src/*")
        .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
        .withWatermark("ts", "1 hour")
        .as[(Long, String, Long, Timestamp)](
          org.apache.spark.sql.Encoders.product[(Long, String, Long, Timestamp)])
      Funnel.statefulFunnel(in)
        .toDF().writeStream.format("parquet")
        .option("checkpointLocation", chk)
        .option("path", out)
        .start()
    }

    // run 1: first half only, then stop mid-funnel (open state persists
    // to the checkpoint's state store)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // run 2: the rest + two watermark-flush chunks (seals evaluate at
    // batch START, so the second flush lets the timeouts fire)
    val D = 86400L * 1000000000L
    writeChunk(rows.drop(half).map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))), "c2")
    writeChunk(Seq((-1L, "noop", maxNs + 3 * D)), "f1")
    writeChunk(Seq((-1L, "noop", maxNs + 4 * D)), "f2")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val got = spark.read.parquet(out).filter(col("user_id") >= 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    val batch = Funnel.funnelConversion(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.length.toLong == batch("1_signup"), s"${got.length}")
    assert(got.count(_._2 >= 2).toLong == batch("2_click_24h"))
    assert(got.count(_._2 == 3).toLong == batch("3_purchase_24h"))
    // exactly-once across the restart boundary
    assert(got.map(_._1).distinct.length == got.length)
  }
}
