package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Checkpointed recovery: a file-source → file-sink stream stopped and
  * restarted from its checkpoint must process each input file exactly once
  * (offsets from the WAL, no reprocessing, no loss). */
class CheckpointSpec extends SparkSpec {

  test("restarted query resumes from checkpoint exactly-once") {
    val src = Files.createTempDirectory("graft_ck_src").toString
    val out = Files.createTempDirectory("graft_ck_out").toString
    val chk = Files.createTempDirectory("graft_ck_chk").toString
    val events = Paths.get(sf, "events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(events.toString).schema
    val perFile = spark.read.parquet(events.toString).count()

    // normalize ts to TIMESTAMP whichever physical type the generation used
    // (BIGINT nanos under nanosAsLong, or TimestampType micros directly)
    val tsIsLong =
      schema("ts").dataType == org.apache.spark.sql.types.LongType
    def startQuery() = {
      val in = spark.readStream.schema(schema).parquet(src)
      val norm =
        if (tsIsLong) in.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        else in
      norm.writeStream.format("parquet")
        .option("checkpointLocation", chk)
        .option("path", out)
        .start()
    }

    // batch 1: one input file
    Files.copy(events, Paths.get(src, "f1.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == perFile)

    // stop-the-world, new file arrives, restart from the same checkpoint
    Files.copy(events, Paths.get(src, "f2.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val finalCount = spark.read.parquet(out).count()
    // exactly-once: f1 not reprocessed (≠3×), f2 not lost (≠1×)
    assert(finalCount == 2 * perFile,
      s"expected ${2 * perFile}, got $finalCount")
  }
}
