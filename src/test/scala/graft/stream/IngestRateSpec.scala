package graft.stream

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Landing-zone ingest controls: with a 100 TB backlog in the source
  * directory, the stream must (a) bound each micro-batch
  * (maxFilesPerTrigger — otherwise the first trigger plans the ENTIRE
  * backlog as one batch) and (b) support drain-then-stop catch-up runs
  * (Trigger.AvailableNow — the scheduled-batch-job-over-streaming-
  * checkpoint pattern, which keeps exactly-once bookkeeping without a
  * resident cluster). CheckpointSpec covers discovery + restart; this
  * spec pins the rate/termination controls. */
class IngestRateSpec extends SparkSpec {

  test("maxFilesPerTrigger bounds batches; AvailableNow drains backlog and stops") {
    val src = Files.createTempDirectory("graft_ingest_src").toString
    val docs = Paths.get(sf, "documents.parquet")
    val docsDf = spark.read.parquet(docs.toString)
    val (perFile, schema) = (docsDf.count(), docsDf.schema)
    // a 3-file backlog present BEFORE the stream starts
    (1 to 3).foreach { i =>
      Files.copy(docs, Paths.get(src, s"f$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
      .writeStream.format("memory").queryName("ingest_rate")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    // AvailableNow terminates on its own once the backlog is drained
    assert(q.awaitTermination(120000), "AvailableNow did not self-terminate")
    assert(spark.table("ingest_rate").count() == 3 * perFile)
    // one file per micro-batch: every data batch saw exactly one file's rows
    val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
    assert(dataBatches.length == 3,
      q.recentProgress.map(_.numInputRows).mkString(","))
    assert(dataBatches.forall(_.numInputRows == perFile))
  }
}
