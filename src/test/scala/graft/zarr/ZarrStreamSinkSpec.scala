package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once streaming → versioned zarr: deterministic per-batch
  * version names + the atomic pointer PUT + replay skip. Drives the
  * REAL writeStream/foreachBatch wiring first, then replays batches
  * by hand to prove each duplicate-delivery case the scaladoc claims. */
class ZarrStreamSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def conf = ZarrIO.hadoopConf()
  private def store(): String =
    java.nio.file.Files.createTempDirectory("zarr_ss").resolve("m.zarr").toString

  private def mat(n: Int, dim: Int, shift: Double) =
    (0 until n).map(i => (i.toLong, (0 until dim).map(c =>
      shift + i * dim + c))).toDF("row_id", "vec")

  private def readSum(path: String): Double =
    spark.read.format("zarr").load(path)
      .agg(sum(expr("aggregate(vec, 0D, (a, x) -> a + x)"))).head.getDouble(0)

  test("real writeStream.foreachBatch pipeline commits per-batch snapshots") {
    val path = store()
    val ms = MemoryStream[(Long, Seq[Double])]
    val q = ms.toDF().toDF("row_id", "vec")
      .writeStream
      .foreachBatch(ZarrStreamSink.foreachBatch(path, chunkRows = 8))
      .outputMode("append")
      .start()
    try {
      ms.addData((0L until 20L).map(i => (i, Seq(i * 1.0, i * 2.0))): _*)
      q.processAllAvailable()
      assert(ZarrStreamSink.committedBatch(path).contains(0L))
      assert(spark.read.format("zarr").load(path).count() == 20)
      ms.addData((0L until 30L).map(i => (i, Seq(i * 3.0, i * 4.0))): _*)
      q.processAllAvailable()
      assert(ZarrStreamSink.committedBatch(path).contains(1L))
      assert(spark.read.format("zarr").load(path).count() == 30)
    } finally q.stop()
    // default gc: only the latest batch's version dir remains
    assert(ZarrVersioned.versions(path, conf) ==
      Seq(ZarrStreamSink.versionNameFor(1L)))
  }

  test("replay AFTER commit is skipped (pointer already names the batch) " +
    "— the case that separates exactly-once from at-least-once") {
    val path = store()
    val write = ZarrStreamSink.foreachBatch(path, chunkRows = 8)
    write(mat(10, 3, shift = 0.0), 0L)
    val sum0 = readSum(path)
    // duplicate delivery of batch 0 with DIFFERENT (late, wrong) data:
    // a skipped replay must leave the committed snapshot untouched
    write(mat(10, 3, shift = 1e6), 0L)
    assert(readSum(path) == sum0, "replayed batch must be skipped")
    assert(ZarrStreamSink.committedBatch(path).contains(0L))
    // the NEXT batch advances normally
    write(mat(12, 3, shift = 7.0), 1L)
    assert(ZarrStreamSink.committedBatch(path).contains(1L))
    assert(spark.read.format("zarr").load(path).count() == 12)
  }

  test("replay after a crash MID-BUILD converges: partial dir rebuilt, " +
    "old snapshot served throughout") {
    val path = store()
    val write = ZarrStreamSink.foreachBatch(path, chunkRows = 8)
    write(mat(10, 3, shift = 0.0), 0L)
    val sum0 = readSum(path)
    ZarrVersioned.failpoint =
      s => if (s == "before-commit-point") throw new RuntimeException("crash")
    try intercept[Exception] { write(mat(15, 3, shift = 5.0), 1L) }
    finally ZarrVersioned.failpoint = _ => ()
    // pointer never moved: batch 0 still the committed snapshot
    assert(ZarrStreamSink.committedBatch(path).contains(0L))
    assert(readSum(path) == sum0)
    // the replay rebuilds the SAME version dir and commits
    write(mat(15, 3, shift = 5.0), 1L)
    assert(ZarrStreamSink.committedBatch(path).contains(1L))
    assert(spark.read.format("zarr").load(path).count() == 15)
    assert(ZarrVersioned.versions(path, conf) ==
      Seq(ZarrStreamSink.versionNameFor(1L)))
  }

  test("retainHistory: every batch stays readable via the time-travel pin") {
    val path = store()
    val write = ZarrStreamSink.foreachBatch(path, chunkRows = 8,
      retainHistory = true)
    write(mat(5, 2, shift = 0.0), 0L)
    write(mat(8, 2, shift = 100.0), 1L)
    write(mat(3, 2, shift = 200.0), 2L)
    assert(ZarrVersioned.versions(path, conf) ==
      (0L to 2L).map(ZarrStreamSink.versionNameFor))
    assert(spark.read.format("zarr").load(path).count() == 3) // latest
    assert(spark.read.format("zarr")
      .option("version", ZarrStreamSink.versionNameFor(0L))
      .load(path).count() == 5)
    assert(spark.read.format("zarr")
      .option("version", ZarrStreamSink.versionNameFor(1L))
      .load(path).count() == 8)
    // retention knob: vacuum drops everything the pointer doesn't name
    assert(ZarrVersioned.vacuum(path, conf).toSet ==
      (0L to 1L).map(ZarrStreamSink.versionNameFor).toSet)
    assert(spark.read.format("zarr").load(path).count() == 3)
  }

  test("an out-of-shape version_name is rejected before any write") {
    val e = intercept[Exception] {
      mat(4, 2, shift = 0.0).write.format("zarr")
        .option("version_name", "batch-7").mode("overwrite").save(store())
    }
    assert(e.getMessage.contains("v<N>-<hex>"), e.getMessage)
  }
}
