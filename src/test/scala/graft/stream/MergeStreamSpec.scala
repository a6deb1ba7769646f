package graft.stream

import graft.SparkSpec
import graft.rel.Merge
import graft.tables.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.time.LocalDateTime

/** Streaming CDC apply: a foreachBatch upsert sink folding changelog
  * micro-batches into a running table converges to the one-shot batch
  * MERGE — and does so regardless of arrival order, because applyBatch
  * keeps the max (d, okey) version per key and deletes are tombstones. */
class MergeStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("foreachBatch CDC apply converges to the batch MERGE, any order") {
    val rows = Merge.changelogRows(Tables.orders(spark, sf))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getAs[LocalDateTime](3), r.getLong(4)))
    // shuffle deterministically, then split into 3 arrival batches —
    // deliberately NOT in event-time order
    val shuffled = new scala.util.Random(7L).shuffle(rows.toSeq)
    val batches = shuffled.grouped(shuffled.size / 3 + 1).toSeq

    val ms = MemoryStream[(Long, String, Double, LocalDateTime, Long)]
    var table: DataFrame = Merge.initialTable(spark, sf).localCheckpoint()
    val q = ms.toDS().toDF("k", "op", "bal", "d", "okey")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // fold + cut lineage (the running table would otherwise grow a
        // plan per micro-batch); localCheckpoint is the in-test stand-in
        // for the table-format rewrite a production sink does
        table = Merge.applyBatch(table, batch).localCheckpoint()
      }
      .start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()

    val streamed = Merge.liveRows(table).collect().toSeq
    val oneShot = Merge.mergeUpsert(spark, sf)
      .select("c_custkey", "c_acctbal").collect().toSeq
    assert(streamed.length == oneShot.length,
      s"${streamed.length} vs ${oneShot.length}")
    streamed.zip(oneShot).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
