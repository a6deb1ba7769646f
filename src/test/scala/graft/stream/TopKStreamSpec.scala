package graft.stream

import graft.SparkSpec
import graft.functions.{BoundedTopK, ScoreId}
import graft.stream.TopKStream.Scored
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The streaming leaderboard must equal the batch BoundedTopK over the
  * union of every micro-batch, for any batch split — that's the monoid
  * argument made executable through a real StreamingQuery. */
class TopKStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val batches: Seq[Seq[Scored]] = Seq(
    Seq(Scored("a", 5.0, 1), Scored("a", 9.0, 2), Scored("b", 1.0, 3)),
    Seq(Scored("a", 9.0, 0), Scored("a", 2.0, 4), Scored("b", 7.0, 5),
        Scored("b", 7.0, 6)),
    Seq(Scored("a", 6.0, 7), Scored("c", 4.0, 8), Scored("b", 0.5, 9)))

  test("streamed top-k state == batch aggregation after every prefix") {
    val ms = MemoryStream[Scored]
    val out = TopKStream.topKStreaming(ms.toDS(), 3)
    val q = out.writeStream.format("memory")
      .queryName("topk_stream").outputMode("update").start()
    try {
      val agg = BoundedTopK(3)
      for (n <- batches.indices) {
        ms.addData(batches(n): _*)
        q.processAllAvailable()
        // latest emission per key vs batch fold over batches(0..n)
        val rows = spark.table("topk_stream").collect()
        val latest = rows.zipWithIndex
          .groupBy(_._1.getString(0))
          .map { case (k, v) => k -> v.maxBy(_._2)._1.getSeq[Any](1) }
        val expect = batches.take(n + 1).flatten
          .groupBy(_.key)
          .map { case (k, v) =>
            k -> v.foldLeft(agg.zero)((b, r) =>
              agg.reduce(b, ScoreId(r.score, r.id)))
          }
        assert(latest.keySet == expect.keySet, s"after batch $n")
        expect.foreach { case (k, want) =>
          val got = latest(k).map { a =>
            val r = a.asInstanceOf[org.apache.spark.sql.Row]
            ScoreId(r.getDouble(0), r.getLong(1))
          }.toList
          assert(got == want, s"key $k after batch $n: $got != $want")
        }
      }
    } finally q.stop()
  }

  test("ties across batch boundaries resolve by id, same as batch") {
    // (9.0, 2) arrives in batch 0, (9.0, 0) in batch 1: the later-arriving
    // row must still WIN rank 1 on the id tie-break — state is a proper
    // top-k, not first-seen-wins
    val ms = MemoryStream[Scored]
    val out = TopKStream.topKStreaming(ms.toDS(), 3)
    val q = out.writeStream.format("memory")
      .queryName("topk_ties").outputMode("update").start()
    try {
      ms.addData(batches(0): _*); q.processAllAvailable()
      ms.addData(batches(1): _*); q.processAllAvailable()
      val a = spark.table("topk_ties").collect()
        .filter(_.getString(0) == "a").last.getSeq[org.apache.spark.sql.Row](1)
      assert(a.head.getLong(1) == 0L && a.head.getDouble(0) == 9.0)
      assert(a(1).getLong(1) == 2L && a(1).getDouble(0) == 9.0)
    } finally q.stop()
  }
}
