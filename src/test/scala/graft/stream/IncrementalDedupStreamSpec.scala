package graft.stream

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The production corpus-admission loop as a stream: each micro-batch of
  * candidate documents is screened against the corpus-SO-FAR with the
  * same three-rung screenIncrement used by q_dedup_incremental (exact /
  * canonical / banded-SimHash near), and admitted docs JOIN the corpus —
  * so a duplicate of a doc admitted two batches ago is rejected exactly
  * like a duplicate of the seed corpus. foreachBatch + localCheckpoint
  * is the in-test stand-in for the table-format append a production
  * sink does (the MergeStreamSpec pattern). */
class IncrementalDedupStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // ~120-token docs drawn seed-deterministically from a 400-word vocab:
  // distinct seeds give distinct token MULTISETS (a cyclic-pattern doc
  // family would share one multiset and SimHash-collide across seeds)
  private def longDoc(seed: Int): String = {
    val rng = new scala.util.Random(seed)
    (0 until 120).map(_ => s"w${rng.nextInt(400)}").mkString(" ")
  }
  private def mutate(text: String, at: Set[Int]): String =
    text.split(" ").zipWithIndex
      .map { case (w, i) => if (at(i)) s"z$i" else w }.mkString(" ")

  test("streamed admission rejects dups against seed AND prior batches") {
    val seed = (0L to 4L).map(i => (i, longDoc(i.toInt * 100))).toDF("doc_id", "text")

    val novelA = longDoc(1000)
    val novelB = longDoc(2000)
    val batches = Seq(
      Seq(10L -> novelA,                        // novel -> admit
          11L -> longDoc(0)),                   // exact dup of seed 0
      Seq(12L -> (longDoc(100).toUpperCase + "!!"), // canon drift of seed 1
          13L -> mutate(novelA, Set(5, 50))),   // near-dup of 10 (batch 1!)
      Seq(14L -> novelA,                        // exact dup of 10
          15L -> novelB))                       // novel -> admit

    var corpus: DataFrame = seed.localCheckpoint()
    var reports = Map.empty[Long, (Boolean, Boolean, Boolean, Boolean)]
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rep = Dedup.screenIncrement(corpus, batch).collect()
        reports ++= rep.map(r => r.getLong(0) ->
          (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4)))
        val admitted = batch.join(
          rep.filter(_.getBoolean(4)).map(_.getLong(0)).toSeq.toDF("doc_id"),
          Seq("doc_id"))
        corpus = corpus.union(admitted.select("doc_id", "text")).localCheckpoint()
      }
      .start()
    batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // (exact, canon, near, admit) per doc
    assert(reports(10L) == ((false, false, false, true)), s"10: ${reports(10L)}")
    assert(reports(11L)._1 && !reports(11L)._4)          // exact rung
    assert(reports(12L)._2 && !reports(12L)._4)          // canonical rung
    assert(reports(13L)._3 && !reports(13L)._4,          // near rung, vs a
      s"13: ${reports(13L)}")                            // PRIOR-batch admit
    assert(reports(14L)._1 && !reports(14L)._4)          // exact, prior batch
    assert(reports(15L) == ((false, false, false, true)), s"15: ${reports(15L)}")

    // corpus grew by exactly the admitted docs
    val ids = corpus.select("doc_id").as[Long].collect().toSet
    assert(ids == (0L to 4L).toSet + 10L + 15L)
  }

  test("cohort retention maintained incrementally equals the batch form") {
    import org.apache.spark.sql.functions._
    val WEEK = 604800000000L
    def at(w: Long, u: Long) = new java.sql.Timestamp((w * WEEK + u) / 1000)
    // 40 (user, week) activity pairs over 6 weeks, arrival-shuffled
    val rng = new scala.util.Random(11L)
    val pairs = (for {
      u <- 1L to 10L
      w <- 0L to 5L if rng.nextBoolean() || w == u % 3 // planted churn
    } yield (u, at(w, u))).toSeq
    val shuffled = rng.shuffle(pairs)
    val arrival = shuffled.grouped(shuffled.size / 4 + 1).toSeq

    // incremental state: the compacted distinct (user, wk) activity
    // frame — calendar-bounded, the report is recomputed from it per
    // batch (cheap: |users|x|weeks|). Arrival order must not matter
    // because min(first-seen) and the distinct pairs are both
    // order-insensitive.
    var activity = Seq.empty[(Long, Long)].toDF("user_id", "wk")
      .localCheckpoint()
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = ms.toDS().toDF("user_id", "ts")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val wk = batch.select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
        activity = activity.union(wk).distinct().localCheckpoint()
      }
      .start()
    arrival.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    q.stop()

    // report from maintained state vs one-shot batch over all events
    val fromState = {
      val c = activity.groupBy("user_id").agg(min(col("wk")).as("c0"))
      activity.join(c, "user_id")
        .groupBy(col("c0"), (col("wk") - col("c0")).as("off"))
        .agg(count_distinct(col("user_id")).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    }
    val batchForm = Events.cohortRetention(pairs.toDF("user_id", "ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fromState == batchForm,
      s"incremental state diverged\n$fromState\n$batchForm")
  }
}
