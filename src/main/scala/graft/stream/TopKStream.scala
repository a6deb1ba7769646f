package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.functions.{BoundedTopK, ScoreId}
import graft.tables.Tables

/** Continuously-maintained grouped top-k (a streaming leaderboard): the
  * k highest-value events per event_type, exact at all times.
  *
  * The batch form is BoundedTopK over a groupBy — one keyed shuffle,
  * O(k) agg state (see BoundedTopK's scaladoc). The streaming form keeps
  * the SAME bounded buffer as mapGroupsWithState state and folds each
  * micro-batch's rows into it with the SAME reduce — because
  * (fold, merge) is an associative-commutative monoid on the capped
  * sorted list (pinned by BoundedTopKSpec's property test), the stream's
  * state after any prefix of batches equals the batch aggregator over
  * the union of those batches (TopKStreamSpec proves it end-to-end
  * through a MemoryStream). State per key is O(k) forever — no
  * watermark needed, nothing accumulates, which is what lets a
  * leaderboard run for months on a 100 TB/day stream.
  */
object TopKStream {
  type Q = (SparkSession, String) => DataFrame

  val K = 3

  /** Batch twin (`q_stream_topk`): top-3 events by value per event_type.
    * value has ~5 significant digits over 100k rows — collisions exist,
    * so event_id breaks ties totally (oracle parity). */
  def topKBatch(s: SparkSession, d: String): DataFrame = {
    val top = udaf(BoundedTopK(K))
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(top(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")))
      .select(col("event_type"), col("col.id").as("event_id"),
        round(col("col.score"), 4).as("value"),
        (col("pos") + 1).cast("int").as("rn"))
      .orderBy("event_type", "rn")
  }

  /** One scored stream element. */
  case class Scored(key: String, score: Double, id: Long)

  /** Streaming form: fold each micro-batch into the capped per-key
    * buffer; emit the key's current top-k after every batch that touched
    * it (Update mode). `GroupStateTimeout.NoTimeout` is deliberate —
    * the state can live forever BECAUSE it cannot grow. */
  def topKStreaming(events: Dataset[Scored], k: Int): Dataset[(String, Seq[ScoreId])] = {
    import events.sparkSession.implicits._
    val agg = BoundedTopK(k)
    events.groupByKey(_.key)
      .mapGroupsWithState[List[ScoreId], (String, Seq[ScoreId])](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Scored], state: GroupState[List[ScoreId]]) =>
          val next = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, ScoreId(r.score, r.id))
          }
          state.update(next)
          key -> next
      }
  }

  val queries: Map[String, Q] = Map(
    "q_stream_topk" -> topKBatch _)

  val oracle: Map[String, String] = Map(
    "q_stream_topk" ->
      """SELECT event_type, event_id, round(value, 4) AS value,
                CAST(rn AS INT) AS rn
         FROM (SELECT event_type, event_id, value,
                      row_number() OVER (PARTITION BY event_type
                        ORDER BY value DESC, event_id) AS rn
               FROM events)
         WHERE rn <= 3
         ORDER BY event_type, rn""")
}
