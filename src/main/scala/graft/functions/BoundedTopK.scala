package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state grouped top-k.
  *
  * The two built-in routes to "top k rows per group" both carry state
  * proportional to the GROUP, not to k:
  *  - `row_number() OVER (PARTITION BY g ORDER BY s) <= k` sorts every
  *    group's full row set inside the window exchange;
  *  - `slice(sort_array(collect_list(struct(...))), 1, k)` buffers every
  *    row of the group in the aggregation state before truncating.
  * At 100 TB, a hot group (one customer with 10^8 orders) makes both
  * spill or die. This Aggregator's accumulator is a descending-sorted
  * list CAPPED AT k: `reduce` drops a row the moment it can't beat the
  * k-th best, so state is O(k) per group on every mapper, partial
  * aggregation works (map-side combine collapses each partition to ≤k
  * rows per group BEFORE the shuffle), and `merge` is an O(k) sorted
  * merge. The shuffle then moves at most k rows per (group × partition)
  * — the same reason TakeOrderedAndProject beats global sort for q_topk,
  * applied per group.
  *
  * Ordering is total — (score DESC, id ASC) — so results are
  * deterministic under any partitioning and match a row_number oracle
  * with the same tie-break. */
case class ScoreId(score: Double, id: Long)

case class BoundedTopK(k: Int)
    extends Aggregator[ScoreId, List[ScoreId], Seq[ScoreId]] {
  require(k > 0, s"k must be positive, got $k")

  private def beats(a: ScoreId, b: ScoreId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[ScoreId] = Nil

  override def reduce(buf: List[ScoreId], row: ScoreId): List[ScoreId] = {
    // fast path: buffer full and the row can't beat the current k-th —
    // THE common case on a big group, and the reason state stays O(k)
    if (buf.lengthCompare(k) >= 0 && !beats(row, buf.last)) buf
    else {
      val (better, rest) = buf.span(beats(_, row))
      (better ::: row :: rest).take(k)
    }
  }

  override def merge(b1: List[ScoreId], b2: List[ScoreId]): List[ScoreId] = {
    // O(k) merge of two sorted runs
    val out = List.newBuilder[ScoreId]
    var (x, y, n) = (b1, b2, 0)
    while (n < k && (x.nonEmpty || y.nonEmpty)) {
      if (y.isEmpty || (x.nonEmpty && beats(x.head, y.head))) {
        out += x.head; x = x.tail
      } else { out += y.head; y = y.tail }
      n += 1
    }
    out.result()
  }

  override def finish(r: List[ScoreId]): Seq[ScoreId] = r

  override def bufferEncoder: Encoder[List[ScoreId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoreId]]()
  override def outputEncoder: Encoder[Seq[ScoreId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoreId]]()
}
