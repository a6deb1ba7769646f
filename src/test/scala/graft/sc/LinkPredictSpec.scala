package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], minCn: Long = 2) =
    LinkPredict.commonNeighbors(edges.toDF("a", "b"), minCn)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("square graph: diagonals share 2 neighbors, edges are excluded") {
    // 1-2, 2-3, 3-4, 1-4: both diagonals (1,3) and (2,4) close 2 wedges
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)))
    assert(got == Map(
      (1L, 3L) -> (2L, 2L, 2L),
      (2L, 4L) -> (2L, 2L, 2L)))
  }

  test("existing edges never appear even with many common neighbors") {
    // triangle + shared neighbors: (1,2) is an edge, must not appear
    val got = run(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L)))
    assert(!got.contains((1L, 2L)))
    // (3,4) shares neighbors 1 and 2 and is non-adjacent
    assert(got((3L, 4L))._1 == 2L)
  }

  test("cn can never exceed min(deg_u, deg_w)") {
    LinkPredict.linkPredict(spark, sf).collect().foreach { r =>
      val (cn, du, dw) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cn <= math.min(du, dw))
    }
  }
}
