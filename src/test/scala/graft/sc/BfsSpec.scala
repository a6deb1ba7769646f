package graft.sc

import graft.SparkSpec

/** Closed-form graphs through Bfs.bfsOnEdges — the same joins the
  * q_graph_bfs query runs over the kNN substrate. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], hops: Int): Map[Long, Int] =
    Bfs.bfsOnEdges(edges.toDF("a", "b"), hops)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path graph: hop distance equals position along the path") {
    // 1-2-3-4-5; seed = min node = 1
    val d = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), hops = 4)
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4))
  }

  test("hop cap truncates the frontier, it does not mislabel it") {
    val d = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), hops = 2)
    assert(d === Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("disconnected component is absent, not distance-0") {
    val d = run(Seq((1L, 2L), (10L, 11L)), hops = 4)
    assert(d === Map(1L -> 0, 2L -> 1))
  }

  test("cycle: BFS takes the shorter arc and settles each node once") {
    // 6-cycle 1..6: node 4 is 3 hops either way; nodes settle exactly once
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 6L))
    val out = Bfs.bfsOnEdges(edges.toDF("a", "b"), 4).collect()
    assert(out.length === out.map(_.getLong(0)).distinct.length)
    val d = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 0, 2L -> 1, 6L -> 1, 3L -> 2, 5L -> 2, 4L -> 3))
  }
}
