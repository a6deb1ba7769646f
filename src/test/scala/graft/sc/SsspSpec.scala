package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SsspSpec extends SparkSpec {
  import spark.implicits._

  private def dists(edges: Seq[(Long, Long, Long)], rounds: Int) =
    Sssp.ssspOnEdges(edges.toDF("a", "b", "w"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: distances accumulate edge weights from the source") {
    // 1 -5- 2 -3- 3 -2- 4  (source = min id = 1)
    val d = dists(Seq((1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 2L)), 5)
    assert(d == Map(1L -> 0L, 2L -> 5L, 3L -> 8L, 4L -> 10L))
  }

  test("relaxation prefers two cheap hops over one heavy edge") {
    // direct 1-3 costs 10; 1-2-3 costs 2+2=4
    val d = dists(Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 10L)), 5)
    assert(d(3L) == 4L)
  }

  test("rounds cap: only paths of <= rounds edges are relaxed") {
    // chain of 4 edges; with rounds=2 only <=2-edge paths exist, so
    // nodes 4 and 5 are unreached and node 3 sits at exactly 2
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
    val d2 = dists(chain, 2)
    assert(d2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("disconnected component never appears") {
    val d = dists(Seq((1L, 2L, 1L), (7L, 8L, 1L)), 5)
    assert(d.keySet == Set(1L, 2L))
  }

  test("kNN-graph sssp: bounded by hop-count lower bound and reaches bfs set") {
    val sssp = Sssp.sssp(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bfs = Bfs.bfs(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // every weight >= 1, so dist >= hop count wherever both are defined
    // (Sssp.Rounds=5 >= Bfs.Hops=4, so the bfs set is a subset)
    assert(bfs.keySet.subsetOf(sssp.keySet))
    bfs.foreach { case (id, h) => assert(sssp(id) >= h.toLong) }
  }
}
