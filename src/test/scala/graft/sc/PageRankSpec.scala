package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {

  test("pagerank conserves rank mass and is strictly positive") {
    val pr = PageRank.pageRank(spark, sf).cache()
    try {
      val rows = pr.collect()
      assert(rows.nonEmpty)
      // no dangling nodes in a kNN graph → total mass stays 1 (up to the
      // final 6-dp rounding of |nodes| values)
      val mass = rows.map(_.getDouble(1)).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"mass=$mass")
      assert(rows.forall(_.getDouble(1) > 0))
      // one row per node
      assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    } finally pr.unpersist()
  }

  test("pagerank is deterministic across runs") {
    val a = PageRank.pageRank(spark, sf).collect().toSeq
    val b = PageRank.pageRank(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("uniform out-degree regular graph converges to uniform ranks") {
    // on a directed cycle (out-degree 1, in-degree 1) every node keeps
    // exactly 1/n — a closed-form check of the SHIPPED operator's
    // update arithmetic on a supplied edge list
    import spark.implicits._
    val n = 8
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
      .toDF("id1", "id2")
    val vals = PageRank.pageRankOnEdges(ring, iters = 5)
      .collect().map(_.getDouble(1))
    assert(vals.length == n)
    vals.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-12, v.toString))
  }

  test("pure sinks are ranked: floor plus received mass, nothing onward") {
    // star a->c, b->c: c sources no edge, so the old distinct(id1) node
    // set dropped it (and the mass it receives). With the union node set,
    // after 1 iteration: a, b = (1-d)/3 (receive nothing); c = (1-d)/3 +
    // d*(r_a/1 + r_b/1) with r_a = r_b = 1/3.
    import spark.implicits._
    val star = Seq((0L, 2L), (1L, 2L)).toDF("id1", "id2")
    val got = PageRank.pageRankOnEdges(star, iters = 1, damping = 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val floor = 0.15 / 3
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(math.abs(got(0L) - floor) < 1e-12)
    assert(math.abs(got(1L) - floor) < 1e-12)
    assert(math.abs(got(2L) - (floor + 0.85 * (2.0 / 3))) < 1e-12)
    // dangling mass is NOT redistributed: total sum < 1 from round 2 on
    val r2 = PageRank.pageRankOnEdges(star, iters = 2, damping = 0.85)
      .collect().map(_.getDouble(1)).sum
    assert(r2 < 1.0 - 1e-6, s"mass after sink drain = $r2")
  }

  test("dangling redistribution: ranks sum to 1 on a sink-bearing graph") {
    import spark.implicits._
    // star with three sinks: 0 -> {1,2,3}; without redistribution this
    // graph drains (previous test); with it, mass is conserved exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id1", "id2")
    for (iters <- Seq(1, 2, 10)) {
      val sum = PageRank.pageRankOnEdges(star, iters = iters,
          redistributeDangling = true)
        .agg(org.apache.spark.sql.functions.sum("r")).head().getDouble(0)
      assert(math.abs(sum - 1.0) < 1e-9, s"iters=$iters sum=$sum")
    }
    // closed form after 1 round (n=4, d=0.85): sinks held 3/4 of the
    // mass, so every node gets (1-d)/4 + d*(3/4)/4; node 0 additionally
    // nothing (no in-edges beyond redistribution), targets get d*(1/4)/3
    val r1 = PageRank.pageRankOnEdges(star, iters = 1,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = 0.15 / 4 + 0.85 * (3.0 / 4) / 4
    assert(math.abs(r1(0L) - base) < 1e-12)
    Seq(1L, 2L, 3L).foreach(id =>
      assert(math.abs(r1(id) - (base + 0.85 * (1.0 / 4) / 3)) < 1e-12))
    // sink-free graph: both variants coincide (dangling mass is 0)
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("id1", "id2")
    val a = PageRank.pageRankOnEdges(ring, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.pageRankOnEdges(ring, iters = 5,
        redistributeDangling = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    a.foreach { case (id, v) => assert(math.abs(v - b(id)) < 1e-15) }
  }

  test("triangles: 4-clique counts 3 per node with cc=1; a path has none") {
    import spark.implicits._
    // K4 on {0,1,2,3}: every node sits in C(3,2)=3 triangles, cc = 1
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b }
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val got = PageRank.trianglesOnEdges(k4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == 4)
    got.foreach { case (_, deg, nTri, cc) =>
      assert(deg == 3 && nTri == 3 && math.abs(cc - 1.0) < 1e-6, got.mkString(","))
    }
    // path 0-1-2-3: no triangles anywhere, cc = 0
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val p = PageRank.trianglesOnEdges(path).collect()
    assert(p.length == 4)
    p.foreach(r => assert(r.getLong(2) == 0 && r.getDouble(3) < 1e-6))
  }
}
