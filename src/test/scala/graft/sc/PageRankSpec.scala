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
