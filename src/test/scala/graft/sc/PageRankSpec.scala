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
}
