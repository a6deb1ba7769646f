package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NeighborsSpec extends SparkSpec {

  test("knn graph: k edges per cell, no self loops, mutuality symmetric") {
    val g = Neighbors.knnGraph(spark, sf, k = 10, maxId = 100).cache()
    try {
      val perCell = g.groupBy("id1").agg(count(lit(1)).as("n"))
      assert(perCell.filter(col("n") =!= 10).count() == 0)
      assert(g.filter(col("id1") === col("id2")).count() == 0)
      // mutual is symmetric: (i,j) mutual iff (j,i) present and mutual
      val m = g.filter(col("mutual"))
        .select(col("id1").as("a"), col("id2").as("b"))
      val asym = m.join(
        m.select(col("a").as("b2"), col("b").as("a2")),
        col("a") === col("a2") && col("b") === col("b2"), "left_anti")
      assert(asym.count() == 0)
    } finally g.unpersist()
  }

  test("rank 1 neighbor is the true argmin distance") {
    val g = Neighbors.knnGraph(spark, sf, k = 1, maxId = 60)
    val e = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 60)
      .select(col("vec_id").as("id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val all = e.select(col("id").as("id1"), col("v").as("v1"))
      .join(e.select(col("id").as("id2"), col("v").as("v2")),
        col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        aggregate(zip_with(col("v1"), col("v2"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _).as("d2"))
    val mins = all.groupBy("id1").agg(min(col("d2")).as("dmin"))
    val joined = g.join(all, Seq("id1", "id2")).join(mins, Seq("id1"))
    // rounded-rank ties aside, the chosen edge's distance equals the min
    assert(joined.filter(col("d2") > col("dmin") + 1e-9).count() == 0)
  }
}
