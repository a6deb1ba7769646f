package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** 2-D grid-bucketed containment join: points (first two embedding
  * dimensions) against a set of query boxes — the two-dimensional
  * sibling of Temporal.rangeJoin's day-bucket trick, and the standard
  * way a "WHERE x BETWEEN … AND y BETWEEN …" theta join survives scale.
  *
  * Scale shape: the naive plan is a BroadcastNestedLoopJoin evaluating
  * every (box, point) pair — O(|boxes|·|points|). Instead each box
  * EXPLODES to the grid cells it covers (bounded: box extent / cell
  * size, here ≤ 5×5) and each point lands in exactly ONE cell
  * (floor(x/c), floor(y/c)), so the join is a plain equi-join on the
  * cell key — a keyed shuffle, linear in points — with the exact
  * containment predicate filtering inside buckets. Because a point has
  * one cell, a (box, point) pair can match in at most one bucket: no
  * post-join dedup. Monotonicity of floor makes the cell cover
  * complete: x ∈ [xmin, xmax] ⇒ floor(x/c) ∈ [floor(xmin/c),
  * floor(xmax/c)]. The boxes frame is tiny and broadcast; at 100 TB
  * of points nothing changes — the shuffle stays keyed on cells.
  *
  * The DuckDB oracle runs the naive theta join over the same literal
  * boxes (Double.toString round-trips exactly, so both engines parse
  * identical doubles), re-proving bucket-cover completeness at every
  * gate run — the same oracle pattern as the banded-LSH rungs. */
object SpatialGrid {
  type Q = (SparkSession, String) => DataFrame

  val Cell = 0.1

  /** (box_id, xmin, xmax, ymin, ymax) — literal query boxes spanning the
    * embedding range (~±0.4), sized to cover 2–5 cells per axis. */
  val Boxes: Seq[(Int, Double, Double, Double, Double)] = Seq(
    (0, -0.4, -0.15, -0.4, -0.1),
    (1, -0.2, 0.05, -0.25, 0.0),
    (2, -0.05, 0.2, -0.1, 0.15),
    (3, 0.1, 0.35, 0.0, 0.3),
    (4, -0.35, 0.0, 0.05, 0.35),
    (5, -0.1, 0.3, -0.35, -0.05),
    (6, -0.4, 0.4, -0.05, 0.05), // wide, flat band
    (7, -0.05, 0.05, -0.4, 0.35) // tall, thin band
  )

  def boxesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Boxes.toDF("box_id", "xmin", "xmax", "ymin", "ymax")
  }

  def spatialGridJoin(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.embeddings(s, d).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
      .withColumn("cx", floor(col("x") / Cell))
      .withColumn("cy", floor(col("y") / Cell))
    val cells = boxesDf(s)
      .withColumn("cx", explode(sequence(
        floor(col("xmin") / Cell), floor(col("xmax") / Cell))))
      .withColumn("cy", explode(sequence(
        floor(col("ymin") / Cell), floor(col("ymax") / Cell))))
    pts.join(broadcast(cells), Seq("cx", "cy"))
      .filter(col("x") >= col("xmin") && col("x") <= col("xmax") &&
        col("y") >= col("ymin") && col("y") <= col("ymax"))
      .select(col("box_id"), col("vec_id"))
      .orderBy("box_id", "vec_id")
  }

  val queries: Map[String, Q] =
    Map("q_join_spatial_grid" -> spatialGridJoin _)

  val oracle: Map[String, String] = {
    val values = Boxes.map { case (id, x0, x1, y0, y1) =>
      s"($id, $x0, $x1, $y0, $y1)"
    }.mkString(", ")
    Map("q_join_spatial_grid" ->
      s"""WITH b(box_id, xmin, xmax, ymin, ymax) AS (VALUES $values),
         e AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
                      CAST(embedding[2] AS DOUBLE) AS y
               FROM embeddings)
         SELECT CAST(b.box_id AS INT) AS box_id, e.vec_id
         FROM b JOIN e
           ON e.x >= b.xmin AND e.x <= b.xmax
          AND e.y >= b.ymin AND e.y <= b.ymax
         ORDER BY box_id, vec_id""")
  }
}
