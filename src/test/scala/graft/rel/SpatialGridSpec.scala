package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SpatialGridSpec extends SparkSpec {
  import spark.implicits._

  test("grid-bucketed containment join == naive theta join (differential)") {
    val got = SpatialGrid.spatialGridJoin(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val pts = Tables.embeddings(spark, sf).select(
      $"vec_id",
      element_at($"embedding", 1).cast("double").as("x"),
      element_at($"embedding", 2).cast("double").as("y"))
    val want = SpatialGrid.boxesDf(spark)
      .join(pts,
        $"x" >= $"xmin" && $"x" <= $"xmax" &&
          $"y" >= $"ymin" && $"y" <= $"ymax")
      .select($"box_id", $"vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("no duplicate (box, point) pairs — a point lives in exactly one cell") {
    val dups = SpatialGrid.spatialGridJoin(spark, sf)
      .groupBy("box_id", "vec_id").count().filter($"count" > 1).count()
    assert(dups == 0L)
  }

  test("plan is an equi-join on the cell key, not a nested loop") {
    val plan = planOf(SpatialGrid.spatialGridJoin(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }
}
