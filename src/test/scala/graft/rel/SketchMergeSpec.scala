package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SketchMergeSpec extends SparkSpec {

  test("merged shard sketches equal one direct sketch, within HLL error of exact") {
    val out = Relational.aggSketchMerge(spark, sf).head()
    val approx = out.getAs[Long]("approx_custs")
    // merge-of-shards == sketch-of-whole: HLL register state is a max
    // over hashes, so sharding then unioning must reproduce the direct
    // sketch bit-for-bit (same estimate)
    val direct = Tables.orders(spark, sf)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey")))
        .cast("long").as("e")).head().getAs[Long]("e")
    assert(approx == direct, s"merged=$approx direct=$direct")
    // error envelope vs exact (default lgConfigK=12 → ~1.6% rse; gate 5%)
    val exact = Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("sketch merge is deterministic across runs") {
    val a = Relational.aggSketchMerge(spark, sf).collect().toSeq
    val b = Relational.aggSketchMerge(spark, sf).collect().toSeq
    assert(a == b)
  }
}
