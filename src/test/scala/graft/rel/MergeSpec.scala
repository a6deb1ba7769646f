package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {

  test("merge branches: keys unique, inserts are odd, deletes vanish") {
    val out = Merge.mergeUpsert(spark, sf).cache()
    try {
      val n = out.count()
      assert(n > 0)
      // post-merge table is a table: one row per key
      assert(out.select("c_custkey").distinct().count() == n)
      // insert branch only fires for keys OUTSIDE the snapshot (odd keys)
      assert(out.filter(col("action") === "insert" &&
        col("c_custkey") % 2 === 0).count() == 0)
      // matched+delete: even-key customers whose latest order is 'F'
      // must be absent from the result
      val deleted = Merge.changelog(spark, sf)
        .filter(col("op") === "D" && col("k") % 2 === 0)
      assert(out.join(deleted, col("c_custkey") === col("k"), "left_semi")
        .count() == 0)
    } finally out.unpersist()
  }

  test("merge plans as one full-outer SMJ with group-limited compaction") {
    val plan = planOf(Merge.mergeUpsert(spark, sf))
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    // rn = 1 compaction runs as partial+final WindowGroupLimit (top-1 per
    // key pushed below the shuffle), not a full window materialization
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("update branch carries the latest order's totalprice") {
    val out = Merge.mergeUpsert(spark, sf)
    val updated = out.filter(col("action") === "update")
    val expect = Merge.changelog(spark, sf)
      .filter(col("op") === "U")
      .select(col("k"), round(col("bal") + lit(1e-6), 2).as("expect_bal"))
    val mismatches = updated
      .join(expect, col("c_custkey") === col("k"))
      .filter(abs(col("c_acctbal") - col("expect_bal")) > 1e-9)
    assert(mismatches.count() == 0)
  }

  test("keep branch preserves snapshot rows untouched by the changelog") {
    val out = Merge.mergeUpsert(spark, sf)
    val chgKeys = Merge.changelog(spark, sf).select(col("k"))
    val untouched = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 2 === 0)
      .join(chgKeys, col("c_custkey") === col("k"), "left_anti")
    assert(out.filter(col("action") === "keep").count() == untouched.count())
  }
}
