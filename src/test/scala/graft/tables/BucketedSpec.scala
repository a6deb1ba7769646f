package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed join plans with NO exchange") {
    val (to, tc) = Bucketed.ensure(spark, sf)
    // at test scale the planner would broadcast the tiny dimension and
    // skip the bucketed scan entirely; force the merge join — the 100 TB
    // case where neither side broadcasts is what bucketing exists for
    val joined = spark.table(to).hint("merge")
      .join(spark.table(tc), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_mktsegment")
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), plan)
    // the whole point of bucketing: both sides already hash-distributed
    // on the join key at WRITE time — no exchange at read time. (An
    // in-task Sort remains: Spark ignores sortBy metadata on read by
    // default since 3.0 — spark.sql.legacy.bucketedTableScan
    // .outputOrdering — and sorting 1/8th of a table inside each task
    // costs nothing next to the shuffle that bucketing removed.)
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("Bucketed: true"), plan)
    assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
  }

  test("bucketed join result equals the plain-parquet join") {
    val viaBuckets = Bucketed.joinBucketed(spark, sf).collect().toSeq
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")) + lit(1e-6), 2).as("revenue"))
      .orderBy("c_mktsegment").collect().toSeq
    assert(viaBuckets == plain)
  }
}
