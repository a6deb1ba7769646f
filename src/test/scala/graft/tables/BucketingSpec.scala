package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — at 100 TB, pre-bucketing fact tables on
  * their join key turns every subsequent join into a zero-shuffle
  * merge: the big win the reference got from chunk-aligned partitioning,
  * generalized. Also covers rechunk (reference R11). */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any Exchange (co-located SMJ)") {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_bkt")
    val joined = spark.table("orders_bkt")
      .hint("MERGE")
      .join(spark.table("customer_bkt"), Seq("o_custkey"))
    val plan = planOf(joined)
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // and it is correct
    val expect = Tables.orders(spark, sf).join(
      Tables.customer(spark, sf),
      col("o_custkey") === col("c_custkey")).count()
    assert(joined.count() == expect)
  }

  test("rechunk: hash repartition balances, range repartition clusters") {
    val li = Tables.lineitem(spark, sf)
    val hashed = Tables.rechunk(li, 6)
    assert(hashed.rdd.getNumPartitions == 6)
    assert(hashed.count() == li.count())
    val ranged = Tables.rechunk(li, 6, Some("l_orderkey"))
    assert(ranged.rdd.getNumPartitions == 6)
    // range partitions hold disjoint key ranges
    val bounds = ranged.rdd.mapPartitionsWithIndex { (i, rows) =>
      val keys = rows.map(_.getAs[Long]("l_orderkey")).toSeq
      if (keys.isEmpty) Iterator.empty
      else Iterator.single((i, keys.min, keys.max))
    }.collect().sortBy(_._1)
    bounds.sliding(2).foreach {
      case Array((_, _, max1), (_, min2, _)) => assert(max1 <= min2)
      case _ =>
    }
  }
}

/** Dynamic partition pruning: a selective filter on the dim side of a join
  * against a partition column prunes fact partitions AT RUNTIME — the
  * mechanism that makes star-schema joins over partitioned 100 TB tables
  * read only the touched partitions. */
class DynamicPruningSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("join against partition column injects a dynamicpruning filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dpp").toString
    Tables.lineitem(spark, sf).write.mode("overwrite")
      .partitionBy("l_returnflag").parquet(dir)
    val fact = spark.read.parquet(dir)
    // DPP requires a surviving Filter node on the dim side — a filtered
    // LocalRelation gets constant-folded (filter disappears, no DPP), so
    // the dim must come from a real source
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_dim").toString
    Seq(("A", "keep"), ("N", "drop"), ("R", "drop")).toDF("flag", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter($"tag" === "keep")
    val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .agg(count(lit(1)))
    val plan = formattedPlan(joined)
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n${plan.take(2000)}")
    // correctness: equals a static filter
    val expect = fact.filter($"l_returnflag" === "A").count()
    assert(joined.head().getLong(0) == expect)
  }
}
