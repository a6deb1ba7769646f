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
