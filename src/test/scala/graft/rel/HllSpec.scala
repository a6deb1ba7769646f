package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  test("hll estimate lands within 10% of the exact distinct per group") {
    // m=1024 gives ~1.04/sqrt(1024) ≈ 3.3% standard error; 10% is a
    // 3-sigma gate that still catches register/bucket bugs outright
    val est = BitmapAgg.hllDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val exact = Tables.orders(spark, sf).groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n) <= 0.10 * n + 3,
        s"$k: est ${est(k)} vs exact $n")
    }
  }

  test("register sum is the merge-invariant: split fit == whole fit") {
    // sketch mergeability — fit registers on two disjoint halves, merge
    // by per-bucket max, and the merged register sum must equal the
    // single-pass register sum (the property partial aggregation uses)
    val m = 1024
    def regsOf(df: org.apache.spark.sql.DataFrame) = {
      val h = graft.llm.Dedup.md5Hash60(
        concat(lit("hll:"), col("o_custkey").cast("string")))
      df.select((h % m).as("j"), expr(
          s"(conv(substring(md5(concat('hll:', CAST(o_custkey AS STRING)))" +
            s", 1, 15), 16, 10)) div $m").as("w"))
        .withColumn("rho",
          when(col("w") === 0, 51).otherwise(lit(51) - length(bin(col("w")))))
        .groupBy("j").agg(max(col("rho")).as("mj"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    }
    val orders = Tables.orders(spark, sf)
    val whole = regsOf(orders)
    val h1 = regsOf(orders.filter(col("o_orderkey") % 2 === 0))
    val h2 = regsOf(orders.filter(col("o_orderkey") % 2 =!= 0))
    val merged = (h1.keySet ++ h2.keySet).map(j =>
      j -> math.max(h1.getOrElse(j, 0), h2.getOrElse(j, 0))).toMap
    assert(merged == whole)
  }
}
