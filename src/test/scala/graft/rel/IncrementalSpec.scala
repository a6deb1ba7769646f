package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  test("split-partial-merge equals the single-pass rollup") {
    val got = Incremental.incrementalAgg(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("p"),
        max(expr("ts_ns div 1000")).as("m"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want && got.nonEmpty)
  }

  test("both sides of the cutover actually contribute rows") {
    val ev = Tables.events(spark, sf)
      .select(expr("ts_ns div 1000").as("us"))
    assert(ev.filter(col("us") < Incremental.CutUs).count() > 0)
    assert(ev.filter(col("us") >= Incremental.CutUs).count() > 0)
  }
}
