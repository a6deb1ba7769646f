package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips (reference R2/R3: write matrices back out,
  * convert between formats — zarr_spark.py::write_chunk equivalent).
  * Parquet is the primary format; CSV/JSON cover the ETL edges. */
class SinksSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_$name").toString

  test("parquet round-trip preserves array columns bit-exactly") {
    val dir = tmp("pq")
    val in = Tables.embeddings(spark, sf)
    in.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema("embedding").dataType == in.schema("embedding").dataType)
    val diff = in.select("vec_id", "embedding")
      .exceptAll(back.select("vec_id", "embedding")).count()
    assert(diff == 0 && back.count() == in.count())
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = tmp("pqpart")
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = formattedPlan(one)
    // partition filter must appear as a partition-level filter, not a scan
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan)
    val langs = spark.read.parquet(dir).select("lang").distinct().count()
    assert(langs == 5)
  }

  test("csv round-trip with header restores scalar table content") {
    val dir = tmp("csv")
    val in = Tables.orders(spark, sf)
    in.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(in.schema).csv(dir)
    assert(back.count() == in.count())
    val sums = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(round(sum("o_totalprice"), 2), sum("o_orderkey")).head()
    assert(sums(back) == sums(in))
  }

  test("json round-trip restores nested struct columns") {
    val dir = tmp("json")
    val in = Tables.events(spark, sf)
      .select(col("event_id"),
        struct(col("event_type"), col("value")).as("payload"))
    in.write.mode("overwrite").json(dir)
    val back = spark.read.schema(in.schema).json(dir)
    assert(back.count() == in.count())
    val diff = in.exceptAll(back).count()
    assert(diff == 0)
  }
}
