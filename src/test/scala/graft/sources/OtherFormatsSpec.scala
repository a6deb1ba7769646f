package graft.sources

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class OtherFormatsSpec extends SparkSpec {

  test("ORC scan pushes the filter and prunes columns like parquet") {
    val dir = OtherFormats.orcDir(spark, sf)
    val df = spark.read.orc(dir)
      .filter(col("doc_id") > 100)
      .select("doc_id", "lang")
    val plan = formattedPlan(df)
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(doc_id,100)"), plan)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && !readSchema.contains("text"),
      readSchema)
  }

  test("CSV round-trip preserves counts and numeric sums exactly") {
    val got = OtherFormats.csvScan(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("q"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got == want, s"$got vs $want")
  }
}
