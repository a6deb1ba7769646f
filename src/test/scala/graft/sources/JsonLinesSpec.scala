package graft.sources

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class JsonLinesSpec extends SparkSpec {

  test("jsonl round-trip preserves every row and column exactly") {
    val dir = JsonLines.jsonlDir(spark, sf)
    val back = spark.read.schema(Tables.documents(spark, sf).schema)
      .json(dir)
    val orig = Tables.documents(spark, sf)
    assert(back.count() == orig.count())
    // column-exact: anti-joins empty in both directions on all columns
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
  }

  test("jsonl scan aggregates match the parquet-side derivation") {
    val viaJson = JsonLines.jsonlScan(spark, sf).collect().toSeq
    val viaParquet = Tables.documents(spark, sf)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "source").collect().toSeq
    assert(viaJson == viaParquet)
  }
}
