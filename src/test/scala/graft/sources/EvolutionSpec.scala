package graft.sources

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class EvolutionSpec extends SparkSpec {

  test("mergeSchema surfaces the added column as NULL for old-generation rows") {
    val dir = Evolution.evoDir(spark, sf)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen1", s"$dir/gen2")
    // the union schema carries the gen2-only column
    assert(merged.schema.fieldNames.contains("source"))
    // every even doc_id (gen1) reads NULL, every odd (gen2) non-null
    assert(merged.filter(col("doc_id") % 2 === 0 &&
      col("source").isNotNull).count() == 0)
    assert(merged.filter(col("doc_id") % 2 === 1 &&
      col("source").isNull).count() == 0)
    // lossless: nothing dropped or duplicated across generations
    assert(merged.count() == Tables.documents(spark, sf).count())
  }

  test("a gen1-only read omits the new column entirely") {
    val dir = Evolution.evoDir(spark, sf)
    val g1 = spark.read.parquet(s"$dir/gen1")
    assert(!g1.schema.fieldNames.contains("source"))
  }
}
