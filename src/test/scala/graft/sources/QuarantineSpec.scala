package graft.sources

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class QuarantineSpec extends SparkSpec {

  test("quarantined lines carry the RAW input verbatim — reprocessable") {
    val schema = Tables.documents(spark, sf).schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    // Spark refuses queries whose referenced columns are ONLY the
    // corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_
    // RECORD_COLUMN — the lazy parser would skip parsing entirely and
    // report nothing corrupt); the documented route is cache-then-query,
    // which q_jsonl_quarantine itself avoids needing by always grouping
    // alongside data columns
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(JsonLines.dirtyDir(spark, sf))
      .cache()
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(quarantined == JsonLines.CorruptLines.toSet,
      s"raw-line round-trip broken: ${quarantined.diff(JsonLines.CorruptLines.toSet)}")
    // and every corrupt row carries NO parsed data (all-null fields) —
    // a half-parsed row counted as corrupt would double-count content
    val leaky = parsed.filter(col("_corrupt_record").isNotNull &&
      col("doc_id").isNotNull).count()
    parsed.unpersist()
    assert(leaky == 0)
  }

  test("CSV quarantine: raw lines preserved; all 4 shapes classify corrupt") {
    val dir = OtherFormats.dirtyCsvDir(spark, sf)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val parsed = s2.read
      .schema("l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE, " +
        "l_extendedprice DOUBLE, l_discount DOUBLE, _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    val quarantined = parsed.filter(col("_corrupt_record").isNotNull)
      // touch every column so unreferenced-column cast errors classify
      // (the third measured CSV rule; see OtherFormats.csvQuarantine)
      .select(col("_corrupt_record"), col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_returnflag"))
      .collect().map(_.getString(0)).toSet
    parsed.unpersist()
    assert(quarantined == OtherFormats.CorruptCsvLines.toSet,
      s"got ${quarantined.toSeq.sorted}")
  }

  test("clean bucket equals the parquet source exactly") {
    val rows = JsonLines.jsonlQuarantine(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = Tables.documents(spark, sf)
      .agg(count(lit(1)), sum(col("n_chars"))).head()
    assert(rows("clean") == ((src.getLong(0), src.getLong(1))))
    assert(rows("corrupt") == ((JsonLines.CorruptLines.length.toLong, -1L)))
  }
}
