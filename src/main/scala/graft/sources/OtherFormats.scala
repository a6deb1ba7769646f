package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.{Fixtures, Tables}

/** The remaining interchange formats a corpus pipeline meets at its
  * edges: CSV (the tabular-export lingua franca) and ORC (the other
  * mainstream columnar format, native in Spark). Same posture as the
  * JSONL source: fixture materialized once per scale factor behind the
  * cross-process FileLock, read back with an EXPLICIT schema (inference
  * is an extra full pass and can type-flip), and proven lossless by
  * aggregating against the ORIGINAL parquet in the oracle.
  *
  * Scale: CSV splits by line like JSONL (parallel scan, no pruning —
  * ingest-edge only); ORC carries column pruning + predicate pushdown
  * like parquet (OtherFormatsSpec asserts the pushed filter), so it is
  * a storage-grade format, not just an edge one. */
object OtherFormats {
  type Q = (SparkSession, String) => DataFrame

  /** Numeric/string lineitem slice as CSV (no free text — CSV with
    * embedded newlines is a quoting minefield the fixture sidesteps;
    * documents-shaped data belongs to the JSONL twin). */
  def csvDir(s: SparkSession, d: String): String =
    Fixtures.cached("csv", "lineitem", d) { dir =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_quantity",
          "l_extendedprice", "l_discount")
        .write.mode("overwrite").option("header", "true")
        .csv(dir.toString)
    } { dir =>
      s.read.option("header", "true")
        .schema("l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE, " +
          "l_extendedprice DOUBLE, l_discount DOUBLE")
        .csv(dir.toString).count() == Tables.lineitem(s, d).count()
    }

  def orcDir(s: SparkSession, d: String): String =
    Fixtures.cached("orc", "documents", d) { dir =>
      Tables.documents(s, d).write.mode("overwrite").orc(dir.toString)
    } { dir =>
      s.read.orc(dir.toString).count() == Tables.documents(s, d).count()
    }

  def csvScan(s: SparkSession, d: String): DataFrame =
    s.read.option("header", "true")
      .schema("l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE, " +
        "l_extendedprice DOUBLE, l_discount DOUBLE")
      .csv(csvDir(s, d))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          + lit(1e-6), 2).as("revenue"))
      .orderBy("l_returnflag")

  def orcScan(s: SparkSession, d: String): DataFrame =
    s.read.orc(orcDir(s, d))
      .filter(col("doc_id") >= 0)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "source")

  val queries: Map[String, Q] = Map(
    "q_csv_scan" -> csvScan _,
    "q_orc_scan" -> orcScan _,
  )

  val oracle: Map[String, String] = Map(
    "q_csv_scan" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_rows,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
                round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-6, 2)
                  AS revenue
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_orc_scan" ->
      """SELECT lang, source, CAST(count(1) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents WHERE doc_id >= 0
         GROUP BY lang, source ORDER BY lang, source""",
  )
}
