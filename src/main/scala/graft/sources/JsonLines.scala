package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.{Fixtures, Tables}

/** JSONL (newline-delimited JSON) source — the lingua-franca interchange
  * format of LLM corpus pipelines (every public dump and most corpus
  * tools speak it). The fixture materializes the documents table as
  * JSONL once per scale factor (cross-process FileLock, same as the zarr
  * twin); the query reads it back with an EXPLICIT schema — schema
  * inference is an extra full pass over the data and can type-flip on
  * dirty corpora, so a production pipeline always pins the schema — and
  * proves the round-trip lossless by aggregating against the ORIGINAL
  * parquet in the oracle.
  *
  * Scale: JSON scanning is line-splittable (one task per split, no
  * cross-record state), so the read parallelizes like text; the cost
  * relative to parquet is the parse + no column pruning — which is
  * exactly why the engine's own storage is parquet and JSONL stays at
  * the ingest edge. */
object JsonLines {
  type Q = (SparkSession, String) => DataFrame

  def jsonlDir(s: SparkSession, d: String): String =
    Fixtures.cached("jsonl", "documents", d) { dir =>
      Tables.documents(s, d).write.mode("overwrite").json(dir.toString)
    } { dir =>
      new java.io.File(dir.toString).listFiles() != null &&
        s.read.schema(Tables.documents(s, d).schema).json(dir.toString)
          .count() == Tables.documents(s, d).count()
    }

  /** Per-(lang, source) roll-up read from the JSONL twin; hash-matching
    * the parquet-side oracle proves the JSONL round-trip preserved ids,
    * strings and numerics exactly. */
  def jsonlScan(s: SparkSession, d: String): DataFrame = {
    val docs = s.read.schema(Tables.documents(s, d).schema)
      .json(jsonlDir(s, d))
    docs.groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "source")
  }

  val queries: Map[String, Q] = Map(
    "q_jsonl_scan" -> jsonlScan _,
  )

  val oracle: Map[String, String] = Map(
    "q_jsonl_scan" ->
      """SELECT lang, source, CAST(count(1) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
  )
}
