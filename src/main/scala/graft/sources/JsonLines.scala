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

  /** The 7 planted malformed lines (fixture contract — the oracle's
    * corrupt count is this list's length): truncated object,
    * bracket break, bare text, unclosed array, mid-object start, bare
    * comma, trailing comma. Two shapes were probed and deliberately
    * EXCLUDED because Spark's Jackson front-end doesn't classify them
    * corrupt: `{...} trailing garbage` parses the leading object and
    * ignores the tail (the row comes out CLEAN), and an unterminated
    * STRING literal can swallow the record entirely instead of
    * surfacing it — planted corruption must be shapes the parser
    * actually rejects per-line. */
  private[sources] val CorruptLines = Seq(
    """{"doc_id": 9001,""",
    """{"doc_id": 9002, "text": ]}""",
    """this is not json at all""",
    """[1, 2, 3""",
    """"doc_id": 9005}""",
    """{,}""",
    "{\"doc_id\": 9007, }")

  /** documents-as-JSONL plus a file of malformed lines — the realistic
    * ingest-edge shape (a crawler dump is never 100% clean). */
  def dirtyDir(s: SparkSession, d: String): String =
    Fixtures.cached("jsonl_dirty", "documents", d) { dir =>
      Tables.documents(s, d).write.mode("overwrite").json(dir.toString)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.toString, "part-corrupt.json"),
        CorruptLines.mkString("", "\n", "\n").getBytes("UTF-8"))
    } { dir =>
      new java.io.File(dir.toString, "part-corrupt.json").exists()
    }

  /** Corrupt-record QUARANTINE (`q_jsonl_quarantine`): parse the dirty
    * dump in PERMISSIVE mode with an explicit corrupt-record column —
    * unparseable lines surface as rows with all data fields null and
    * the RAW LINE preserved in `_corrupt_record` (reprocessable, not
    * silently dropped like DROPMALFORMED, not job-fatal like FAILFAST).
    * The summary proves the split is lossless both ways: the clean
    * bucket's count + char sum must equal the parquet source exactly
    * (no clean row quarantined, no corrupt row leaked in), the corrupt
    * bucket must be exactly the planted lines. Scale: PERMISSIVE parse
    * is per-line and splittable like any JSONL scan; the quarantine is
    * a projection, not a second pass. */
  def jsonlQuarantine(s: SparkSession, d: String): DataFrame = {
    val schema = Tables.documents(s, d).schema
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    val parsed = s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dirtyDir(s, d))
    parsed
      .withColumn("bucket",
        when(col("_corrupt_record").isNull, "clean").otherwise("corrupt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(col("n_chars")), lit(-1L)).as("sum_chars"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "q_jsonl_scan" -> jsonlScan _,
    "q_jsonl_quarantine" -> jsonlQuarantine _,
  )

  val oracle: Map[String, String] = Map(
    "q_jsonl_scan" ->
      """SELECT lang, source, CAST(count(1) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
    // clean bucket == the parquet source exactly; corrupt == the 7
    // planted lines (fixture contract, see CorruptLines)
    "q_jsonl_quarantine" ->
      """SELECT 'clean' AS bucket, CAST(count(1) AS BIGINT) AS n_rows,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents
         UNION ALL
         SELECT 'corrupt', 7, -1
         ORDER BY bucket""",
  )
}
