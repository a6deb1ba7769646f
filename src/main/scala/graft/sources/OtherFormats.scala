package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
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
      // money sums accumulate in DECIMAL (order-independent at any
      // scale/partitioning) — the shared convention, see NumFmt.moneySum
      .agg(count(lit(1)).as("n_rows"),
        NumFmt.moneySum(col("l_quantity"), 2, 2).as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
             col("l_discount").cast("decimal(18,2)"))), 2)
          .cast("double").as("revenue"))
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

  private val CsvSchema =
    "l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE, " +
      "l_extendedprice DOUBLE, l_discount DOUBLE"

  /** The 4 planted malformed CSV lines (fixture contract): bad BIGINT,
    * short row, long row, bad DOUBLE — each probed to actually set the
    * corrupt-record column in Spark 4.1's PERMISSIVE parser. An all-
    * empty line (",,,,") is deliberately NOT planted: blank fields are
    * legal NULLs, not corruption. Measured pitfall that shaped this
    * fixture: with header=true AND a corrupt-record column in the
    * schema, Spark 4.1 silently DROPS the first data row of the file
    * when the corrupt column is projected (count() still sees it — a
    * pruning-dependent double header skip), so the dirty fixture is
    * written HEADERLESS. */
  private[sources] val CorruptCsvLines = Seq(
    "abc,R,1.0,100.0,0.05",
    "7,R,2.0",
    "7,R,2.0,100.0,0.05,extra,extra",
    "7,R,notnum,100.0,0.05")

  def dirtyCsvDir(s: SparkSession, d: String): String =
    Fixtures.cached("csv_dirty", "lineitem", d) { dir =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_returnflag", "l_quantity",
          "l_extendedprice", "l_discount")
        .write.mode("overwrite").csv(dir.toString) // headerless, see above
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.toString, "part-corrupt.csv"),
        CorruptCsvLines.mkString("", "\n", "\n").getBytes("UTF-8"))
    } { dir =>
      new java.io.File(dir.toString, "part-corrupt.csv").exists()
    }

  /** CSV twin of q_jsonl_quarantine: PERMISSIVE + corrupt-record
    * quarantine over the dirty dump. Two CSV-specific wrinkles the JSON
    * twin doesn't have, both MEASURED on Spark 4.1:
    *  - corruption classification is PER-PARSED-FIELD under the CSV
    *    parser's column pruning: with only (l_quantity, _corrupt_record)
    *    needed by the aggregate, 3 of the 4 planted lines (bad BIGINT in
    *    an unread column, short row, long row) classified CLEAN — the
    *    parser never touched the broken fields. A quarantine gate must
    *    therefore run with spark.sql.csv.parser.columnPruning.enabled
    *    = false (child session, the joinBloom conf-isolation pattern)
    *    so every record is parsed whole before being declared clean;
    *  - a corrupt row can still carry PARTIALLY parsed fields (the
    *    bad-BIGINT line yields l_quantity=1.0), so the clean-side sum
    *    is computed under the corrupt-flag condition — the source-exact
    *    oracle proves no partial value leaks across the bucket. */
  def csvQuarantine(s0: SparkSession, d: String): DataFrame = {
    val dir = dirtyCsvDir(s0, d)
    val s = s0.newSession()
    s.conf.set("spark.sql.csv.parser.columnPruning.enabled", "false")
    val parsed = s.read
      .schema(CsvSchema + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
    // every column is aggregated: (a) a quarantine AUDIT should prove
    // every field lossless, and (b) — the third measured CSV rule — a
    // bad CAST only classifies a row corrupt if that column is
    // REFERENCED by the query (even with parser pruning off, unparsed-
    // column conversion errors pass silently); touching all five
    // columns closes that hole
    val clean = col("_corrupt_record").isNull
    // decimal accumulation (NumFmt.moneySum): order-exact money sums at
    // any scale; srcDp=4 because l_discount carries 4 decimals here
    def cleanSum(c: org.apache.spark.sql.Column, dp: Int) =
      coalesce(NumFmt.moneySum(when(clean, c), 4, dp), lit(-1.0))
    parsed
      .withColumn("bucket", when(clean, "clean").otherwise("corrupt"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        cleanSum(col("l_quantity"), 2).as("sum_qty"),
        cleanSum(col("l_extendedprice"), 2).as("sum_price"),
        cleanSum(col("l_discount"), 4).as("sum_disc"),
        coalesce(sum(when(clean, col("l_orderkey"))), lit(-1L)).as("sum_keys"),
        count(when(clean, col("l_returnflag"))).as("n_flags"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "q_csv_scan" -> csvScan _,
    "q_csv_quarantine" -> csvQuarantine _,
    "q_orc_scan" -> orcScan _,
  )

  val oracle: Map[String, String] = Map(
    // clean bucket == the parquet source exactly; corrupt == the 4
    // planted lines (fixture contract, see CorruptCsvLines)
    "q_csv_quarantine" ->
      s"""SELECT 'clean' AS bucket, CAST(count(1) AS BIGINT) AS n_rows,
                ${NumFmt.moneySumSql("l_quantity", 4, 2)} AS sum_qty,
                ${NumFmt.moneySumSql("l_extendedprice", 4, 2)} AS sum_price,
                ${NumFmt.moneySumSql("l_discount", 4, 4)} AS sum_disc,
                CAST(sum(l_orderkey) AS BIGINT) AS sum_keys,
                CAST(count(l_returnflag) AS BIGINT) AS n_flags
         FROM lineitem
         UNION ALL
         SELECT 'corrupt', 4, -1.0, -1.0, -1.0, -1, 0
         ORDER BY bucket""",
    "q_csv_scan" ->
      s"""SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_rows,
                ${NumFmt.moneySumSql("l_quantity", 2, 2)} AS sum_qty,
                CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1.00 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
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
