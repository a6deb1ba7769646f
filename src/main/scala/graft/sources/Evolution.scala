package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.{Fixtures, Tables}

/** Schema-evolution read: a corpus written over years drifts — newer
  * generations add columns the old files lack. The fixture materializes
  * two parquet generations of the documents table (gen1 without
  * `source`, gen2 with it); the query reads both through
  * `mergeSchema=true`, which unions the footer schemas and fills the
  * missing column with NULL for old files — no rewrite of the old
  * generation, the exact posture a 100 TB lake takes when backfilling
  * is unaffordable.
  *
  * Scale: schema merge is a FOOTER operation (one small read per file
  * at planning; at large file counts Spark samples footers in a
  * distributed job), the data pages of the old generation are never
  * touched. Column pruning and filter pushdown still apply per
  * generation. The oracle recomputes the same roll-up from the ORIGINAL
  * documents table with the generation rule inlined (`source` visible
  * only for odd doc_ids), so the merged read is proven lossless. */
object Evolution {
  type Q = (SparkSession, String) => DataFrame

  def evoDir(s: SparkSession, d: String): String =
    Fixtures.cached("schevo", "docs", d) { dir =>
      val docs = Tables.documents(s, d)
      docs.filter(col("doc_id") % 2 === 0)
        .select("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/gen1")
      docs.filter(col("doc_id") % 2 === 1)
        .select("doc_id", "lang", "n_chars", "source")
        .write.mode("overwrite").parquet(s"$dir/gen2")
    } { dir =>
      s.read.option("mergeSchema", "true")
        .parquet(s"$dir/gen1", s"$dir/gen2")
        .count() == Tables.documents(s, d).count()
    }

  def schemaMergeScan(s: SparkSession, d: String): DataFrame = {
    val dir = evoDir(s, d)
    s.read.option("mergeSchema", "true")
      .parquet(s"$dir/gen1", s"$dir/gen2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        // old-generation rows surface the added column as NULL, so the
        // non-null count is exactly the new-generation row count
        count(col("source")).as("n_with_src"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang")
  }

  /** The COMPUTE-side twin of mergeSchema (`q_union_evolve`): when the
    * two generations arrive as separate DataFrames (different sources,
    * not one parquet dir), `unionByName(allowMissingColumns = true)`
    * aligns columns BY NAME and null-fills the missing ones — the
    * positional `union` would silently mis-bind columns the moment two
    * generations order them differently, the classic silent-corruption
    * bug of evolving pipelines. Same oracle shape as the mergeSchema
    * scan, proving the two evolution routes agree. */
  def unionEvolve(s: SparkSession, d: String): DataFrame = {
    val dir = evoDir(s, d)
    val gen1 = s.read.parquet(s"$dir/gen1")
    // deliberately reorder gen2's columns: by-name alignment must not
    // care, and this is exactly where positional union corrupts
    val gen2 = s.read.parquet(s"$dir/gen2")
      .select("source", "n_chars", "doc_id", "lang")
    gen1.unionByName(gen2, allowMissingColumns = true)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        count(col("source")).as("n_with_src"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "q_scan_schema_merge" -> schemaMergeScan _,
    "q_union_evolve" -> unionEvolve _,
  )

  private val evoOracle =
    """SELECT lang, CAST(count(1) AS BIGINT) AS n_docs,
              CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              CAST(count(CASE WHEN doc_id % 2 = 1 THEN source END)
                AS BIGINT) AS n_with_src,
              min(doc_id) AS min_doc, max(doc_id) AS max_doc
       FROM documents GROUP BY lang ORDER BY lang"""

  val oracle: Map[String, String] = Map(
    "q_scan_schema_merge" -> evoOracle,
    // same oracle by design: the storage-side (mergeSchema) and
    // compute-side (unionByName) evolution routes must agree
    "q_union_evolve" -> evoOracle,
  )
}
