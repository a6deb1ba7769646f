package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus-wide PARAGRAPH dedup — the rewrite rung between document-level
  * dedup (drop whole docs) and substring dedup (flag repeated passages):
  * split every document into fixed 8-token chunks and keep only the
  * FIRST occurrence of each distinct chunk across the whole corpus
  * (first = smallest (doc_id, chunk_index), a total order). This is the
  * boilerplate-stripping pass training pipelines run to kill repeated
  * headers/footers/license blocks while keeping the host documents.
  *
  * Output is the per-document rewrite summary (chunks total/kept/
  * dropped) rather than the rewritten text, keeping the gate artifact
  * scalar-typed (driver comparator rejects nested cells).
  *
  * Scale shape: chunking is per-row array slicing (no shuffle); the
  * first-occurrence choice is ONE window keyed on the chunk text —
  * a keyed shuffle, linear in chunks, the same shape as exact dedup —
  * followed by a doc-keyed agg. Per-chunk-group state is O(1)
  * (row_number), no group materializes. At 100 TB the shuffle key
  * should be xxhash64(chunk) with the text dropped before the
  * exchange; here the raw chunk is the key so the DuckDB oracle can
  * join on the same strings (the similarity_sparse precedent). */
object ParagraphDedup {
  type Q = (SparkSession, String) => DataFrame

  val ChunkTokens = 8

  def paragraphDedup(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
    val chunks = toks
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0, (size(ts) + ${ChunkTokens - 1}) " +
          s"div $ChunkTokens - 1)")).as("cidx"))
      .select(col("doc_id"), col("cidx"),
        expr(s"array_join(slice(ts, cidx * $ChunkTokens + 1, " +
          s"$ChunkTokens), ' ')").as("chunk"))
    val firstWin = Window.partitionBy("chunk")
      .orderBy(col("doc_id"), col("cidx"))
    chunks
      .withColumn("rk", row_number().over(firstWin))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("kept"),
        sum(when(col("rk") === 1, 0L).otherwise(1L)).as("dropped"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map("q_dedup_paragraph" -> paragraphDedup _)

  val oracle: Map[String, String] = Map(
    "q_dedup_paragraph" ->
      s"""WITH tok AS (
           SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
         ix AS (
           SELECT doc_id, ts,
                  unnest(range(0, (len(ts) + ${ChunkTokens - 1})
                                  // $ChunkTokens)) AS cidx
           FROM tok),
         c AS (
           SELECT doc_id, cidx,
                  array_to_string(ts[cidx * $ChunkTokens + 1 :
                                     cidx * $ChunkTokens + $ChunkTokens],
                                  ' ') AS chunk
           FROM ix),
         r AS (
           SELECT doc_id, cidx,
                  row_number() OVER (PARTITION BY chunk
                    ORDER BY doc_id, cidx) AS rk
           FROM c)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
                CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS kept,
                CAST(sum(CASE WHEN rk = 1 THEN 0 ELSE 1 END) AS BIGINT)
                  AS dropped
         FROM r GROUP BY doc_id ORDER BY doc_id""")
}
