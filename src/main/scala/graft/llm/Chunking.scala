package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Sliding-window document chunking — the context-length sharding step
  * between cleaning and tokenization in an LLM data pipeline (and the
  * passage-splitting step of a retrieval corpus build). Each document
  * becomes overlapping windows of `Chunk` tokens advancing by `Stride`
  * (overlap = Chunk − Stride), the standard HF-style sliding window; the
  * tail chunk may be shorter. Chunks carry an md5 fingerprint of their
  * joined text so downstream chunk-level dedup keys off fixed-width
  * hashes, not chunk bodies.
  *
  * Scale shape: tokenize once per doc (the array is projected BEFORE the
  * chunk lambda — the HOF-hoisting lesson from ScSparse/contamination),
  * then a pure generator expression (sequence → transform → posexplode)
  * with no shuffle at all until a downstream op groups the chunks. Output
  * is ~n_tokens/Stride rows per doc; at 100 TB this is the map-side
  * expansion feeding the (already-shipped) dedup and packing operators.
  */
object Chunking {
  type Q = (SparkSession, String) => DataFrame

  val Chunk = 16
  val Stride = 12

  /** (doc_id, chunk_id, chunk ARRAY<STRING>) — one row per window. */
  def chunks(docs: DataFrame, chunk: Int = Chunk,
             stride: Int = Stride): DataFrame =
    docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        posexplode(
          transform(sequence(lit(0), size(col("toks")) - 1, lit(stride)),
            i => slice(col("toks"), i + 1, lit(chunk))))
          .as(Seq("chunk_id", "chunk")))

  def textChunk(s: SparkSession, d: String): DataFrame =
    chunks(Tables.documents(s, d))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_toks"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  val queries: Map[String, Q] = Map(
    "q_text_chunk" -> textChunk _,
  )

  val oracle: Map[String, String] = Map(
    // toks[st+1 : st+16] is DuckDB's 1-based inclusive list slice — the
    // same elements as Spark's slice(toks, st+1, 16); both clamp at the
    // array end, producing the identical short tail chunk.
    "q_text_chunk" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks
                    FROM documents),
         s AS (SELECT doc_id, toks,
                      unnest(generate_series(0, len(toks) - 1, 12)) AS st
               FROM t),
         c AS (SELECT doc_id, CAST(st // 12 AS INT) AS chunk_id,
                      toks[st + 1 : st + 16] AS chunk
               FROM s)
         SELECT doc_id, chunk_id,
                CAST(len(chunk) AS INT) AS n_toks,
                md5(array_to_string(chunk, ' ')) AS chunk_md5
         FROM c ORDER BY doc_id, chunk_id""",
  )
}
