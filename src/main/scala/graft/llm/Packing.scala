package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Token-budget shard packing — the step that lays a cleaned corpus out
  * into fixed-token-budget training shards. Documents are placed in a
  * deterministic content-hash order (a reproducible global shuffle — the
  * same reasoning as Sampling's hash split: no rand(), stable across
  * engines, retries and partitionings) and assigned
  * `shard = floor(tokens_before / Budget)` — the concatenate-and-slice
  * packing an LM data loader performs, expressed as a global prefix sum.
  *
  * Scale shape — the distributed prefix sum: a single
  * `sum() OVER (ORDER BY h)` would funnel 100 TB through ONE reducer, so
  * the prefix sum is decomposed exactly like WindowSetSort.windowDist2Pass:
  *
  *  1. coarse pass — per-bucket token totals (bucket = top 10 bits of the
  *     60-bit hash, so bucket order IS hash-order prefix); a window over
  *     that ≤1024-row frame (bounded by construction) yields each
  *     bucket's global offset;
  *  2. fine pass — a within-bucket cumulative sum (parallelism = number
  *     of buckets) plus the broadcast offset.
  *
  * The two-pass result is bit-identical to the single-window form —
  * PackingSpec proves it, and the DuckDB oracle IS the single-window
  * formulation, so every driver run re-proves the decomposition.
  */
object Packing {
  type Q = (SparkSession, String) => DataFrame

  /** Tokens per shard. Documents average ~40 tokens, so sf0.01's 5k docs
    * fill ~780 shards — enough shards to exercise every boundary case. */
  val Budget = 256L

  /** (doc_id, h, tok, shard_id) for every document — the packing
    * assignment itself (the roll-up below is just its audit view). */
  def shardAssignments(docs: DataFrame): DataFrame = {
    val rows = docs
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        Dedup.md5Hash60(col("text")).as("h"),
        size(col("toks")).cast("long").as("tok"))
      // top 10 of the 60 hash bits: monotone in h, so ascending-bucket
      // concatenation preserves the (h, doc_id) global order
      .withColumn("bkt", shiftright(col("h"), 50))
    val hist = rows.groupBy("bkt").agg(sum(col("tok")).as("cnt"))
    // ≤1024 rows by construction (10-bit bucket id) — the benign
    // single-partition window class, same as the gene-stats frames
    val wb = Window.orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("off", coalesce(sum(col("cnt")).over(wb), lit(0L)))
      .select("bkt", "off")
    val wf = Window.partitionBy("bkt").orderBy("h", "doc_id")
    rows
      .withColumn("cum_in", sum(col("tok")).over(wf)) // inclusive
      .join(broadcast(offsets), Seq("bkt"))
      .withColumn("cum_before", col("off") + col("cum_in") - col("tok"))
      .withColumn("shard_id",
        floor(col("cum_before") / Budget).cast("long"))
      .select("doc_id", "h", "tok", "shard_id")
  }

  /** Per-shard fill audit: doc count, token count, first doc. */
  def packShards(s: SparkSession, d: String): DataFrame =
    shardAssignments(Tables.documents(s, d))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"))
      .orderBy("shard_id")

  val queries: Map[String, Q] = Map(
    "q_pack_shards" -> packShards _,
  )

  val oracle: Map[String, String] = Map(
    // The oracle is the SINGLE-WINDOW formulation of the same prefix sum
    // (fine at oracle scale; the Spark side runs the 2-pass decomposition
    // documented above) — every driver run proves the two equal.
    "q_pack_shards" ->
      """WITH r AS (
           SELECT doc_id,
                  CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) AS h,
                  CAST(len(str_split(text, ' ')) AS BIGINT) AS tok
           FROM documents),
         c AS (
           SELECT doc_id, tok,
                  coalesce(sum(tok) OVER (ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_before
           FROM r)
         SELECT CAST(floor(cum_before / 256) AS BIGINT) AS shard_id,
                CAST(count(1) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS n_tokens,
                min(doc_id) AS first_doc
         FROM c GROUP BY 1 ORDER BY shard_id""",
  )
}
