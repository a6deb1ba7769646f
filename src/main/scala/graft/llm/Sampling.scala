package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Deterministic sampling / split assignment and embedding quantization —
  * training-data pipeline operators (north-star extension; the reference
  * repo has neither).
  *
  * Scale design: both are pure per-row maps (no shuffle until the final
  * roll-up), and the split assignment is CONTENT-deterministic — a hash of
  * the stable id, not rand() — so it is reproducible across runs, engines,
  * partitionings and re-executions of failed tasks. rand()-based sampling
  * breaks all four (Spark documents rand() as indeterminate under task
  * retry); hash splits are how production corpus pipelines pin their
  * train/eval membership.
  */
object Sampling {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic bucket in [0, buckets): md5-hex→int of the salted id
    * (engine-portable — same trick as Dedup.md5Hash60's DuckDB twin). The
    * salt decorrelates independent splits drawn from the same id space. */
  def hashBucket(c: Column, salt: String, buckets: Int): Column =
    pmod(Dedup.md5Hash60(concat(lit(salt), lit(":"), c.cast("string"))),
      lit(buckets.toLong))

  /** 90/10 train/test split of the documents corpus by hashed doc_id,
    * rolled up per (lang, split) to prove stratification coverage. */
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split",
        when(hashBucket(col("doc_id"), "split", 100) < 90, "train")
          .otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        // integer sum / count — exact in both engines; epsilon is belt
        // and braces on the 4dp round
        round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "split")

  /** Symmetric int8 quantization of the embedding column: per-vector scale
    * 127/max|x|, q_i = floor(x·s + 0.5) ∈ [-127, 127], plus the max
    * dequantization error ‖x − q/s‖∞ (×1000 for a readable magnitude).
    *
    * floor(y + 0.5) instead of round(y): engines disagree on exact-half
    * handling for negatives, floor is bit-identical IEEE in both. Storage
    * story at 100 TB: 4→1 bytes/dim before ANN indexing; the error column
    * is the quality audit a pipeline would gate on. */
  def embedQuantize(s: SparkSession, d: String): DataFrame = {
    val toD = transform(col("embedding"), x => x.cast("double"))
    Tables.embeddings(s, d)
      .select(col("vec_id"), toD.as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .withColumn("s",
        when(col("amax") === 0.0, lit(1.0))
          .otherwise(lit(127.0) / col("amax")))
      .select(col("vec_id"),
        aggregate(
          transform(col("v"), x => abs(floor(x * col("s") + lit(0.5)))),
          lit(0.0), (a, x) => a + x).cast("long").as("q_l1"),
        round(aggregate(
            transform(col("v"),
              x => abs(x - floor(x * col("s") + lit(0.5)) / col("s"))),
            lit(0.0), (a, e) => greatest(a, e)) * lit(1000.0) + lit(1e-9), 6)
          .as("max_err_1e3"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_sample_hash"    -> sampleHash _,
    "q_embed_quantize" -> embedQuantize _,
  )

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      """WITH b AS (
           SELECT lang, n_chars, doc_id,
                  CASE WHEN CAST('0x' ||
                         substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,15)
                         AS BIGINT) % 100 < 90
                       THEN 'train' ELSE 'test' END AS split
           FROM documents)
         SELECT lang, split, CAST(count(1) AS BIGINT) AS n_docs,
                round(avg(n_chars) + 1e-9, 4) AS avg_chars,
                min(doc_id) AS min_doc, max(doc_id) AS max_doc
         FROM b GROUP BY lang, split ORDER BY lang, split""",
    "q_embed_quantize" ->
      """WITH e AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(x AS DOUBLE)) AS v
                    FROM embeddings),
         a AS (SELECT vec_id, v,
                      list_max(list_transform(v, x -> abs(x))) AS amax
               FROM e),
         sc AS (SELECT vec_id, v,
                       CASE WHEN amax = 0 THEN 1.0
                            ELSE 127.0 / amax END AS s
                FROM a)
         SELECT vec_id,
                CAST(list_sum(list_transform(v,
                  x -> abs(floor(x * s + 0.5)))) AS BIGINT) AS q_l1,
                round(list_max(list_transform(v,
                  x -> abs(x - floor(x * s + 0.5) / s))) * 1000.0 + 1e-9, 6)
                  AS max_err_1e3
         FROM sc ORDER BY vec_id""",
  )
}
