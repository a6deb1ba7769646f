package graft.rel

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Record linkage — the fuzzy join ACROSS datasets (vs Dedup's near-dup
  * detection WITHIN one corpus): match a "dirty" feed of perturbed
  * customer names back to the clean master by blocked candidate
  * generation + banded edit-distance verification + best-match ranking.
  * The standard shape for data integration at scale (Fellegi–Sunter
  * blocking; same candidate/verify split as MinHash-LSH dedup).
  *
  * The dirty feed is DERIVED deterministically from the master (the
  * testbed ships no second entity table): one third of names get a
  * char appended, one third have their first char substituted, one
  * third pass through. Both perturbations leave the source as the
  * UNIQUE minimum-distance match (any other name differs in its id
  * digits too, adding ≥1 to the distance) — dropping a trailing id
  * digit, by contrast, makes ten names equidistant and ground truth
  * unrecoverable; the perturbation design is part of the operator's
  * contract, not just test data.
  *
  * Scale shape: candidates come from an EQUI-join on a blocking key
  * (here a perturbation-stable slice of the name — production uses a
  * normalized/phonetic key; the principle is identical), so the
  * all-pairs space is never materialized; the verifier is Spark's
  * banded `levenshtein(a, b, k)` — O(k·len) with early exit instead of
  * the O(len²) full matrix (DuckDB only has the unbounded form, so the
  * oracle writes `levenshtein(...) <= k`; the hash gate proves the
  * banded form equivalent). Best-match-per-dirty-row compiles to
  * partial+final WindowGroupLimit below the ranking exchange. */
object Linkage {
  type Q = (SparkSession, String) => DataFrame

  private val MaxDist = 2

  /** Deterministic dirty feed: (d_key, d_name) with known ground truth. */
  def dirtyFeed(clean: DataFrame): DataFrame =
    clean.select(col("c_custkey").as("d_key"),
      when(col("c_custkey") % 3 === 0, concat(col("c_name"), lit("x")))
        .when(col("c_custkey") % 3 === 1,
          concat(lit("K"), substring(col("c_name"), 2, 1000)))
        .otherwise(col("c_name")).as("d_name"))

  /** Match the dirty feed to the master: best (lowest-distance) clean
    * match per dirty row within the block, distance ≤ MaxDist. */
  def linkRecords(clean: DataFrame, dirty: DataFrame): DataFrame = {
    // blocking key: the id digits the perturbations never touch
    // (positions 10..17 of 'Customer#000000042') — perturbation-stable
    // by construction, as a production phonetic/normalized key would
    // be. Width tunes block size directly: 6 digits left 1000-row
    // blocks (1M candidate pairs each — 30 s at sf0.1); 8 digits gives
    // 10-row blocks and a 40x cheaper verify stage for the same recall
    val cand = dirty.withColumn("blk", substring(col("d_name"), 10, 8))
      .join(clean.select(col("c_custkey"), col("c_name"),
          substring(col("c_name"), 10, 8).as("blk")),
        Seq("blk"))
      .withColumn("dist", levenshtein(col("d_name"), col("c_name"), MaxDist))
      .filter(col("dist") =!= -1)
    val w = Window.partitionBy("d_key")
      .orderBy(col("dist"), col("c_custkey"))
    cand.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("d_key"), col("d_name"), col("c_custkey"), col("dist"))
      .orderBy("d_key")
  }

  def joinFuzzy(s: SparkSession, d: String): DataFrame = {
    val clean = Tables.customer(s, d)
    linkRecords(clean, dirtyFeed(clean))
  }

  val queries: Map[String, Q] = Map(
    "q_join_fuzzy" -> joinFuzzy _,
  )

  val oracle: Map[String, String] = Map(
    // unbounded levenshtein <= k mirrors Spark's banded 3-arg form
    // (!= -1) — the hash gate proves the banded optimization
    "q_join_fuzzy" ->
      """WITH dirty AS (
           SELECT c_custkey AS d_key,
                  CASE WHEN c_custkey % 3 = 0 THEN c_name || 'x'
                       WHEN c_custkey % 3 = 1 THEN 'K' || substr(c_name, 2)
                       ELSE c_name END AS d_name
           FROM customer),
         cand AS (
           SELECT d.d_key, d.d_name, c.c_custkey,
                  levenshtein(d.d_name, c.c_name) AS dist
           FROM dirty d JOIN customer c
             ON substr(d.d_name, 10, 8) = substr(c.c_name, 10, 8)
           WHERE levenshtein(d.d_name, c.c_name) <= 2),
         best AS (
           SELECT d_key, d_name, c_custkey, CAST(dist AS INT) AS dist,
                  row_number() OVER (PARTITION BY d_key
                                     ORDER BY dist, c_custkey) AS rk
           FROM cand)
         SELECT d_key, d_name, c_custkey, dist
         FROM best WHERE rk = 1 ORDER BY d_key""",
  )
}
