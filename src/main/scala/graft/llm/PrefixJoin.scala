package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Exact set-similarity join via PREFIX FILTERING (SSJoin/PPJoin family
  * — Chaudhuri et al. 2006, Xiao et al. 2008): the scalable EXACT
  * token-set Jaccard path beside the approximate LSH rungs. The
  * block-bounded all-pairs form (q_dedup_ngram) is the ground truth at
  * fixture scale; THIS is what runs over the full corpus.
  *
  * The theorem: order every doc's tokens by global rarity (df asc); for
  * Jaccard ≥ τ, two sets MUST share a token inside their first
  * |s| − ⌈τ·|s|⌉ + 1 tokens (if all prefix tokens miss, the overlap
  * fits in the suffixes, which is too small for τ). So candidates =
  * pairs sharing ≥1 PREFIX token, plus the length filter
  * τ·|A| ≤ |B| ≤ |A|/τ — at τ=0.95 the prefix is 1–3 RARE tokens per
  * doc, so the candidate join is keyed by rare tokens whose posting
  * lists are short by construction (the df-ordering is what makes the
  * key distribution anti-skewed: common tokens never become join keys).
  *
  * Scale shape: df counts + rarity ranks are VOCABULARY-sized (the
  * bounded-window class, broadcast back); per-doc sorted-rank arrays are
  * one keyed agg; the candidate join is keyed by prefix-token rank;
  * verification reuses [[Dedup.jaccardPairs]] restricted to candidates.
  * Nothing is ever all-pairs. The DuckDB oracle IS the naive all-pairs
  * join, so hash equality re-proves candidate completeness at every
  * gate run (the simhash-completeness pattern). */
object PrefixJoin {
  type Q = (SparkSession, String) => DataFrame

  val TAU = 0.95

  /** Candidate (id1 < id2) pairs sharing a prefix token, length-filtered. */
  def prefixCandidates(tok: DataFrame, tau: Double): DataFrame = {
    // global rarity rank: vocabulary-sized window (documents tokenize to
    // a ~40-keyword vocab; bounded-window class, see Bench WindowExec note)
    val rank = tok.groupBy("t").agg(count(lit(1)).as("df"))
      .withColumn("r", row_number().over(Window.orderBy(col("df"), col("t"))))
      .select("t", "r")
    val ranked = tok.join(broadcast(rank), Seq("t"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
    val n = size(col("rs"))
    val prefixLen = (n - ceil(lit(tau) * n) + 1).cast("int")
    val pref = ranked.select(col("doc_id"), n.as("n"),
        explode(slice(col("rs"), lit(1), prefixLen)).as("r"))
    pref.select(col("doc_id").as("id1"), col("n").as("n1"), col("r"))
      .join(pref.select(col("doc_id").as("id2"), col("n").as("n2"), col("r")),
        Seq("r"))
      .filter(col("id1") < col("id2") &&
        col("n2") >= lit(tau) * col("n1") &&
        col("n1") >= lit(tau) * col("n2"))
      .select("id1", "id2").distinct()
  }

  def dedupPrefix(s: SparkSession, d: String): DataFrame = {
    val tok = Dedup.tokenSets(Tables.documents(s, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Dedup.jaccardPairs(tok, TAU,
        cand = Some(prefixCandidates(tok, TAU)))
      .orderBy("id1", "id2")
    out
  }

  val queries: Map[String, Q] = Map("q_dedup_prefix" -> dedupPrefix _)

  val oracle: Map[String, String] = Map(
    // the NAIVE complete all-pairs join over the FULL corpus — hash
    // equality proves the prefix+length filters dropped nothing
    "q_dedup_prefix" ->
      """WITH t AS (SELECT doc_id,
                           list_distinct(str_split(text, ' ')) AS s
                    FROM documents),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                      len(list_filter(a.s, x -> list_contains(b.s, x)))
                        AS x,
                      len(a.s) AS n1, len(b.s) AS n2
               FROM t a JOIN t b ON a.doc_id < b.doc_id)
         SELECT id1, id2,
                round(x * 1.0 / (n1 + n2 - x) + 1e-9, 4) AS jaccard
         FROM p
         WHERE round(x * 1.0 / (n1 + n2 - x) + 1e-9, 4) >= 0.95
         ORDER BY id1, id2""",
  )
}
