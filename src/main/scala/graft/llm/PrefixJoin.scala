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
  * On top of that, PPJoin's POSITIONAL filter: for the pair's
  * smallest-rank shared prefix token at (0-based) positions (p1, p2),
  * every token before p1 in A is absent from B (else a smaller shared
  * prefix token would exist — both docs list tokens in the same global
  * order), so overlap ≤ min(n1−p1, n2−p2), which must still reach
  * ⌈τ(n1+n2)/(1+τ)⌉. Emitted per shared token and kept if ANY row
  * passes, so the valid minimal-token bound always survives for a true
  * pair (completeness-safe) while degenerate buckets shed most rows.
  *
  * Scale shape: df counts + rarity ranks are VOCABULARY-sized (the
  * bounded-window class, broadcast back); per-doc sorted-rank arrays are
  * one keyed agg; the candidate join is keyed by prefix-token rank;
  * verification is two doc-keyed joins fetching the rank ARRAYS and a
  * codegen array_intersect per candidate — ranks are 1:1 with tokens,
  * so |rs1 ∩ rs2| IS the token overlap and no per-token row explosion
  * happens after candidate generation. Nothing is ever all-pairs. The
  * DuckDB oracle IS the naive all-pairs join, so hash equality re-proves
  * candidate completeness (prefix + length + positional) at every gate
  * run (the simhash-completeness pattern). */
object PrefixJoin {
  type Q = (SparkSession, String) => DataFrame

  val TAU = 0.95

  /** (doc_id, rs, n): per-doc token-rank array sorted by global rarity
    * (df asc, token asc) — ranks are unique per token, so rank-array
    * intersection equals token-set intersection. */
  private[llm] def rankedSets(tok: DataFrame): DataFrame = {
    // global rarity rank: vocabulary-sized window (documents tokenize to
    // a ~40-keyword vocab; bounded-window class, see Bench WindowExec note)
    val rank = tok.groupBy("t").agg(count(lit(1)).as("df"))
      .withColumn("r", row_number().over(Window.orderBy(col("df"), col("t"))))
      .select("t", "r")
    tok.join(broadcast(rank), Seq("t"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("r"))).as("rs"))
      .withColumn("n", size(col("rs")))
  }

  /** Candidate rows (one per surviving shared-prefix-token occurrence,
    * so a pair can appear more than once) sharing a prefix token,
    * length- and position-filtered. Complete w.r.t. Jaccard ≥ tau by
    * the theorem above; the gate's naive oracle re-proves it. */
  private[llm] def candidateRows(ranked: DataFrame, tau: Double): DataFrame = {
    val prefixLen = (col("n") - ceil(lit(tau) * col("n")) + 1).cast("int")
    val pref = ranked.select(col("doc_id"), col("n"),
      posexplode(slice(col("rs"), lit(1), prefixLen)).as(Seq("p", "r")))
    val minOverlap = ceil(lit(tau) / (lit(1.0) + lit(tau)) *
      (col("n1") + col("n2")))
    pref.select(col("doc_id").as("id1"), col("n").as("n1"),
        col("p").as("p1"), col("r"))
      .join(pref.select(col("doc_id").as("id2"), col("n").as("n2"),
        col("p").as("p2"), col("r")), Seq("r"))
      .filter(col("id1") < col("id2") &&
        col("n2") >= lit(tau) * col("n1") &&
        col("n1") >= lit(tau) * col("n2"))
      // positional filter (valid for the minimal shared token; keeping
      // a pair if ANY of its shared-token rows passes preserves it)
      .filter(least(col("n1") - col("p1"), col("n2") - col("p2")) >=
        minOverlap)
      .select("id1", "id2")
  }

  /** Candidate (id1 < id2) pairs, deduplicated — the spec-facing shape. */
  private[llm] def candidatesFrom(ranked: DataFrame, tau: Double): DataFrame =
    candidateRows(ranked, tau).distinct()

  /** Back-compat entry used by specs: candidates straight from the
    * relational (doc_id, t) token frame. */
  def prefixCandidates(tok: DataFrame, tau: Double): DataFrame =
    candidatesFrom(rankedSets(tok), tau)

  def dedupPrefix(s: SparkSession, d: String): DataFrame = {
    // persisted: three consumers (candidate gen + both verify joins)
    // and the RESULT plan still references it, so no in-function
    // unpersist is possible without recomputing rankedSets per consumer.
    // Lifecycle is harness-released — Bench/Verify clearCache between
    // queries (the Selection.textDsir contract); direct library callers
    // that loop this function should clearCache or unpersist the
    // returned plan's cached lineage themselves (round-8 advisory).
    val ranked = rankedSets(Dedup.tokenSets(Tables.documents(s, d)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // NON-deduplicated candidate rows feed the verify, and the pair
    // dedupe runs AFTER the jaccard filter (r13, guide §2.4): the
    // pre-verify .distinct() was a full exchange + hash dedupe of the
    // ENTIRE candidate set — measured 1.81M rows at sf0.1, of which
    // exactly 1.81M were already unique (at τ=0.95 the positional
    // filter admits only position-0/position-0 prefix matches, one row
    // per pair) — while post-filter the distinct dedupes only the few
    // surviving near-identical pairs. A pair appearing k>1 times (legal
    // on other corpora) costs k cheap codegen intersects and dedupes to
    // one identical output row, so the declared result is unchanged.
    val cand = candidateRows(ranked, TAU)
    // array verify: two doc-keyed joins, one codegen intersect per pair —
    // same rounded-jaccard contract as Dedup.jaccardPairs (round boundary
    // argued there; set sizes ≤ ~40 keep the 4-dp band rational-free)
    cand
      .join(ranked.select(col("doc_id").as("id1"), col("rs").as("rs1"),
        col("n").as("n1")), Seq("id1"))
      .join(ranked.select(col("doc_id").as("id2"), col("rs").as("rs2"),
        col("n").as("n2")), Seq("id2"))
      .withColumn("x", size(array_intersect(col("rs1"), col("rs2"))))
      .withColumn("jaccard",
        round(col("x").cast("double") / (col("n1") + col("n2") - col("x"))
          + lit(1e-9), 4))
      .filter(col("jaccard") >= TAU)
      .select("id1", "id2", "jaccard")
      .distinct()
      .orderBy("id1", "id2")
  }

  val queries: Map[String, Q] = Map("q_dedup_prefix" -> dedupPrefix _)

  val oracle: Map[String, String] = Map(
    // the NAIVE complete all-pairs join over the FULL corpus — hash
    // equality proves the prefix+length+positional filters dropped nothing
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
         ORDER BY id1, id2""")
}
