package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
import graft.tables.Tables

/** Corpus-trained bigram language-model scoring — the classic
  * perplexity-style quality filter (CCNet/KenLM-shaped: train an n-gram
  * LM on the corpus, score each document by its average token
  * log-probability, drop the tail). The CONDITIONAL rung above
  * TextOps.textLogProb's unigram model: that one scores tokens in
  * isolation (vocabulary-rarity cut); this one scores transitions
  * p(w2|w1), so scrambled-but-common-vocab text — which the unigram
  * model waves through — scores low. Different model class, different
  * filter: real pipelines run both. Here the LM is add-one-smoothed
  * bigrams trained on the SAME corpus being scored, so the whole
  * pipeline is deterministic and DuckDB-replayable end-to-end:
  *
  *   p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)
  *   score(doc) = mean over its bigrams of ln p, rounded per repo float
  *   discipline (6 dp per-bigram ln, 4 dp final mean).
  *
  * Scale shape: two keyed aggs over the exploded token/bigram streams
  * (map-side combine) build the model; the scoring pass joins each
  * document bigram against the model on (w1,w2) and w1. Both model
  * frames are VOCABULARY-sized, not corpus-sized — |V| unigrams and
  * ≤|V|² OBSERVED bigrams. The broadcast claim is therefore a
  * BOUNDED-VOCABULARY statement (round-8 advisory): it holds for this
  * fixture's ~40-token vocabulary and for any controlled tag/label
  * vocabulary, but at a natural-language |V|~30k the ≤|V|² bound is
  * ~1e9 rows and only the (much smaller) observed-bigram count decides;
  * when that frame outgrows the broadcast threshold Spark's planner
  * falls back to a shuffle hash join on (w1,w2) — same plan shape, one
  * extra keyed shuffle, still never all-pairs. The scoring pass is one
  * scan of the corpus with two model joins + one keyed agg back to
  * doc_id; at 100 TB the only shuffles are the model-build agg, the
  * model join (if not broadcast), and the final per-doc agg. Docs with <2 tokens
  * have no bigrams and score NULL (kept, flagged by n_bigrams=0 — a
  * filter consumer decides their fate, the scorer doesn't). */
object LmScore {
  type Q = (SparkSession, String) => DataFrame

  /** The operator proper over ANY (doc_id, text) frame — public so
    * specs drive hand-computed corpora through the same plan. */
  def scoreDocs(docs: DataFrame): DataFrame = {
    val t = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val uni = t.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val vocab = uni.agg(count(lit(1)).as("v"))
    // NOTE (r12 measurement): persisting this twice-consumed frame (the
    // repeatedPassages pattern) was tried and measured NEUTRAL at sf0.1
    // (1.37 → 1.40 s) — the bigram stream is cheap enough to recompute
    // here, unlike the 8-gram distinct pipeline. Left unpersisted.
    val docBi = t.filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(TextOps.wordNGrams(col("toks"), 2)).as("gram"))
      .withColumn("w1", split_part(col("gram"), lit(" "), lit(1)))
    val biCnt = docBi.groupBy(col("gram")).agg(count(lit(1)).as("cab"))
    val scored = docBi
      .join(broadcast(biCnt), Seq("gram"))
      .join(broadcast(uni.select(col("w").as("w1"), col("cw"))), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        round(log((col("cab") + lit(1.0)) / (col("cw") + col("v"))) +
          lit(1e-9), 6).as("lp"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        NumFmt.roundSigned(avg(col("lp")) + lit(1e-9), 4).as("lm_score"))
    // left join back so token-poor docs stay visible with n_bigrams=0
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("lm_score"))
      .orderBy("doc_id")
  }

  def lmScore(s: SparkSession, d: String): DataFrame =
    scoreDocs(Tables.documents(s, d))

  val queries: Map[String, Q] = Map("q_text_lm_score" -> lmScore _)

  val oracle: Map[String, String] = Map(
    "q_text_lm_score" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks
                    FROM documents),
         u AS (SELECT unnest(toks) AS w FROM t),
         uc AS (SELECT w, CAST(count(1) AS BIGINT) AS cw FROM u GROUP BY w),
         vt AS (SELECT CAST(count(1) AS BIGINT) AS v FROM uc),
         gi AS (SELECT doc_id,
                       unnest(generate_series(1, len(toks) - 1)) AS i, toks
                FROM t WHERE len(toks) >= 2),
         b AS (SELECT doc_id, toks[i] AS w1,
                      toks[i] || ' ' || toks[i+1] AS gram
               FROM gi),
         bc AS (SELECT gram, CAST(count(1) AS BIGINT) AS cab
                FROM b GROUP BY gram),
         lp AS (SELECT b.doc_id,
                       round(ln((bc.cab + 1.0) / (uc.cw + vt.v)) + 1e-9, 6)
                         AS lp
                FROM b JOIN bc ON b.gram = bc.gram
                       JOIN uc ON b.w1 = uc.w, vt),
         sc AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS n_bigrams,
                       round(avg(lp) + 1e-9, 4) + 0.0 AS lm_score
                FROM lp GROUP BY doc_id)
         SELECT d.doc_id, coalesce(sc.n_bigrams, 0) AS n_bigrams,
                sc.lm_score
         FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         ORDER BY d.doc_id""",
  )
}
