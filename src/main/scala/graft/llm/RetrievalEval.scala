package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Retrieval-quality evaluation (`q_text_retrieval_eval`) — the metric
  * rung that sits on top of the BM25 scorer: per query term, nDCG@10,
  * MRR@10 and P@10 of the Okapi ranking judged against a relevance
  * standard DERIVED FROM AN INDEPENDENT SIGNAL, the way search eval is
  * actually run (ranker and judgments must not share a definition or
  * the metric is a tautology — rel := tf would score every ranking 1).
  *
  * Relevance here is lead-position presence (title proxy): rel = 2 if
  * the term occurs in the doc's first 5 tokens, 1 if in the first 10,
  * else 0 — graded, deterministic, and SQL-expressible, so the whole
  * evaluation is hash-verified against DuckDB. The ranking is the
  * body-frequency BM25 (k1 = 1.2, b = 0.75, same formula as
  * q_text_bm25) over a rounded-score + doc_id total order.
  *
  * Metric definitions (ln-discounted DCG — the log base cancels in the
  * nDCG ratio anyway):
  *  - DCG@10  = Σ_{i≤10} (2^rel(i) − 1) / ln(i + 1)
  *  - IDCG@10 = the same sum over the rel-sorted TOP-10 of the term's
  *    whole relevant population (every rel>0 doc contains the term, so
  *    the matched-candidate frame covers the population — asserted by
  *    construction, not assumed);
  *  - nDCG = DCG/IDCG (0 when the term has no relevant docs);
  *  - MRR@10 = 1/rank of the first rel>0 result in the top 10, else 0;
  *  - P@10 = |{rel>0 in top 10}| / 10.
  *
  * Scale shape: identical to q_text_bm25 — the isin(term) filter prunes
  * the exploded token stream at the scan, df/N/avgdl are broadcast
  * 1-row/|Q|-row frames, per-term ranking is a window over the matched
  * candidates only (|Q| small partitions), and the metric aggregation
  * is |Q| rows. Nothing shuffles at corpus width except the matched
  * (doc, term) counts. */
object RetrievalEval {
  type Q = (SparkSession, String) => DataFrame

  val Terms = Seq("dup", "vector", "merge", "filter", "join")
  val K = 10

  private def relOf(toks: Column, term: Column): Column =
    when(array_contains(slice(toks, 1, 5), term), lit(2))
      .when(array_contains(slice(toks, 1, 10), term), lit(1))
      .otherwise(lit(0))

  def textRetrievalEval(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    // matched candidates only: (term, doc, tf, rel). rel > 0 ⇒ the term
    // is among the doc's tokens ⇒ the doc is in this frame, so the
    // ideal ranking drawn from it covers the whole relevant population.
    val tf = docs
      .select(col("doc_id"), col("dl"), col("toks"), explode(col("toks")).as("t"))
      .filter(col("t").isin(Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"), first(col("toks")).as("toks"))
      .withColumn("rel", relOf(col("toks"), col("t")))
      .persist() // feeds scores + ideal ranking; harness-released
    val dfc = tf.select(col("doc_id"), col("t")).distinct()
      .groupBy(col("t")).agg(count(lit(1)).as("df"))
    val k1 = lit(1.2); val b = lit(0.75)
    val scored = tf.join(broadcast(dfc), "t")
      .crossJoin(broadcast(stats))
      .withColumn("score", round(
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          col("tf") * (k1 + 1) /
          (col("tf") + k1 * (lit(1.0) - b + b * col("dl") / col("avgdl"))) +
          lit(1e-9), 4))
    val byScore = Window.partitionBy("t")
      .orderBy(col("score").desc, col("doc_id"))
    val byRel = Window.partitionBy("t")
      .orderBy(col("rel").desc, col("doc_id"))
    val gain = pow(lit(2.0), col("rel")) - 1.0
    val top = scored.withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= K)
      .groupBy(col("t"))
      .agg(
        sum(gain / log(col("rnk") + 1.0)).as("dcg"),
        coalesce(max(when(col("rel") > 0,
          lit(1.0) / col("rnk"))), lit(0.0)).as("mrr10"),
        (sum(when(col("rel") > 0, 1).otherwise(0)) / lit(K * 1.0)).as("p10"))
    val ideal = scored.withColumn("irk", row_number().over(byRel))
      .filter(col("irk") <= K)
      .groupBy(col("t"))
      .agg(sum(gain / log(col("irk") + 1.0)).as("idcg"),
        sum(when(col("rel") > 0, 1).otherwise(0)).as("n_rel_top"))
    top.join(ideal, "t")
      .select(col("t").as("term"),
        col("n_rel_top").cast("long").as("n_rel_top"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg"))
          .otherwise(lit(0.0)) + lit(1e-9), 4).as("ndcg10"),
        round(col("mrr10") + lit(1e-9), 4).as("mrr10"),
        round(col("p10") + lit(1e-9), 4).as("p10"))
      .orderBy("term")
  }

  val queries: Map[String, Q] = Map(
    "q_text_retrieval_eval" -> textRetrievalEval _,
  )

  val oracle: Map[String, String] = Map(
    // same BM25 formula/total order as q_text_bm25; rel from lead-token
    // presence; ln-discounted DCG; MRR via max(1/rnk | rel>0)
    "q_text_retrieval_eval" ->
      """WITH docs AS (SELECT doc_id, str_split(text, ' ') AS toks,
                              len(str_split(text, ' ')) AS dl
                       FROM documents),
         stats AS (SELECT count(1) AS n_docs, avg(dl) AS avgdl FROM docs),
         tf AS (SELECT doc_id, dl, any_value(toks) AS toks, t,
                       count(1) AS tf
                FROM (SELECT doc_id, dl, toks, unnest(toks) AS t FROM docs)
                WHERE t IN ('dup', 'vector', 'merge', 'filter', 'join')
                GROUP BY doc_id, dl, t),
         reltf AS (SELECT doc_id, dl, t, tf,
                          CASE WHEN list_contains(toks[1:5], t) THEN 2
                               WHEN list_contains(toks[1:10], t) THEN 1
                               ELSE 0 END AS rel
                   FROM tf),
         dfc AS (SELECT t, count(DISTINCT doc_id) AS df FROM reltf GROUP BY t),
         scored AS (
           SELECT r.t, r.doc_id, r.rel,
                  round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                        * r.tf * 2.2
                        / (r.tf + 1.2 * (1.0 - 0.75 + 0.75 * r.dl / avgdl))
                        + 1e-9, 4) AS score
           FROM reltf r JOIN dfc USING (t), stats),
         ranked AS (
           SELECT t, rel,
                  row_number() OVER (PARTITION BY t
                                     ORDER BY score DESC, doc_id) AS rnk
           FROM scored),
         top AS (
           SELECT t,
                  sum((pow(2.0, rel) - 1.0) / ln(rnk + 1.0)) AS dcg,
                  coalesce(max(CASE WHEN rel > 0 THEN 1.0 / rnk END), 0.0)
                    AS mrr10,
                  sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) / 10.0 AS p10
           FROM ranked WHERE rnk <= 10 GROUP BY t),
         irank AS (
           SELECT t, rel,
                  row_number() OVER (PARTITION BY t
                                     ORDER BY rel DESC, doc_id) AS irk
           FROM scored),
         ideal AS (
           SELECT t,
                  sum((pow(2.0, rel) - 1.0) / ln(irk + 1.0)) AS idcg,
                  sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_rel_top
           FROM irank WHERE irk <= 10 GROUP BY t)
         SELECT t AS term,
                CAST(n_rel_top AS BIGINT) AS n_rel_top,
                round(CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END
                      + 1e-9, 4) AS ndcg10,
                round(mrr10 + 1e-9, 4) AS mrr10,
                round(p10 + 1e-9, 4) AS p10
         FROM top JOIN ideal USING (t)
         ORDER BY term""",
  )
}
