package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Unigram-LM (SentencePiece-style) subword tokenizer — the second
  * tokenizer family next to BPE (`q_text_bpe*`): instead of greedy
  * merge application, segmentation is a per-word DYNAMIC PROGRAM over
  * a scored piece lexicon (Kudo 2018, public). Two rungs:
  *
  *  - **Encode** (`q_text_unigram_encode`, hash-verified): Viterbi
  *    segmentation under an INTEGER piece score (len² × bitlength of
  *    the corpus count — the log-dampened frequency keeps the count
  *    signal while len²'s superadditivity makes coarser segmentations
  *    win, a deterministic stand-in for the float log-prob with the
  *    same DP structure and exact arithmetic in both engines).
  *    dp(i) carries (max score, min pieces among maxima), both
  *    path-independent optima, so the output is unique with no
  *    tie-break gymnastics. The DuckDB oracle runs the SAME DP as a
  *    recursive CTE carrying the dp arrays as lists with a broadcast
  *    vocab map — the q_text_bpe_encode proof pattern.
  *  - **Fit** (library + spec; float EM is engine-internal): E-step
  *    computes expected piece counts per distinct word via the
  *    forward–backward sums over all segmentations — executor-side
  *    with the bounded probability table broadcast, reduced by a
  *    sorted-fold keyed agg so the double summation order is fixed —
  *    M-step renormalizes; UnigramLmSpec gates monotone corpus
  *    likelihood, single-char closure (every word stays segmentable),
  *    determinism, and vocab equality with a reference counting loop.
  *
  * Scale shape (both rungs): the heavy loop runs over DISTINCT WORDS
  * (vocabulary-sized, not corpus-sized) with the bounded piece table
  * broadcast; corpus-width work is one explode + one keyed join back
  * to documents. At 100 TB the distinct-word frame is the only state
  * that grows sublinearly and the per-word DP is O(len · maxPiece). */
object UnigramLm {
  type Q = (SparkSession, String) => DataFrame

  val MaxPieceLen = 6
  val TopPieces = 96
  val MinPieceCount = 4

  /** Distinct words with multiplicity. */
  private def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** The integer-scored piece vocabulary: top substrings (len 2..6,
    * count ≥ 4, by count desc / piece asc) ∪ every single character —
    * the closure that keeps all words segmentable.
    * score = len² · bitlength(cnt).
    *
    * FULLY DISTRIBUTED (r9 advisory — this was the one driver-side fit
    * in the repo): substrings explode into a keyed agg (a bounded ≤5×
    * blowup of the distinct-word text), the top-k is a
    * TakeOrderedAndProject, and only the ≤ TopPieces + alphabet result
    * rows ever reach the driver. */
  def vocabScores(docs: DataFrame): Map[String, Long] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs)
    val subs = words.select(col("cnt"), explode(expr(
      s"""flatten(transform(sequence(2, $MaxPieceLen),
            l -> CASE WHEN length(w) >= l
                 THEN transform(sequence(1, length(w) - l + 1),
                                i -> substring(w, i, l))
                 ELSE array() END))""")).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("cnt"))
    val top = subs.filter(col("cnt") >= MinPieceCount)
      .orderBy(col("cnt").desc, col("piece"))
      .limit(TopPieces).as[(String, Long)].collect()
    val chars = words
      .select(col("cnt"), explode(split(col("w"), "")).as("piece"))
      .filter(length(col("piece")) === 1)
      .groupBy("piece").agg(sum("cnt").as("cnt"))
      .as[(String, Long)].collect()
    (top ++ chars).map { case (p, c) =>
      p -> p.length.toLong * p.length *
        (64 - java.lang.Long.numberOfLeadingZeros(c))
    }.toMap
  }

  /** Viterbi over one word: (max total score, min pieces among maxima).
    * Single-char closure guarantees feasibility at every position. */
  def viterbi(w: String, vocab: Map[String, Long]): (Long, Int) = {
    val n = w.length
    val ds = new Array[Long](n + 1)
    val dn = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestS = Long.MinValue
      var bestN = Int.MaxValue
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        vocab.get(w.substring(j, i)).foreach { sc =>
          val s = ds(j) + sc; val np = dn(j) + 1
          if (s > bestS || (s == bestS && np < bestN)) { bestS = s; bestN = np }
        }
        j += 1
      }
      require(bestS != Long.MinValue,
        s"unigram: position $i of '$w' unsegmentable — char closure broken")
      ds(i) = bestS; dn(i) = bestN
      i += 1
    }
    (ds(n), dn(n))
  }

  /** `q_text_unigram_encode`: per-doc Viterbi totals over the integer
    * lexicon — (n_words, n_pieces, score), all exact BIGINTs. */
  def unigramEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val vocab = vocabScores(docs)
    val bc = s.sparkContext.broadcast(vocab)
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("w"))
    val perWord = toks.select("w").distinct().as[String]
      .mapPartitions { ws =>
        val v = bc.value
        ws.map { w => val (sc, np) = viterbi(w, v); (w, sc, np) }
      }
      .toDF("w", "score", "n_pieces")
    toks.join(perWord, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pieces")).cast("long").as("n_pieces"),
        sum(col("score")).cast("long").as("score"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- EM fit --

  /** One word's forward sums of segmentation probabilities: z(i) =
    * Σ_{j} z(j)·p(piece(j,i)) — the normalizer over ALL segmentations. */
  private def forward(w: String, p: Map[String, Double]): Array[Double] = {
    val z = new Array[Double](w.length + 1)
    z(0) = 1.0
    for (i <- 1 to w.length; j <- math.max(0, i - MaxPieceLen) until i)
      p.get(w.substring(j, i)).foreach(pp => z(i) += z(j) * pp)
    z
  }

  /** EM fit of piece probabilities (Kudo 2018 without the pruning
    * schedule — the candidate set is fixed at vocabScores' support).
    * Returns (pieces sorted, per-iteration corpus log-likelihood) —
    * the spec gates monotone likelihood, closure, and determinism.
    * Float EM is engine-internal by nature → no oracle, no query id.
    *
    * DISTRIBUTED E-step (r9 advisory): each iteration runs the
    * forward–backward lattice per distinct word executor-side with the
    * bounded probability table broadcast, reduces expected counts by a
    * keyed agg, and collects only the ≤ |support|+1 result rows. The
    * per-piece reduction folds a SORTED contribution list, so the
    * double summation order — and with it the whole fit — is
    * deterministic regardless of partitioning. */
  def fit(docs: DataFrame, iters: Int = 5)
      : (Seq[(String, Double)], Seq[Double]) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = wordCounts(docs).as[(String, Long)]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val raw = vocabScores(docs)
      val support = raw.keys.toSeq.sorted
      var p = {
        val tot = raw.values.sum.toDouble
        raw.map { case (k, v) => k -> v / tot }
      }
      val lls = Seq.newBuilder[Double]
      // a space can never appear inside a piece (words come from a
      // split on ' '), so this key cannot collide with a real piece
      val llKey = " ll"
      val maxLen = MaxPieceLen
      for (_ <- 1 to iters) {
        val bc = spark.sparkContext.broadcast(p)
        val sums = words.mapPartitions { ws =>
          val pm = bc.value
          ws.flatMap { case (w, cnt) =>
            val a = forward(w, pm)
            // backward sums, then expected count of piece (j,i) is
            // a(j)·p·b(i)/a(n) — textbook forward–backward on the lattice
            val b = new Array[Double](w.length + 1)
            b(w.length) = 1.0
            for (i <- w.length - 1 to 0 by -1;
                 k <- i + 1 to math.min(w.length, i + maxLen))
              pm.get(w.substring(i, k)).foreach(pp => b(i) += pp * b(k))
            val z = a(w.length)
            require(z > 0, s"unigram fit: '$w' has zero mass — closure broken")
            val local = scala.collection.mutable.HashMap[String, Double]()
            for (i <- 1 to w.length; j <- math.max(0, i - maxLen) until i)
              pm.get(w.substring(j, i)).foreach { pp =>
                val e = cnt * a(j) * pp * b(i) / z
                if (e > 0)
                  local.updateWith(w.substring(j, i))(o =>
                    Some(o.getOrElse(0.0) + e))
              }
            local.iterator ++ Iterator.single(llKey -> cnt * math.log(z))
          }
        }.toDF("piece", "e")
          .groupBy("piece")
          .agg(aggregate(sort_array(collect_list(col("e"))),
            lit(0.0), (acc, x) => acc + x).as("e"))
          .as[(String, Double)].collect().toMap
        bc.destroy()
        lls += sums(llKey)
        // support-sorted total so the normalizer's summation order is
        // fixed too
        val tot = support.iterator.map(k => sums.getOrElse(k, 0.0)).sum
        // keep every support piece alive with a floor so closure survives
        // pruning-free EM (a zeroed char would make some word infeasible)
        p = support.map(k =>
          k -> math.max(sums.getOrElse(k, 0.0) / tot, 1e-12)).toMap
      }
      (support.map(k => k -> p(k)), lls.result())
    } finally words.unpersist(blocking = false)
  }

  val queries: Map[String, Q] = Map(
    "q_text_unigram_encode" -> unigramEncode _,
  )

  val oracle: Map[String, String] = Map(
    // the SAME integer Viterbi as a recursive CTE: dp arrays carried as
    // lists, vocab as a map literal, candidates via list lambdas. The
    // (max score, min pieces) pair is a path-independent optimum, so
    // both engines land on identical BIGINTs.
    "q_text_unigram_encode" ->
      """WITH RECURSIVE
         toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
                  FROM documents),
         words AS (SELECT w, count(1) AS cnt FROM toks GROUP BY w),
         subs AS (SELECT substr(w, CAST(i AS INT), CAST(l AS INT)) AS piece,
                         sum(cnt) AS cnt
                  FROM words,
                       unnest(range(2, 7)) AS lu(l),
                       LATERAL unnest(range(1, len(w) - l + 2)) AS iu(i)
                  WHERE len(w) >= l
                  GROUP BY piece),
         top AS (SELECT piece, cnt FROM subs WHERE cnt >= 4
                 ORDER BY cnt DESC, piece LIMIT 96),
         chars AS (SELECT substr(w, CAST(i AS INT), 1) AS piece, sum(cnt) AS cnt
                   FROM words, LATERAL unnest(range(1, len(w) + 1)) AS iu(i)
                   GROUP BY piece),
         vocab AS (SELECT piece,
                          CAST(len(piece) * len(piece)
                               * length(bin(CAST(cnt AS BIGINT))) AS BIGINT)
                            AS score
                   FROM (SELECT piece, cnt FROM top
                         UNION ALL SELECT piece, cnt FROM chars)),
         vm AS (SELECT map(list(piece), list(score)) AS V FROM vocab),
         dp AS (
           SELECT w, CAST(len(w) AS INT) AS n, 0 AS i,
                  [CAST(0 AS BIGINT)] AS ds, [0] AS dn
           FROM words
           UNION ALL
           SELECT w, n, i + 1, list_append(ds, bs), list_append(dn, bn)
           FROM (
             SELECT w, n, i, ds, dn, bs,
                    list_min(list_transform(
                      list_filter(cands, c -> c.s = bs), c -> c.np)) AS bn
             FROM (
               SELECT w, n, i, ds, dn, cands,
                      list_max(list_transform(cands, c -> c.s)) AS bs
               FROM (
                 SELECT d.w, d.n, d.i, d.ds, d.dn,
                        list_filter(
                          list_transform(
                            range(greatest(0, d.i + 1 - 6), d.i + 1),
                            j -> struct_pack(
                              s := d.ds[CAST(j AS INT) + 1] +
                                map_extract(V, substr(d.w, CAST(j AS INT) + 1,
                                  d.i + 1 - CAST(j AS INT)))[1],
                              np := d.dn[CAST(j AS INT) + 1] + 1)),
                          c -> c.s IS NOT NULL) AS cands
                 FROM dp d CROSS JOIN vm
                 WHERE d.i < d.n
               )
             )
           )
         ),
         enc AS (SELECT w, ds[n + 1] AS score, dn[n + 1] AS np
                 FROM dp WHERE i = n)
         SELECT t.doc_id,
                CAST(count(1) AS BIGINT) AS n_words,
                CAST(sum(e.np) AS BIGINT) AS n_pieces,
                CAST(sum(e.score) AS BIGINT) AS score
         FROM toks t JOIN enc e USING (w)
         GROUP BY t.doc_id
         ORDER BY t.doc_id""",
  )
}
