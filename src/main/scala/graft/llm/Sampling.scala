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

  /** THE train/test split column — single definition shared by the split
    * roll-up and the contamination audit, so the audit can never silently
    * check a different split than the one used for training. */
  def splitCol(id: Column): Column =
    when(hashBucket(id, "split", 100) < 90, "train").otherwise("test")

  /** 90/10 train/test split of the documents corpus by hashed doc_id,
    * rolled up per (lang, split) to prove stratification coverage. */
  def sampleHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        // integer sum / count — exact in both engines; epsilon is belt
        // and braces on the 4dp round
        round(avg(col("n_chars")) + lit(1e-9), 4).as("avg_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "split")

  /** Deterministic global training-order shuffle: ORDER BY a
    * content-addressed md5 key derived from (epoch-seed, doc_id). The
    * permutation is a pure function of the data — stable across cluster
    * sizes, task retries, and reruns (no rand(), no zipWithIndex), and a
    * different epoch seed yields an independent order, which is exactly
    * the pre-training epoch-shuffle contract. Plans as a range-
    * partitioned sort on the 32-hex key: at 100 TB that is the sampled
    * range exchange + per-partition sort Spark already does best, and
    * downstream shard writers consume the order partition-by-partition
    * (no global collection point). */
  def sampleShuffle(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("shuffle_key",
        md5(concat(lit("epoch7:"), col("doc_id").cast("string"))))
      .select(col("shuffle_key"), col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("shuffle_key")

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

  /** Johnson–Lindenstrauss random projection of the embedding column
    * down to ProjK dims: y_j = (Σ_i x_i · s(i,j)) / √k with
    * s(i,j) = ±1 chosen by the parity of md5("p:i:j") — Achlioptas
    * (2003)'s database-friendly ±1 JL variant, with the sign matrix
    * derived from a hash BOTH engines compute identically, so the
    * projection is hash-verifiable end to end (no engine RNG anywhere).
    *
    * Scale shape: pure per-row codegen'd HOF arithmetic (k·d
    * multiply-adds), no shuffle, no broadcast, no driver state — the
    * dimensionality-reduction pass an indexing pipeline runs before
    * storing vectors at corpus scale (4× fewer bytes at k=16 over
    * d=64 before any quantization). Output = projected checksum and
    * norm per vector; distance preservation is spec-gated. */
  val ProjK = 16

  /** s(i,j) computed ONCE on the driver with the same md5 definition the
    * oracle replays — the matrix is row-independent, so hashing it
    * per row (the first-cut form) did k·d md5 calls PER VECTOR: ~5M
    * digests per pass at sf0.1, 6.7 s of pure hashing for a 1024-entry
    * constant. Precomputed it's a (k × d) literal the executors fold
    * against — at reference scale (k=16, d=28k) that's ~3.5 MB of plan
    * literal, still the bounded-stats class. */
  private def signMatrix(dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Double = {
      val hex = md.digest(s"p:$i:$j".getBytes("UTF-8"))
        .take(1).map("%02x".format(_)).mkString
      if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
    }
    (0 until ProjK).map(j => (0 until dim).map(i => sign(i, j)))
  }

  /** Spec-only window into the sign matrix so GopherProjectSpec can
    * rebuild the original HOF formulation as a bit-equality reference. */
  private[llm] def signMatrixForSpec(dim: Int): Seq[Seq[Double]] =
    signMatrix(dim)

  /** `dim` must equal every row's vector length (64 for the embeddings
    * table); a shorter row would fold NULL into its tail sums.
    *
    * The k×d fold is UNROLLED into a static expression tree (k columns
    * of d multiply-adds) instead of nested `transform`/`aggregate`
    * HOFs: the signs are plan-time constants, so every element_at has a
    * literal ordinal and whole-stage codegen compiles the projection to
    * straight-line arithmetic — the HOF form paid interpreted-lambda
    * overhead per element (k·d·|rows| closure calls; measured 12.4 s →
    * 1.8 s warm at sf0.1). Accumulation order is unchanged (i ascending,
    * left-assoc, 0.0 seed absorbed exactly by IEEE +), so results are
    * bit-identical to the HOF form — GopherProjectSpec pins it. */
  def embedProjectVecs(df: DataFrame, dim: Int = 64): DataFrame = {
    val s = signMatrix(dim)
    val ys = (0 until ProjK).map { j =>
      (0 until dim).map { i =>
        element_at(col("v"), i + 1) * lit(s(j)(i))
      }.reduceLeft(_ + _) / sqrt(lit(ProjK.toDouble))
    }
    df.withColumn("y", array(ys: _*))
  }

  def embedProject(s: SparkSession, d: String): DataFrame =
    embedProjectVecs(
      Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v")))
      .select(col("vec_id"),
        // roundSigned: a projection summing to ~-1e-9 rounds to -0.0 in
        // one engine and +0.0 in the other (surfaced at sf10, row
        // 190622 of 200k) — the signed-zero collapse is the shared
        // NumFmt convention for exactly this class
        graft.functions.NumFmt.roundSigned(
          aggregate(col("y"), lit(0.0), (a, x) => a + x) + lit(1e-9), 4)
          .as("proj_sum"),
        graft.functions.NumFmt.roundSigned(
          sqrt(aggregate(col("y"), lit(0.0), (a, x) => a + x * x))
            + lit(1e-9), 4).as("proj_norm"))
      .orderBy("vec_id")

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * key_i = u_i^(1/w_i) with u_i derived from the doc's hash, top-k by
    * key. Deterministic (content-hash u, not rand) and one-pass
    * distributed: at scale this is a TakeOrderedAndProject over a per-row
    * computed key — no global sort, no driver state. Ranking uses the
    * ROUNDED key (6 dp) with a doc_id tiebreak so the cross-engine order
    * is total even if the two engines' pow() differ in the last ulp. */
  def sampleWeighted(s: SparkSession, d: String): DataFrame = {
    val u = (Dedup.md5Hash60(concat(lit("w:"), col("doc_id").cast("string")))
      + lit(1L)).cast("double") / lit(math.pow(2.0, 60))
    Tables.documents(s, d)
      .withColumn("key",
        round(pow(u, lit(1.0) / col("n_chars")) + lit(1e-9), 6))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("key"))
  }

  /** Stratified fixed-n subsample: the first 5 docs per language in
    * content-hash order — the "balanced eval slice" op. One window
    * shuffle on the stratum key; rank order is the salted hash, so the
    * slice is deterministic and unbiased by ingestion order. */
  def sampleStratified(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(s, d)
      .withColumn("h", Dedup.md5Hash60(
        concat(lit("strat:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"))
      .orderBy("lang", "rk")
  }

  /** Per-label embedding centroids + intra-class spread: the K-means
    * E-step (centroid = per-position mean) and the class-dispersion
    * diagnostic an embedding-quality audit runs. Both sides compute the
    * distance through a positional (label, pos) equi-join — two keyed
    * aggregations and one join, all O(n·dim) rows, no per-group vector
    * collection. */
  def embedCentroid(s: SparkSession, d: String): DataFrame = {
    val x = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(transform(col("embedding"), v => v.cast("double")))
          .as(Seq("pos", "val")))
    val cent = x.groupBy("label", "pos").agg(avg(col("val")).as("c"))
    val dist = x.join(cent, Seq("label", "pos"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sqrt(sum(pow(col("val") - col("c"), 2.0))).as("dist"))
    dist.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("dist")) + lit(1e-6), 4).as("avg_dist"))
      .orderBy("label")
  }

  /** Temperature-based multilingual rebalancing plan (the α-smoothed
    * sampling distribution used by multilingual LM training — p_l ∝
    * n_l^α with α = 0.5, so low-resource languages are upsampled
    * relative to their corpus share): per-language target counts and
    * sampling rates for a 1000-doc budget. Weights are rounded to 6 dp
    * BEFORE the normalizing sum so both engines divide identical
    * numerators; floor(x+0.5) instead of round() for the target count
    * (exact-half portability, same reasoning as embedQuantize).
    *
    * Scale shape: one hash aggregation to |languages| rows, then a
    * broadcast of the 1-row total — the plan-building step is O(langs),
    * the plan application is the already-shipped hash/stratified
    * samplers. */
  def sampleTemperature(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("w", round(sqrt(col("n_docs")) + lit(1e-9), 6))
    val tot = counts.agg(sum(col("w")).as("tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("w") / col("tot") + lit(1e-9), 6).as("p"),
        floor(col("w") / col("tot") * lit(1000.0) + lit(0.5))
          .cast("long").as("target_n"))
      .withColumn("rate",
        round(col("target_n") / col("n_docs") + lit(1e-9), 6))
      .orderBy("lang")
  }

  /** Train/test contamination audit: for every TEST document, how many of
    * its distinct word 5-grams also appear anywhere in the TRAIN split —
    * the eval-leakage check every benchmark pipeline must run before
    * trusting its numbers. Composes the deterministic hash split with
    * shingle matching: the shingle explode runs once per split branch
    * (train set-build and test audit — at 100 TB these are separate
    * scans of separate table slices anyway), a marking left join of test
    * shingles against the distinct train set, one conditional
    * aggregation — all linear. The join key is md5Hash60(gram), not the
    * gram string: fixed 8-byte shuffle keys instead of multi-hundred-byte
    * shingle text (the 100 TB shuffle-width concern; identical on both
    * engines since a collision would be shared). */
  /** The (doc_id, split, gram_h) shingle frame shared by the
    * contamination audit and the decontamination filter — one
    * definition so audit and removal can never check different grams.
    * The token array is projected BEFORE the gram lambda: an inlined
    * split expression re-tokenizes the text for every element_at
    * reference (5/gram), turning tokenization O(len²) per doc
    * (measured 6.9 s vs ~1 s at sf0.1; the ScSparse.toDense
    * HOF-hoisting lesson again). */
  def shingleFrame(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) >= 5)
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"),
        explode(array_distinct(TextOps.wordNGrams(col("toks"), 5)))
          .as("gram"))
      .select(col("doc_id"), col("split"),
        // join-key-only hash: xxhash64 (never reaches the output; the
        // oracle buckets its own md5 grams and the gate re-proves the
        // no-collision assumption) — the Dedup.jaccardPairs argument
        xxhash64(col("gram")).as("gram_h"))

  def contamination(s: SparkSession, d: String): DataFrame = {
    val sh = shingleFrame(s, d)
    val train = sh.filter(col("split") === "train").select("gram_h").distinct()
    // one pass over the test shingles: the left join marks each shingle
    // present in the train set, the conditional count aggregates both
    // totals together (a left_semi + separate count would re-explode the
    // test side a second time)
    sh.filter(col("split") === "test")
      .join(train.withColumn("__hit", lit(1)), Seq("gram_h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        round(col("n_shared") / col("n_shingles") + lit(1e-9), 4)
          .as("contamination"))
      .orderBy("doc_id")
  }

  /** Decontamination — the REMOVAL the audit above motivates: drop
    * every TRAIN document sharing ANY distinct 5-gram with the TEST
    * split (the conservative n-gram-overlap rule of public LM-eval
    * hygiene, e.g. the GPT-3 appendix). Output is the per-language
    * survivor/dropped roll-up a pipeline logs after the pass.
    *
    * Scale shape: same two linear shingle scans as contamination, a
    * semi-join on the 8-byte gram hash to find offenders, an anti-join
    * to keep survivors — all keyed, no window. Docs shorter than the
    * shingle width carry no shingles and survive by definition. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val sh = shingleFrame(s, d)
    val testGrams = sh.filter(col("split") === "test")
      .select("gram_h").distinct()
    val offenders = sh.filter(col("split") === "train")
      .join(testGrams, Seq("gram_h"), "left_semi")
      .select("doc_id").distinct()
    Tables.documents(s, d)
      .withColumn("split", splitCol(col("doc_id")))
      .filter(col("split") === "train")
      .join(offenders.withColumn("__hit", lit(1)), Seq("doc_id"), "left")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_train"),
        count(col("__hit")).as("n_dropped"),
        (count(lit(1)) - count(col("__hit"))).as("n_kept"))
      .orderBy("lang")
  }

  val queries: Map[String, Q] = Map(
    "q_contamination"     -> contamination _,
    "q_decontaminate"     -> decontaminate _,
    "q_sample_hash"       -> sampleHash _,
    "q_sample_shuffle"    -> sampleShuffle _,
    "q_embed_quantize"    -> embedQuantize _,
    "q_sample_weighted"   -> sampleWeighted _,
    "q_sample_stratified" -> sampleStratified _,
    "q_sample_temperature" -> sampleTemperature _,
    "q_embed_centroid"    -> embedCentroid _,
    "q_embed_project"     -> embedProject _,
  )

  val oracle: Map[String, String] = Map(
    // sign matrix derived from md5 parity in BOTH engines; folds in
    // index order on both sides (aggregate left fold == list_sum over
    // an index-ordered comprehension), scaled by the exact double 1/4
    "q_embed_project" ->
      """WITH c AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
         p AS (SELECT vec_id,
                 [list_sum(list_transform(range(1, len(v) + 1),
                    i -> v[i] * (CASE WHEN CAST('0x' ||
                        substr(md5('p:' || CAST(i - 1 AS VARCHAR) || ':' ||
                          CAST(j AS VARCHAR)), 1, 1) AS INT) % 2 = 0
                      THEN 1.0 ELSE -1.0 END)))
                  / sqrt(16.0)
                  FOR j IN range(0, 16)] AS y
               FROM c)
         SELECT vec_id,
                round(list_sum(y) + 1e-9, 4) + 0.0 AS proj_sum,
                round(sqrt(list_sum(list_transform(y, t -> t * t)))
                  + 1e-9, 4) + 0.0 AS proj_norm
         FROM p ORDER BY vec_id""",
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
                  CASE WHEN CAST('0x' ||
                         substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,15)
                         AS BIGINT) % 100 < 90
                       THEN 'train' ELSE 'test' END AS split
           FROM documents WHERE len(str_split(text, ' ')) >= 5),
         i AS (SELECT doc_id, split,
                      unnest(generate_series(1, len(toks) - 4)) AS i,
                      toks
               FROM t),
         g AS (SELECT DISTINCT doc_id, split,
                      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram
               FROM i),
         gh AS (SELECT doc_id, split,
                       CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)
                         AS gram_h
                FROM g),
         offenders AS (
           SELECT DISTINCT doc_id FROM gh
           WHERE split = 'train'
             AND gram_h IN (SELECT gram_h FROM gh WHERE split = 'test')),
         train AS (
           SELECT doc_id, lang FROM documents
           WHERE CAST('0x' ||
                   substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,15)
                   AS BIGINT) % 100 < 90)
         SELECT lang, CAST(count(1) AS BIGINT) AS n_train,
                CAST(count(o.doc_id) AS BIGINT) AS n_dropped,
                CAST(count(1) - count(o.doc_id) AS BIGINT) AS n_kept
         FROM train tr LEFT JOIN offenders o ON tr.doc_id = o.doc_id
         GROUP BY lang ORDER BY lang""",
    "q_contamination" ->
      """WITH t AS (SELECT doc_id, str_split(text, ' ') AS toks,
                  CASE WHEN CAST('0x' ||
                         substr(md5('split:' || CAST(doc_id AS VARCHAR)),1,15)
                         AS BIGINT) % 100 < 90
                       THEN 'train' ELSE 'test' END AS split
           FROM documents WHERE len(str_split(text, ' ')) >= 5),
         i AS (SELECT doc_id, split,
                      unnest(generate_series(1, len(toks) - 4)) AS i,
                      toks
               FROM t),
         g AS (SELECT DISTINCT doc_id, split,
                      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3] || ' ' || toks[i+4] AS gram
               FROM i),
         gh AS (SELECT doc_id, split,
                       CAST(('0x' || substr(md5(gram), 1, 15)) AS BIGINT)
                         AS gram_h
                FROM g),
         tr AS (SELECT DISTINCT gram_h FROM gh WHERE split = 'train'),
         te AS (SELECT doc_id, gram_h FROM gh WHERE split = 'test'),
         n AS (SELECT doc_id, CAST(count(1) AS BIGINT) AS n_shingles
               FROM te GROUP BY doc_id),
         s AS (SELECT te.doc_id, CAST(count(1) AS BIGINT) AS n_shared
               FROM te JOIN tr USING (gram_h) GROUP BY te.doc_id)
         SELECT n.doc_id, n.n_shingles,
                coalesce(s.n_shared, 0) AS n_shared,
                round(coalesce(s.n_shared, 0) * 1.0 / n.n_shingles + 1e-9, 4)
                  AS contamination
         FROM n LEFT JOIN s ON n.doc_id = s.doc_id ORDER BY n.doc_id""",
    "q_sample_weighted" ->
      """WITH k AS (
           SELECT doc_id, lang, n_chars,
                  round(pow(
                    (CAST('0x' ||
                       substr(md5('w:' || CAST(doc_id AS VARCHAR)),1,15)
                       AS BIGINT) + 1) / 1152921504606846976.0,
                    1.0 / n_chars) + 1e-9, 6) AS key
           FROM documents)
         SELECT doc_id, lang, n_chars, key
         FROM k ORDER BY key DESC, doc_id LIMIT 20""",
    "q_sample_stratified" ->
      """WITH h AS (
           SELECT lang, doc_id,
                  CAST('0x' ||
                    substr(md5('strat:' || CAST(doc_id AS VARCHAR)),1,15)
                    AS BIGINT) AS h
           FROM documents),
         r AS (SELECT lang, doc_id,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY h, doc_id) AS rk
               FROM h)
         SELECT lang, CAST(rk AS INT) AS rk, doc_id
         FROM r WHERE rk <= 5 ORDER BY lang, rk""",
    "q_sample_temperature" ->
      """WITH c AS (SELECT lang, CAST(count(1) AS BIGINT) AS n_docs
                    FROM documents GROUP BY lang),
         w AS (SELECT lang, n_docs,
                      round(sqrt(n_docs) + 1e-9, 6) AS w
               FROM c),
         t AS (SELECT sum(w) AS tot FROM w)
         SELECT lang, n_docs,
                round(w / tot + 1e-9, 6) AS p,
                CAST(floor(w / tot * 1000.0 + 0.5) AS BIGINT) AS target_n,
                round(CAST(floor(w / tot * 1000.0 + 0.5) AS BIGINT)
                      * 1.0 / n_docs + 1e-9, 6) AS rate
         FROM w, t ORDER BY lang""",
    "q_embed_centroid" ->
      """WITH x AS (SELECT vec_id, label,
                           generate_subscripts(embedding, 1) AS pos,
                           CAST(unnest(embedding) AS DOUBLE) AS val
                    FROM embeddings),
         c AS (SELECT label, pos, avg(val) AS c
               FROM x GROUP BY label, pos),
         d AS (SELECT x.vec_id, x.label,
                      sqrt(sum(pow(val - c, 2))) AS dist
               FROM x JOIN c USING (label, pos)
               GROUP BY x.vec_id, x.label)
         SELECT label, CAST(count(1) AS BIGINT) AS n_vecs,
                round(avg(dist) + 1e-6, 4) AS avg_dist
         FROM d GROUP BY label ORDER BY label""",
    "q_sample_shuffle" ->
      """SELECT md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
                doc_id, lang, n_chars
         FROM documents ORDER BY shuffle_key""",
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
