package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Exact distributed heavy hitters (frequent items above a frequency
  * threshold) via the two-pass Misra–Gries pattern — the scalable
  * alternative to a full `groupBy(item)` when the item domain is huge
  * (shingles, URLs, n-grams at 100 TB) but the answer set is tiny.
  *
  * Pass 1 runs Misra–Gries summaries per partition (`mapPartitions`, k =
  * ceil(1/phi) counters, O(k) memory regardless of partition size) and
  * unions the surviving keys into a candidate set. The classic guarantee
  * composes across partitions: an item with global count >= phi*N has
  * count_p >= phi*N_p in at least one partition (averaging argument),
  * and MG with k >= 1/phi counters never evicts an item whose partition
  * frequency exceeds N_p/(k+1) < phi*N_p — so the candidate union is a
  * SUPERSET of the true heavy hitters. No candidate shuffle: the set is
  * at most k per partition and broadcasts.
  *
  * Pass 2 makes the answer exact: every token is bucketed to its
  * candidate key (broadcast left join) or to a single "other" bucket, so
  * one hash aggregation over a BOUNDED key domain (<= k*P + 1 keys,
  * map-side combine collapses it before the shuffle) yields exact
  * candidate counts AND the exact corpus total (sum over the tiny counts
  * frame) in the same job. The final phi*N filter drops the
  * false-positive candidates, leaving exactly the true heavy hitters —
  * which is why this query hash-matches a plain GROUP BY/HAVING oracle.
  *
  * Contrast with `TextOps.textTokenize` (top-k over a 31-token
  * vocabulary: plain groupBy is right there) — heavy hitters earns its
  * two passes only when distinct items >> memory; here the domain is
  * word BIGRAMS (~1k distinct at sf0.01, unbounded in a real corpus).
  */
object HeavyHitters {
  type Q = (SparkSession, String) => DataFrame

  /** Support threshold: report bigrams with count >= Phi * total.
    * 0.0012 sits between the corpus's top (~0.0018 of mass) and typical
    * (~0.0011) bigram frequencies, so the answer is a selective nonempty
    * set at every shipped SF. */
  val Phi = 0.0012

  /** Misra–Gries summary of one partition: streams the iterator through
    * k counters; emits the keys still held at the end (their counts are
    * lower bounds — only keys matter here, pass 2 recounts exactly). */
  def misraGries(items: Iterator[String], k: Int): Iterator[String] = {
    require(k > 0, s"misraGries: k must be positive, got $k")
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach { item =>
      counters.get(item) match {
        case Some(c) => counters.update(item, c + 1)
        case None if counters.size < k => counters.update(item, 1L)
        case None => // decrement-all step, dropping exhausted counters
          val dead = List.newBuilder[String]
          counters.foreach { case (key, c) =>
            if (c == 1L) dead += key else counters.update(key, c - 1)
          }
          dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Exact heavy hitters of `items` (single string column named `item`):
    * rows (item, n) with n >= phi * count(*), ordered count-desc. */
  def heavyHitters(items: DataFrame, phi: Double): DataFrame = {
    require(phi > 0 && phi <= 1, s"heavyHitters: phi in (0,1], got $phi")
    val s = items.sparkSession
    import s.implicits._
    val k = math.ceil(1.0 / phi).toInt
    val candidates = items.as[String]
      .mapPartitions(part => misraGries(part, k))
      .distinct().toDF("item").withColumn("__cand", lit(true))
    // bounded-domain exact recount: candidate keys pass through, the
    // long tail collapses into the NULL bucket (kept only for the total)
    val counts = items
      .join(broadcast(candidates), Seq("item"), "left")
      .groupBy(when(col("__cand"), col("item")).as("item"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    counts.filter(col("item").isNotNull)
      .crossJoin(broadcast(total))
      .filter(col("n") >= col("__total") * phi)
      .select(col("item"), col("n"))
      .orderBy(col("n").desc, col("item"))
  }

  /** Word bigrams of the documents table, one row per occurrence. The
    * token array is projected to its own column BEFORE the gram lambda:
    * `wordNGrams` references its input once per `element_at`, and an
    * inline `tokens(text)` argument would re-run the split per
    * reference — the O(len²) trap documented at `repetitionOf` and
    * `repeatedPassages`. */
  def docBigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(explode(TextOps.wordNGrams(col("toks"), 2)).as("item"))

  def textHeavyHitters(s: SparkSession, d: String): DataFrame =
    heavyHitters(docBigrams(s, d), Phi)
      .withColumnRenamed("item", "gram")

  val queries: Map[String, Q] = Map(
    "q_text_heavyhitters" -> textHeavyHitters _,
  )

  val oracle: Map[String, String] = Map(
    // plain GROUP BY + HAVING over the same bigram definition — the
    // hash gate proves the MG candidate pass loses nothing
    "q_text_heavyhitters" ->
      s"""WITH t AS (SELECT str_split(text, ' ') AS toks FROM documents
                     WHERE len(str_split(text, ' ')) >= 2),
          g AS (SELECT unnest(generate_series(1, len(toks) - 1)) AS i,
                       toks
                FROM t),
          g2 AS (SELECT toks[i] || ' ' || toks[i+1] AS gram FROM g),
          tot AS (SELECT count(1) AS c FROM g2)
          SELECT gram, CAST(count(1) AS BIGINT) AS n
          FROM g2, tot
          GROUP BY gram, c
          HAVING count(1) >= c * ${Phi}
          ORDER BY n DESC, gram""",
  )
}
