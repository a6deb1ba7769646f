package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew stress for the text/dedup family (round-8 advisory): the
  * documents fixture tokenizes to a ~40-keyword vocabulary, which makes
  * prefix/posting skew unrealistically benign — every real corpus is
  * Zipfian, where the head token appears in nearly every document and
  * would blow up any algorithm that joins on unweighted postings. This
  * spec builds a deterministic Zipf(s≈1.05) corpus over a 4000-word
  * vocabulary with planted near-duplicates and proves, on it:
  *
  *  - the PPJoin prefix filter stays SUB-QUADRATIC: candidates are a
  *    small fraction of all pairs even though head tokens are shared by
  *    ~everything (the rarity ranking puts head tokens at the END of
  *    rank arrays, so they never enter prefixes — exactly the property
  *    the benign fixture could not demonstrate);
  *  - the filter stays COMPLETE: every true Jaccard ≥ τ pair (the
  *    planted near-dups) survives;
  *  - the sparse-cosine posting join's df cap keeps per-gram work
  *    bounded: the Zipf head grams exceed maxDf and drop out of the
  *    space, so the pair count stays output-sized, not corpus².
  *
  * Wall-times are reported via info() and summarized in PERF.md §Zipf.
  */
class ZipfStressSpec extends SparkSpec {
  import spark.implicits._

  private val V = 4000
  private val DocLen = 60
  private val NDocs = 1200
  private val NPlanted = 25

  /** Deterministic Zipf corpus + planted near-dups (each planted doc is
    * a copy of doc i with ONE token swapped → Jaccard well above τ for
    * 60-token sets: ≥ 58/62 ≈ 0.935... so plant with ZERO swaps for
    * τ=0.95: exact dup at distinct-set level means jaccard 1.0; one
    * swap gives ~0.9355 < 0.95 — keep both classes to test the boundary
    * from both sides). */
  private lazy val corpus: DataFrame = {
    val rnd = new scala.util.Random(4242)
    // inverse-CDF table for P(rank k) ∝ 1/k^1.05
    val weights = Array.tabulate(V)(k => 1.0 / math.pow(k + 1, 1.05))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def draw(): Int = {
      val u = rnd.nextDouble() * total
      val i = java.util.Arrays.binarySearch(cum, u)
      if (i >= 0) i else -i - 1
    }
    def doc(): String =
      Array.fill(DocLen)(s"w${draw()}").mkString(" ")
    val base = (0 until NDocs).map(i => (i.toLong, doc()))
    // planted exact dups (distinct-token-set level): ids 10000+i copy i
    val dups = (0 until NPlanted).map(i =>
      (10000L + i, base(i)._2))
    // planted boundary misses: one token swapped, lands BELOW τ=0.95
    val nears = (0 until NPlanted).map { i =>
      val toks = base(NPlanted + i)._2.split(" ")
      toks(7) = "zzz_unique_" + i
      (20000L + i, toks.mkString(" "))
    }
    (base ++ dups ++ nears).toDF("doc_id", "text")
  }

  test("PPJoin prefix filter: sub-quadratic AND complete on Zipf skew") {
    val t0 = System.nanoTime()
    val tok = Dedup.tokenSets(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = PrefixJoin.prefixCandidates(tok, PrefixJoin.TAU)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = cand.count()
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    info(f"zipf prefix: $nCand candidates of $allPairs pairs " +
      f"(${100.0 * nCand / allPairs}%.3f%%), ${(System.nanoTime()-t0)/1e9}%.1f s")
    // sub-quadratic: the head tokens (df ≈ N) must not generate pairs
    assert(nCand < allPairs / 20,
      s"prefix filter degenerated toward all-pairs under Zipf: $nCand")
    // complete: every true Jaccard ≥ τ pair is a candidate
    val truePairs = Dedup.jaccardPairs(tok, PrefixJoin.TAU)
      .filter(col("jaccard") >= PrefixJoin.TAU)
      .select("id1", "id2")
    val missed = truePairs.exceptAll(cand.select("id1", "id2")).count()
    assert(missed == 0, s"$missed true pairs missed by the prefix filter")
    // the planted exact dups are found; the one-swap boundary docs are
    // genuinely below τ (so their absence from results is correctness,
    // not a filter hole)
    val nTrue = truePairs.count()
    assert(nTrue >= NPlanted, s"only $nTrue true pairs (planted $NPlanted)")
    tok.unpersist(); cand.unpersist()
  }

  test("sparse cosine: df cap bounds the posting join under Zipf skew") {
    val t0 = System.nanoTime()
    val pairs = Similarity.sparseCosine(corpus, minCosine = 0.05, maxDf = 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val n = corpus.count()
    info(f"zipf sparse: $nPairs pairs over $n docs, " +
      f"${(System.nanoTime()-t0)/1e9}%.1f s")
    // the planted exact dups share every 4-shingle → cosine 1.0 rows
    // survive the df cap (their shingles are rare: each appears in the
    // base doc + its copy only)
    val dupHits = pairs
      .filter(col("id1") < NPlanted && col("id2") >= 10000L &&
        col("id2") === col("id1") + 10000L)
      .count()
    assert(dupHits == NPlanted, s"only $dupHits/$NPlanted planted dup " +
      "pairs survived the df cap")
    // output-sized, not corpus²: random Zipf docs share only HEAD grams,
    // which the df cap drops from the space entirely
    assert(nPairs < n * n / 20, s"posting join degenerated: $nPairs pairs")
    pairs.unpersist()
  }
}
