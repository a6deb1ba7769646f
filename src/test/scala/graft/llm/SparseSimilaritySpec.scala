package graft.llm

import graft.SparkSpec

/** q_similarity_sparse: idf-weighted shingle cosine via posting-list
  * join. The DuckDB oracle proves numeric parity at the gate; these pin
  * semantics and the plan shape on constructed corpora. */
class SparseSimilaritySpec extends SparkSpec {
  import spark.implicits._

  // seed-deterministic ~60-token docs over a wide vocab (shingles rare)
  private def doc(seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until 60).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")
  }
  private def mutate(text: String, at: Set[Int]): String =
    text.split(" ").zipWithIndex
      .map { case (w, i) => if (at(i)) s"z$i" else w }.mkString(" ")

  test("a planted near-dup pair dominates; unrelated docs don't pair") {
    val base = doc(1)
    val docs = Seq(
      0L -> base,
      1L -> mutate(base, Set(30)),       // one word changed: near-dup
      2L -> doc(2), 3L -> doc(3), 4L -> doc(4))
      .toDF("doc_id", "text")
    val rows = Similarity.sparseCosine(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows.contains((0L, 1L)), s"planted pair missing: $rows")
    // one mutated word kills 4 of ~57 shingles. The idf weighting makes
    // this LOWER than the set-overlap 53/57: shared shingles carry
    // df=2 weight ln(5/2), the 4 divergent ones the rarer ln(5), so
    // cos = 53·ln(5/2)² / (53·ln(5/2)² + 4·ln(5)²) ≈ 0.81 — rarity
    // emphasis on the DIFFERENCE is the tf-idf point
    assert(rows((0L, 1L)) > 0.75 && rows((0L, 1L)) < 1.0, rows((0L, 1L)))
    // independent random docs share no 4-shingle at this vocab size
    assert(rows.keySet == Set((0L, 1L)), rows.keySet)
  }

  test("identical docs score exactly 1.0") {
    val docs = Seq(0L -> doc(9), 1L -> doc(9), 2L -> doc(10))
      .toDF("doc_id", "text")
    val rows = Similarity.sparseCosine(docs).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
    assert(rows.head.getDouble(2) == 1.0)
  }

  test("df cap removes boilerplate shingles from the space") {
    // a boilerplate prefix shared by docs 0-2 (df=3, idf=ln(6/3)>0)
    // pairs them when in the space, and must stop pairing them once the
    // cap excludes it. (A prefix on EVERY doc pairs nothing either way:
    // idf = ln(N/N) = 0 — the weighting already nullifies truly
    // ubiquitous text; the cap exists for the mid-frequency band where
    // idf > 0 but df² join fan-out is the scale hazard.)
    val boiler = (0 until 10).map(i => s"b$i").mkString(" ")
    val docs = (0L until 6L).map(i =>
      i -> (if (i < 3) s"$boiler ${doc(20 + i.toInt)}" else doc(20 + i.toInt)))
      .toDF("doc_id", "text")
    // low threshold: 7 shared boiler shingles against ~60 unique-body
    // ones put the pair cosine near 0.02 — the threshold isn't under test
    val inSpace = Similarity
      .sparseCosine(docs, minCosine = 0.005, maxDf = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(inSpace.toSet == Set((0L, 1L), (0L, 2L), (1L, 2L)), inSpace.toSeq)
    val capped = Similarity
      .sparseCosine(docs, minCosine = 0.005, maxDf = 2).collect()
    assert(capped.isEmpty,
      s"df>cap shingles must leave the space: ${capped.toSeq}")
  }

  test("plan: posting join only — no cartesian, no broadcast nested loop") {
    val plan = planOf(Similarity.sparseCosinePairs(spark, sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      plan.take(1500))
  }
}
