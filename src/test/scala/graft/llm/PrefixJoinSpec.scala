package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-filtering completeness and pruning on planted corpora. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("prefix candidates find every pair the all-pairs ground truth " +
    "finds (completeness at tau=0.95)") {
    // 20-token docs differing in 0/1 tokens straddle the threshold:
    // identical sets J=1, one-substitution J=19/21≈0.905 (below 0.95)
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val oneOff = ((1 to 19).map(i => s"w$i") :+ "zz").mkString(" ")
    val d = docs(1L -> base, 2L -> base, 3L -> oneOff, 4L -> oneOff)
    val tok = Dedup.tokenSets(d)
    val viaPrefix = Dedup.jaccardPairs(tok, 0.95,
        cand = Some(PrefixJoin.prefixCandidates(tok, 0.95)))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val allPairs = Dedup.jaccardPairs(tok, 0.95)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(viaPrefix === allPairs)
    assert(allPairs === Set((1L, 2L), (3L, 4L)))
  }

  test("prefix + length filters actually prune the candidate space") {
    // docs share common tokens but only two are near-identical — the
    // plain token join would candidate every pair, the prefix join must
    // candidate far fewer
    val common = (1 to 15).map(i => s"c$i").mkString(" ")
    val d = docs(
      1L -> s"$common a1 a2 a3 a4 a5",
      2L -> s"$common a1 a2 a3 a4 a5",
      3L -> s"$common b1 b2 b3 b4 b5",
      4L -> s"$common d1 d2 d3 d4 d5",
      5L -> s"$common e1 e2 e3 e4 e5")
    val tok = Dedup.tokenSets(d)
    val cand = PrefixJoin.prefixCandidates(tok, 0.95).count()
    assert(cand < 10) // all-pairs would be 10; pruning must drop some
    val pairs = Dedup.jaccardPairs(tok, 0.95,
      cand = Some(PrefixJoin.prefixCandidates(tok, 0.95)))
    assert(pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L)))
  }

  test("length filter kills pairs whose sizes alone forbid tau") {
    val d = docs(1L -> (1 to 40).map(i => s"w$i").mkString(" "),
                 2L -> (1 to 20).map(i => s"w$i").mkString(" "))
    // |B|=20 < 0.95*40: no candidate regardless of shared tokens
    assert(PrefixJoin.prefixCandidates(Dedup.tokenSets(d), 0.95)
      .count() === 0L)
  }
}
