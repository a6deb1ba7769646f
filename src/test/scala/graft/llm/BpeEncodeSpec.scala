package graft.llm

import graft.SparkSpec

class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("golden encode: rank order wins over position") {
    // "b c" outranks "a b": greedy must merge by RANK, not left-to-right
    val rank = Map("b c" -> 0, "a b" -> 1)
    val out = TextOps.bpeEncodeOne(Array("a", "b", "c"), rank)
    assert(out.toSeq == Seq("a", "bc"))
  }

  test("one sweep merges left-to-right without overlap") {
    val rank = Map("a a" -> 0)
    assert(TextOps.bpeEncodeOne(Array("a", "a", "a"), rank).toSeq ==
      Seq("aa", "a"))
    // [a a a a] -> one sweep -> [aa, aa]; "aa aa" is not in the table,
    // so the merged symbols do NOT re-pair here
    assert(TextOps.bpeEncodeOne(Array("a", "a", "a", "a"), rank).toSeq ==
      Seq("aa", "aa"))
  }

  test("merged symbols re-enter the pair search on later iterations") {
    val rank = Map("a a" -> 0, "aa aa" -> 1)
    assert(TextOps.bpeEncodeOne(Array("a", "a", "a", "a"), rank).toSeq ==
      Seq("aaaa"))
  }

  test("empty merge table is the identity; short inputs pass through") {
    assert(TextOps.bpeEncodeOne(Array("x", "y"), Map.empty).toSeq ==
      Seq("x", "y"))
    assert(TextOps.bpeEncodeOne(Array.empty[String], Map("a b" -> 0)).isEmpty)
    assert(TextOps.bpeEncodeOne(Array("solo"), Map("a b" -> 0)).toSeq ==
      Seq("solo"))
  }

  test("merge table is deterministic and bounded") {
    val docs = Seq((1L, "x y x y z"), (2L, "x y q")).toDF("doc_id", "text")
    val m1 = TextOps.bpeMerges(docs, 3)
    val m2 = TextOps.bpeMerges(docs, 3)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.length <= 3)
    assert(m1.head == "x y") // count 3, clear winner
  }

  test("corpus encode: every doc compresses or stays equal, never grows") {
    val out = TextOps.textBpeEncode(spark, sf)
      .as[(Long, Int, Int, Double)].collect()
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    assert(out.forall { case (_, pre, bpe, _) => bpe <= pre && bpe >= 1 })
    assert(out.forall { case (_, _, _, c) => c >= 1.0 })
    // the trained merges must actually fire on the corpus they were
    // trained on — zero compression means the fit/encode pair drifted
    val merged = out.count { case (_, pre, bpe, _) => bpe < pre }
    assert(merged > out.length / 2, s"only $merged/${out.length} compressed")
  }
}
