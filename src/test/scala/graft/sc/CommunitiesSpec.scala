package graft.sc

import graft.SparkSpec

class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  test("two cliques joined by a bridge settle into two communities") {
    // K3 {0,1,2} + K3 {3,4,5} + bridge (2,3): frequency-LPA with
    // min-label ties converges to community 0 on the left and 2 on the
    // right (hand-traced: r1 [1,0,0,2,3,3] → r2 [0,0,0,3,2,2] →
    // r3 [0,0,0,2,2,2], stable)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L),
      (3L, 4L), (3L, 5L), (4L, 5L), (2L, 3L)).toDF("a", "b")
    val got = Communities.labelPropagationOnEdges(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      3L -> 2L, 4L -> 2L, 5L -> 2L), got.toString)
  }

  test("label propagation is deterministic across runs") {
    val a = Communities.communities(spark, sf).collect().toSeq
    val b = Communities.communities(spark, sf).collect().toSeq
    assert(a == b)
    // every node labeled exactly once, and every community label is
    // itself a node id (a sign error in the struct-max trick would
    // emit values outside the id set)
    val ids = a.map(_.getLong(0)).toSet
    assert(a.nonEmpty && ids.size == a.length)
    assert(a.forall(r => ids.contains(r.getLong(1))), "label outside id set")
  }
}
