package graft.llm

import graft.SparkSpec

/** Scale property of the large-star/small-star connected components
  * (Kiveris et al., SoCC'14): round count grows with log(diameter), not
  * diameter. The adversarial fixture is a path graph — the worst case for
  * plain min-label propagation (rounds = chain length), and exactly the
  * shape templated-boilerplate near-dup graphs take at 100 TB. */
class CcContractionSpec extends SparkSpec {
  import spark.implicits._

  test("64-node chain converges in O(log diameter) rounds (≤7, not ~64)") {
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("id1", "id2")
    val nodes = (0L to 63L).toDF("node")
    val (labels, rounds) = Dedup.connectedComponentsRounds(chain, nodes)
    val reps = labels.collect().map(_.getLong(1)).distinct.toSeq
    assert(reps == Seq(0L), s"one component labeled 0 expected, got $reps")
    assert(rounds <= 7,
      s"rounds=$rounds — contraction must halve chain distances per round " +
        "(min-label propagation would need ~63)")
  }

  test("differential vs driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    // ground truth: union-find that always attaches the larger root under
    // the smaller, so each tree root IS the component minimum
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x; while (parent(r) != r) r = parent(r); r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val (labels, _) = Dedup.connectedComponentsRounds(
      edges.toDF("id1", "id2"), (0L until n.toLong).toDF("node"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("empty edge set: every node is its own singleton") {
    val edges = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val nodes = (0L to 4L).toDF("node")
    val (labels, rounds) = Dedup.connectedComponentsRounds(edges, nodes)
    assert(labels.collect().forall(r => r.getLong(0) == r.getLong(1)))
    assert(rounds <= 1)
  }

  test("self-loops and duplicate/reversed edges are absorbed") {
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L))
      .toDF("id1", "id2")
    val (labels, _) = Dedup.connectedComponentsRounds(
      edges, (1L to 3L).toDF("node"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L), got)
  }
}
