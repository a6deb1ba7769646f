package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** Differential properties for the graph operators: the distributed
  * implementations vs straightforward in-memory Scala models on random
  * small graphs — fixed fixtures (ring, clique, bridge) pin known
  * shapes, these catch the unknown ones. */
object GraphProperties extends Properties("graft.graph") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Canonical undirected edges (a < b, distinct) on nodes 0..6. */
  private val undirectedGen: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 6L)))
      .map(_.collect { case (x, y) if x != y =>
        (math.min(x, y), math.max(x, y)) }.distinct)
      .suchThat(_.nonEmpty)

  /** Directed edges (a != b, distinct) on nodes 0..6. */
  private val directedGen: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 6L), Gen.choose(0L, 6L)))
      .map(_.filter { case (x, y) => x != y }.distinct)
      .suchThat(_.nonEmpty)

  private def round6(x: Double): Double =
    BigDecimal(x + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ---- frequency LPA vs in-memory synchronous model -------------------

  property("labelPropagationOnEdges == sync frequency-LPA model") =
    forAll(undirectedGen) { edges =>
      val got = graft.sc.Communities
        .labelPropagationOnEdges(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // model: symmetric adjacency, 5 rounds, winner = (count desc,
      // label asc)
      val nbrs = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lbl = nbrs.keys.map(v => v -> v).toMap
      for (_ <- 1 to graft.sc.Communities.Rounds)
        lbl = nbrs.map { case (v, ns) =>
          val counts = ns.groupBy(lbl).view.mapValues(_.size)
          v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      got == lbl
    }

  // ---- triangles vs brute-force model ---------------------------------

  property("trianglesOnEdges == brute-force neighbor-pair model") =
    forAll(undirectedGen) { edges =>
      val got = graft.sc.PageRank.trianglesOnEdges(edges.toDF("a", "b"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      val es = edges.toSet
      def connected(x: Long, y: Long) =
        es.contains((math.min(x, y), math.max(x, y)))
      val nbrs = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val want = nbrs.map { case (v, ns) =>
        val nTri = ns.combinations(2)
          .count { case Seq(u, w) => connected(u, w) }.toLong
        val deg = ns.size.toLong
        val cc = if (deg >= 2)
          round6(nTri.toDouble * 2.0 / (deg * (deg - 1))) else round6(0.0)
        v -> ((deg, nTri, cc))
      }
      got.keySet == want.keySet && got.forall { case (v, (d, t, c)) =>
        val (wd, wt, wc) = want(v)
        d == wd && t == wt && math.abs(c - wc) < 1.5e-6
      }
    }

  // ---- PageRank vs dense in-memory model ------------------------------

  property("pageRankOnEdges == dense double-iteration model (6 dp)") =
    forAll(directedGen) { edges =>
      val got = graft.sc.PageRank
        .pageRankOnEdges(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // model mirrors the operator: node set = BOTH endpoints, so pure
      // sinks are ranked (floor + received mass) and contribute nothing
      // onward — dangling mass drops, ranks need not sum to 1
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val n = nodes.size.toDouble
      val od = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
      var r = nodes.map(v => v -> (1.0 / n)).toMap
      for (_ <- 1 to graft.sc.PageRank.Iters) {
        val contrib = edges.groupBy(_._2).view.mapValues(
          _.map { case (src, _) => r(src) / od(src) }.sum).toMap
        r = nodes.map(v => v ->
          (0.15 / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
      }
      got.keySet == r.keySet && got.forall { case (v, pr) =>
        math.abs(pr - round6(r(v))) < 1.5e-6
      }
    }
}
