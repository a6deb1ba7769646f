package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    KCore.kCore(edges.toDF("a", "b"), k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a pendant: 2-core drops the pendant, keeps the cycle") {
    val got = run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), 2, 3)
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("peel CASCADES: removing a leaf re-exposes its neighbor") {
    // path 1-2-3-4-5 at k=2: leaves peel, then their neighbors, until
    // nothing is left — needs multiple rounds, not one degree filter
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(path, 2, 4).isEmpty)
    // one round only removes the outermost leaves — 3 survives round 1
    assert(run(path, 2, 1) == Map(3L -> 2L))
  }

  test("fixture graph: Rounds reaches the fixpoint (extra round = no-op)") {
    val und = Neighbors.knnGraph(spark, sf, 10, 200)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"))
    val atR = KCore.kCore(und, KCore.K, KCore.Rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val atR1 = KCore.kCore(und, KCore.K, KCore.Rounds + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(atR == atR1 && atR.nonEmpty)
  }

  test("every surviving node has deg >= K inside the core") {
    KCore.kcore(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) >= KCore.K.toLong)
    }
  }
}
