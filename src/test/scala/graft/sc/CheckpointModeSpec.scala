package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reliable-checkpoint mode for the iterative operators (Lineage.cut):
  * `checkpointDir=Some(dir)` must (a) produce bit-identical results to
  * the default localCheckpoint mode and (b) actually write durable
  * checkpoint data under the dir — the executor-loss-survival contract
  * a 1000-executor, 10-round job needs (VERDICT r8 Missing #2). */
class CheckpointModeSpec extends SparkSpec {
  import spark.implicits._

  private def ckDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ck").toString

  // a 12-node ring: every node has out/in degree 2 once symmetrized,
  // small enough that 10 PageRank rounds finish fast in both modes
  private def ring(n: Int) =
    (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong)).toDF("id1", "id2")

  private def canon(n: Int) =
    ring(n).select(least(col("id1"), col("id2")).as("a"),
      greatest(col("id1"), col("id2")).as("b"))

  test("PageRank: reliable checkpoint == localCheckpoint, files written") {
    val dir = ckDir()
    val local = PageRank.pageRankOnEdges(ring(12), iters = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val reliable = PageRank.pageRankOnEdges(ring(12), iters = 6,
        checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(reliable.toSeq == local.toSeq)
    // durable evidence: the reliable run wrote RDD checkpoint data
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    assert(walk(new java.io.File(dir)).nonEmpty, s"no checkpoint files in $dir")
  }

  test("BFS / SSSP / k-core / label propagation parity across modes") {
    val dir = Some(ckDir())
    val e = canon(12)
    assert(Bfs.bfsOnEdges(e, hops = 3, checkpointDir = dir)
      .collect().toSet == Bfs.bfsOnEdges(e, hops = 3).collect().toSet)
    val w = canon(12).withColumn("w", (col("a") + col("b")) % 5 + 1)
    assert(Sssp.ssspOnEdges(w, rounds = 4, checkpointDir = dir)
      .collect().toSet == Sssp.ssspOnEdges(w, rounds = 4).collect().toSet)
    assert(KCore.kCore(e, k = 2, rounds = 3, checkpointDir = dir)
      .collect().toSet == KCore.kCore(e, k = 2, rounds = 3).collect().toSet)
    assert(Communities.labelPropagationOnEdges(e, rounds = 4,
        checkpointDir = dir).collect().toSet ==
      Communities.labelPropagationOnEdges(e, rounds = 4).collect().toSet)
  }

  test("dedup connected components parity across modes (chain graph)") {
    val dir = Some(ckDir())
    // a 20-node path — the adversarial-diameter shape the star
    // contraction exists for
    val edges = (0 until 19).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id1", "id2")
    val nodes = (0 until 20).map(_.toLong).toDF("node")
    val local = graft.llm.Dedup.connectedComponents(edges, nodes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = graft.llm.Dedup
      .connectedComponents(edges, nodes, checkpointDir = dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
    assert(local.forall(_._2 == 0L)) // one component, min-labeled
  }
}
