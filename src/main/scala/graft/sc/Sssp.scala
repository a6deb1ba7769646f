package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Single-source shortest paths over a WEIGHTED undirected graph —
  * the distance sibling of [[Bfs]] (hop counts) for graphs whose edges
  * carry costs (similarity graphs, road-like networks, citation
  * distance). Bellman–Ford style rounds: a bounded number of keyed
  * relax steps, each `dist ∪ (dist ⋈ edges → dist + w)` reduced by
  * `min` per node. `Rounds` caps the relaxation depth the same way
  * `Bfs.Hops` caps the frontier, so the DuckDB oracle replays the
  * identical unrolled recurrence — after R rounds the frame holds the
  * exact min-cost over all ≤R-edge paths, a well-defined quantity on
  * ANY graph (no convergence assumption for the gate to depend on).
  *
  * Scale shape: per round ONE keyed join (node-sized dist frame onto
  * the adjacency list) + ONE keyed min-agg — never all-pairs, no
  * driver-side state. localCheckpoint per round cuts the growing
  * lineage (the PageRank/Bfs pattern). Integer weights keep every
  * distance an exact BIGINT, so the oracle compare is bit-stable.
  * The derived weight `(a + b) % 7 + 1` is an arbitrary-but-
  * deterministic positive cost pinned identically in both engines. */
object Sssp {
  type Q = (SparkSession, String) => DataFrame

  val Rounds = 5

  /** The operator proper over ANY canonical (a < b, w) weighted edge
    * list — public so specs can drive closed-form graphs through the
    * same joins. Returns (id, dist) = exact min cost over all paths of
    * ≤ `rounds` edges from the smallest node id. */
  def ssspOnEdges(weightedEdges: DataFrame, rounds: Int = Rounds,
                  checkpointDir: Option[String] = None): DataFrame = {
    val sym = weightedEdges
      .select(col("a").as("v"), col("b").as("nbr"), col("w"))
      .unionAll(weightedEdges
        .select(col("b").as("v"), col("a").as("nbr"), col("w")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var dist = Lineage.cut(sym.agg(min(col("v")).as("id"))
      .withColumn("dist", lit(0L)), checkpointDir)
    for (_ <- 1 to rounds) {
      val relaxed = dist
        .join(sym.select(col("v").as("id"), col("nbr"), col("w")), "id")
        .select(col("nbr").as("id"), (col("dist") + col("w")).as("dist"))
      dist = Lineage.cut(dist.unionAll(relaxed)
        .groupBy("id").agg(min(col("dist")).as("dist")), checkpointDir)
    }
    sym.unpersist()
    dist
  }

  def sssp(s: SparkSession, d: String): DataFrame = {
    val und = Neighbors.knnGraph(s, d, 10, 200)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"),
        ((col("id1") + col("id2")) % 7 + 1).as("w"))
    ssspOnEdges(und).orderBy("id")
  }

  val queries: Map[String, Q] = Map("q_graph_sssp" -> sssp _)

  /** Same kNN substrate as the other graph oracles; each round is the
    * SQL mirror of one relax step (union + min per node). */
  val oracle: Map[String, String] = {
    val base = Neighbors.oracleKnnSubstrate +
      """,
         und AS MATERIALIZED (
           SELECT r.id1 AS a, r.id2 AS b,
                  CAST((r.id1 + r.id2) % 7 + 1 AS BIGINT) AS w
           FROM ed r JOIN ed m ON r.id1 = m.id2 AND r.id2 = m.id1
           WHERE r.id1 < r.id2),
         sym AS MATERIALIZED (
           SELECT a AS v, b AS nbr, w FROM und
           UNION ALL SELECT b, a, w FROM und),
         d0 AS MATERIALIZED (SELECT min(v) AS id, CAST(0 AS BIGINT) AS dist FROM sym)"""
    val rounds = (1 to Rounds).map { r =>
      s""", d$r AS MATERIALIZED (
           SELECT id, min(dist) AS dist FROM (
             SELECT id, dist FROM d${r - 1}
             UNION ALL
             SELECT s.nbr, p.dist + s.w FROM sym s
             JOIN d${r - 1} p ON p.id = s.v)
           GROUP BY id)"""
    }.mkString
    Map("q_graph_sssp" ->
      (base + rounds + s" SELECT id, dist FROM d$Rounds ORDER BY id"))
  }
}
