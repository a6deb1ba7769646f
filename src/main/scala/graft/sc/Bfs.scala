package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Breadth-first hop distance from a seed node over the mutual-kNN
  * graph — the "how far is everything from this cell/document" primitive
  * (graph sampling radius, contamination blast-radius, neighborhood
  * expansion for ANN re-ranking). Deterministic: the seed is the
  * smallest node id, rounds are a fixed hop cap so the DuckDB oracle
  * replays the identical frontier expansions.
  *
  * Scale shape: classic frontier BFS — per hop ONE keyed join (frontier
  * onto the symmetrized adjacency list) + distinct + an anti join
  * against the settled set; all keyed shuffles, never all-pairs, and the
  * frontier/settled frames are node-sized, not edge-sized.
  * localCheckpoint after every hop cuts the two-join-deep lineage (the
  * PageRank/Communities pattern). A driver loop of H hops is the right
  * Spark realization of an inherently iterative fixpoint: each iteration
  * is a declarative plan Catalyst optimizes independently, and no data
  * ever lands on the driver. */
object Bfs {
  type Q = (SparkSession, String) => DataFrame

  val Hops = 4

  /** The operator proper over ANY canonical (a < b) undirected edge
    * list — public so specs can drive closed-form graphs (path, star,
    * disconnected pair) through the same joins. Returns (id, d) for
    * every node within `hops` of the smallest node id. */
  def bfsOnEdges(canonicalEdges: DataFrame, hops: Int = Hops,
                 checkpointDir: Option[String] = None): DataFrame = {
    val sym = canonicalEdges.select(col("a").as("v"), col("b").as("nbr"))
      .unionAll(canonicalEdges.select(col("b").as("v"), col("a").as("nbr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var settled = Lineage.cut(sym.agg(min(col("v")).as("id"))
      .withColumn("d", lit(0)), checkpointDir)
    var frontier = settled.select("id")
    for (h <- 1 to hops) {
      frontier = Lineage.cut(frontier
        .join(sym.select(col("v").as("id"), col("nbr")), "id")
        .select(col("nbr").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti"), checkpointDir)
      settled = Lineage.cut(settled
        .unionAll(frontier.withColumn("d", lit(h))), checkpointDir)
    }
    sym.unpersist()
    settled
  }

  def bfs(s: SparkSession, d: String): DataFrame = {
    val und = Neighbors.knnGraph(s, d, 10, 200)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"))
    bfsOnEdges(und).orderBy("id")
  }

  val queries: Map[String, Q] = Map("q_graph_bfs" -> bfs _)

  /** Same kNN substrate as the other graph oracles; the hop rounds are
    * unrolled CTEs, each the SQL mirror of one frontier expansion. */
  val oracle: Map[String, String] = {
    val base = Neighbors.oracleKnnSubstrate +
      """,
         und AS MATERIALIZED (
           SELECT r.id1 AS a, r.id2 AS b
           FROM ed r JOIN ed m ON r.id1 = m.id2 AND r.id2 = m.id1
           WHERE r.id1 < r.id2),
         sym AS MATERIALIZED (
           SELECT a AS v, b AS nbr FROM und
           UNION ALL SELECT b, a FROM und),
         d0 AS MATERIALIZED (SELECT min(v) AS id, CAST(0 AS INT) AS d FROM sym)"""
    val rounds = (1 to Hops).map { h =>
      s""", f$h AS MATERIALIZED (
           SELECT DISTINCT s.nbr AS id
           FROM sym s JOIN d${h - 1} p ON p.id = s.v
           WHERE s.nbr NOT IN (SELECT id FROM d${h - 1})),
         d$h AS MATERIALIZED (
           SELECT id, d FROM d${h - 1}
           UNION ALL SELECT id, CAST($h AS INT) FROM f$h)"""
    }.mkString
    Map("q_graph_bfs" ->
      (base + rounds + s" SELECT id, d FROM d$Hops ORDER BY id"))
  }
}
