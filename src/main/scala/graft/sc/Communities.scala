package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Community detection over the kNN graph — synchronous frequency
  * label propagation (Raghavan et al. 2007), the deterministic stand-in
  * for the louvain/leiden step scanpy users run after `pp.neighbors`
  * (the reference repo stops at PCA; SURVEY §1.1 "graphs: none").
  * Each round every node adopts the most frequent label among its
  * neighbors, ties broken by the SMALLEST label. (The node set derives
  * from the edge list, so every node has a neighbor by construction —
  * no isolated-node branch exists.) Synchronous updates + total tie
  * order make the result a pure function of the graph, so DuckDB
  * replays the identical rounds.
  *
  * Scale shape: per round ONE keyed join (labels onto the symmetrized
  * edge list) + ONE (node, label) count agg + the per-node winner as a
  * plain `max(struct(count, -label))` — a partial-aggregable max, so
  * the winner pick gets map-side combine and NO extra shuffle+sort (a
  * window top-1 here costs one more exchange per round; the struct
  * ordering encodes exactly the (count DESC, label ASC) tie rule).
  * Lineage cut with an eager localCheckpoint every second round (the
  * PageRank pattern — two-join-deep plans, half the materializations).
  * Fixed round count keeps the oracle replayable; real deployments
  * iterate to a fixpoint with the same per-round plan. */
object Communities {
  type Q = (SparkSession, String) => DataFrame

  val Rounds = 5

  /** The operator proper over ANY canonical (a < b) undirected edge
    * list — public so specs drive closed-form graphs through the SAME
    * joins (CommunitiesSpec's two-clique bridge). */
  def labelPropagationOnEdges(canonicalEdges: DataFrame,
                              rounds: Int = Rounds,
                              checkpointDir: Option[String] = None): DataFrame = {
    val sym = canonicalEdges.select(col("a").as("v"), col("b").as("nbr"))
      .unionAll(canonicalEdges.select(col("b").as("v"), col("a").as("nbr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed: every node (taken straight off the edges, read once — no
    // persist needed) starts as its own label
    var labels = Lineage.cut(sym.select(col("v").as("id")).distinct()
      .withColumn("lbl", col("id")), checkpointDir)
    for (i <- 1 to rounds) {
      // every node appears as some v with ≥1 labeled neighbor, so this
      // winner frame IS the full next labeling — no join-back needed
      labels = sym
        .join(labels.select(col("id").as("nbr"), col("lbl").as("nlbl")),
          "nbr")
        .groupBy(col("v"), col("nlbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("nlbl")).as("neg"))).as("m"))
        .select(col("v").as("id"), (-col("m.neg")).as("lbl"))
      // lineage cut every second round — see pageRankOnEdges
      if (i % 2 == 0 || i == rounds) labels = Lineage.cut(labels, checkpointDir)
    }
    sym.unpersist()
    labels
  }

  def communities(s: SparkSession, d: String, k: Int = 10,
                  maxId: Long = 200): DataFrame = {
    val und = Neighbors.knnGraph(s, d, k, maxId)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"))
    labelPropagationOnEdges(und)
      .select(col("id"), col("lbl").as("community"))
      .orderBy("id")
  }

  val queries: Map[String, Q] = Map(
    "q_graph_communities" ->
      ((s: SparkSession, d: String) => communities(s, d)),
  )

  /** Oracle: same kNN substrate as the other graph queries, mutual
    * canonical edges symmetrized, then the rounds unrolled as chained
    * CTEs — each one the literal SQL mirror of the Spark round. */
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
         lbl0 AS MATERIALIZED (SELECT DISTINCT v AS id, v AS lbl FROM sym)"""
    val rounds = (1 to Rounds).map { i =>
      s""", lbl$i AS MATERIALIZED (
           SELECT v AS id, nlbl AS lbl FROM (
             SELECT s.v, q.lbl AS nlbl, count(1) AS c,
                    row_number() OVER (PARTITION BY s.v
                      ORDER BY count(1) DESC, q.lbl) AS rk
             FROM sym s JOIN lbl${i - 1} q ON q.id = s.nbr
             GROUP BY s.v, q.lbl)
           WHERE rk = 1)"""
    }.mkString
    Map("q_graph_communities" ->
      (base + rounds +
        s" SELECT id, lbl AS community FROM lbl$Rounds ORDER BY id"))
  }
}
