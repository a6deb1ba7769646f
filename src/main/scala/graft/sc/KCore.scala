package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition (bounded peel): iteratively delete nodes of
  * degree < k until none remain — the standard "dense enough to
  * matter" subgraph extractor (spam-farm detection, community cores,
  * graph sparsification before expensive analytics). `Rounds` bounds
  * the peel exactly like Bfs.Hops/Sssp.Rounds bound their fixpoints,
  * so the DuckDB oracle replays the identical unrolled rounds and the
  * result is well-defined on any graph: the surviving node set after R
  * peels (R rounds suffice for fixpoint on the fixture graph — pinned
  * by the spec asserting one extra round changes nothing).
  *
  * Scale shape: each round is ONE keyed degree agg over the surviving
  * edge list + ONE semi-join filter of the edges against surviving
  * nodes — both keyed shuffles, node/edge-sized frames, no driver
  * state; localCheckpoint cuts the per-round lineage (the shared
  * iterative-graph pattern). All-integer output. */
object KCore {
  type Q = (SparkSession, String) => DataFrame

  val K = 3
  val Rounds = 4

  /** The operator proper over ANY canonical (a < b) undirected edge
    * list. Returns (id, deg) of nodes surviving `rounds` peels at
    * threshold k, with deg = degree INSIDE the surviving subgraph. */
  def kCore(canonicalEdges: DataFrame, k: Int = K,
            rounds: Int = Rounds,
            checkpointDir: Option[String] = None): DataFrame = {
    var edges = Lineage.cut(canonicalEdges.select(col("a"), col("b")),
      checkpointDir)
    for (_ <- 1 to rounds) {
      val deg = edges.select(col("a").as("v"))
        .unionAll(edges.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select("v")
      edges = Lineage.cut(edges
        .join(keep.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b")), checkpointDir)
    }
    edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
      .select(col("v").as("id"), col("deg"))
  }

  def kcore(s: SparkSession, d: String): DataFrame = {
    val und = Neighbors.knnGraph(s, d, 10, 200)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"))
    kCore(und).orderBy("id")
  }

  val queries: Map[String, Q] = Map("q_graph_kcore" -> kcore _)

  /** Each peel round is the SQL mirror: degrees of the surviving edge
    * list, keep deg ≥ k, restrict edges to kept endpoints. The final
    * SELECT applies the same last-degree filter the Spark side does. */
  val oracle: Map[String, String] = {
    val base = Neighbors.oracleKnnSubstrate +
      """,
         g0 AS MATERIALIZED (
           SELECT r.id1 AS a, r.id2 AS b
           FROM ed r JOIN ed m ON r.id1 = m.id2 AND r.id2 = m.id1
           WHERE r.id1 < r.id2)"""
    val rounds = (1 to Rounds).map { i =>
      s""", d$i AS MATERIALIZED (
           SELECT v, count(*) AS deg FROM (
             SELECT a AS v FROM g${i - 1}
             UNION ALL SELECT b FROM g${i - 1}) GROUP BY v),
         k$i AS MATERIALIZED (SELECT v FROM d$i WHERE deg >= $K),
         g$i AS MATERIALIZED (
           SELECT e.a, e.b FROM g${i - 1} e
           JOIN k$i ka ON ka.v = e.a
           JOIN k$i kb ON kb.v = e.b)"""
    }.mkString
    Map("q_graph_kcore" ->
      (base + rounds +
        s""" SELECT v AS id, CAST(deg AS BIGINT) AS deg FROM (
             SELECT v, count(*) AS deg FROM (
               SELECT a AS v FROM g$Rounds
               UNION ALL SELECT b FROM g$Rounds) GROUP BY v)
           WHERE deg >= $K ORDER BY id"""))
  }
}
