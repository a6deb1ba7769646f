package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Common-neighbors link prediction over the mutual-kNN graph: for
  * every NON-adjacent node pair at distance 2, count shared neighbors
  * — the classic "friend of a friend" edge-prediction score (and the
  * triangle-closing primitive recommendation graphs run at scale).
  * Emits (u, w, cn, deg_u, deg_w): all exact integers, so the DuckDB
  * oracle mirrors the joins bit-for-bit with no float anywhere.
  *
  * Scale shape: candidate pairs come from ONE self-join of the
  * symmetrized adjacency list keyed on the MIDDLE vertex — cost
  * Σ_v deg(v)², the wedge count, never |V|² (and deg is capped at k=10
  * by the kNN construction, so wedges ≤ 100·|V|) — then one keyed agg
  * per pair and an anti join against the edge list to keep only
  * not-yet-connected pairs. Degrees are a node-sized agg broadcast
  * back. The same plan runs unchanged on a 1000-executor edge list;
  * skew = max-degree², bounded by construction here and by the
  * standard salt-the-hub treatment on power-law graphs. */
object LinkPredict {
  type Q = (SparkSession, String) => DataFrame

  /** The operator proper over ANY canonical (a < b) undirected edge
    * list — public so specs can drive closed-form graphs. Keeps pairs
    * with at least `minCn` common neighbors. */
  def commonNeighbors(canonicalEdges: DataFrame, minCn: Long = 2): DataFrame = {
    val sym = canonicalEdges.select(col("a").as("v"), col("b").as("nbr"))
      .unionAll(canonicalEdges.select(col("b").as("v"), col("a").as("nbr")))
    val deg = sym.groupBy("v").agg(count(lit(1)).as("deg"))
    val wedges = sym.select(col("v"), col("nbr").as("u"))
      .join(sym.select(col("v"), col("nbr").as("w")), Seq("v"))
      .filter(col("u") < col("w"))
    val cn = wedges.groupBy("u", "w").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCn)
    cn
      .join(canonicalEdges.select(col("a").as("u"), col("b").as("w")),
        Seq("u", "w"), "left_anti")
      .join(deg.select(col("v").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("v").as("w"), col("deg").as("deg_w")), Seq("w"))
      .select("u", "w", "cn", "deg_u", "deg_w")
  }

  def linkPredict(s: SparkSession, d: String): DataFrame = {
    val und = Neighbors.knnGraph(s, d, 10, 200)
      .filter(col("mutual") && col("id1") < col("id2"))
      .select(col("id1").as("a"), col("id2").as("b"))
    commonNeighbors(und).orderBy("u", "w")
  }

  val queries: Map[String, Q] = Map("q_graph_link_predict" -> linkPredict _)

  val oracle: Map[String, String] = Map(
    "q_graph_link_predict" ->
      (Neighbors.oracleKnnSubstrate +
        """,
         und AS MATERIALIZED (
           SELECT r.id1 AS a, r.id2 AS b
           FROM ed r JOIN ed m ON r.id1 = m.id2 AND r.id2 = m.id1
           WHERE r.id1 < r.id2),
         sym AS MATERIALIZED (
           SELECT a AS v, b AS nbr FROM und
           UNION ALL SELECT b, a FROM und),
         deg AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS deg
                 FROM sym GROUP BY v),
         cn AS MATERIALIZED (
           SELECT s1.nbr AS u, s2.nbr AS w, CAST(count(*) AS BIGINT) AS cn
           FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.nbr < s2.nbr
           GROUP BY 1, 2 HAVING count(*) >= 2),
         nonadj AS MATERIALIZED (
           SELECT cn.* FROM cn
           LEFT JOIN und ON und.a = cn.u AND und.b = cn.w
           WHERE und.a IS NULL)
         SELECT n.u, n.w, n.cn, du.deg AS deg_u, dw.deg AS deg_w
         FROM nonadj n
         JOIN deg du ON du.v = n.u
         JOIN deg dw ON dw.v = n.w
         ORDER BY u, w"""))
}
