package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** The two join shapes the §2B matrix did not yet carry as first-class
  * query ids: FULL OUTER (both-sides-preserved reconciliation) and
  * LATERAL (correlated per-row subquery join, Spark 3.2+ SQL surface).
  *
  * Full outer is the referential-integrity audit shape: customers with
  * no orders AND order keys with no customer survive, null-padded on the
  * missing side. At scale it plans as one shuffle on the join key (sort-
  * merge; neither side prunable — both must be preserved, so a broadcast
  * strategy is structurally unavailable for full outer and Spark rightly
  * refuses it), then a streamed merge. The aggregate side is pre-reduced
  * BEFORE the join (orders → one row per custkey), so the full-outer
  * input is the key domain, not the fact table.
  *
  * Lateral is the "for each row, run this correlated subquery" surface.
  * Catalyst DECORRELATES it (DecorrelateInnerQuery): the per-nation
  * top-3-by-balance lateral becomes one window (rank over partition) +
  * one join — i.e. the optimizer rewrites the row-at-a-time spec into
  * the same set-oriented plan a hand-author would write, which is the
  * whole point of declaring it laterally. No per-row subquery execution
  * exists at runtime, so the shape scales exactly like q_topk_grouped.
  */
object MoreJoins {
  type Q = (SparkSession, String) => DataFrame

  /** Customer ⟗ per-customer order rollup. Both unmatched sides kept:
    * `side` says which half of the audit a row fell into. */
  def joinFull(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")) + lit(1e-6), 2).as("spend"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("spend"),
        when(col("c_custkey").isNull, lit("order_only"))
          .when(col("o_custkey").isNull, lit("customer_only"))
          .otherwise(lit("both")).as("side"))
      .orderBy("custkey")
  }

  /** Per-nation top-3 customers by balance, written as a correlated
    * LATERAL subquery; Catalyst decorrelates to window + join. */
  def joinLateral(s: SparkSession, d: String): DataFrame = {
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql("""
      SELECT n.n_name, t.c_name, t.c_acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_name, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name
        LIMIT 3) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
  }

  val queries: Map[String, Q] = Map(
    "q_join_full" -> joinFull _,
    "q_join_lateral" -> joinLateral _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_full" ->
      """WITH o AS (
           SELECT o_custkey, CAST(count(1) AS BIGINT) AS n_orders,
                  round(sum(o_totalprice) + 1e-6, 2) AS spend
           FROM orders GROUP BY o_custkey)
         SELECT coalesce(c_custkey, o_custkey) AS custkey,
                c_mktsegment,
                coalesce(n_orders, 0) AS n_orders, spend,
                CASE WHEN c_custkey IS NULL THEN 'order_only'
                     WHEN o_custkey IS NULL THEN 'customer_only'
                     ELSE 'both' END AS side
         FROM customer FULL JOIN o ON c_custkey = o_custkey
         ORDER BY custkey""",
    "q_join_lateral" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
         FROM nation n
         JOIN LATERAL (
           SELECT c_name, c_acctbal
           FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_name
           LIMIT 3) t ON true
         ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""",
  )
}
