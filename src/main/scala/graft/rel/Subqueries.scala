package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** SQL-surface operators whose value is the PLAN Catalyst produces:
  * runtime bloom-filter pushdown, null-aware NOT IN anti join, and
  * subquery decorrelation (EXISTS, scalar). All four run through
  * `spark.sql` — these shapes arrive as SQL in practice, and the point is
  * that the optimizer, not the author, picks the distributed strategy.
  */
object Subqueries {
  type Q = (SparkSession, String) => DataFrame

  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
  }

  /** Big-probe join with a selective build side, with Spark's runtime
    * bloom-filter injection enabled: the optimizer plants a
    * might_contain(bloom) predicate on the lineitem scan, built from the
    * filtered orders side, so most probe rows die at the scan instead of
    * crossing the shuffle. THE datacenter-scale join optimization for
    * selective dims too big to broadcast (SubqueriesSpec asserts the
    * filter landed in the plan). Runs on a child session so the
    * lowered injection thresholds (sized for test-scale inputs; the
    * defaults assume 10 GB scans) never leak into other queries' plans. */
  def joinBloom(s0: SparkSession, d: String): DataFrame = {
    val s = s0.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "0")
    // keep the build side out of broadcast range so the join plans as a
    // shuffle join — InjectRuntimeFilter only fires for probably-shuffle
    // joins, and the too-big-to-broadcast dim is exactly the case the
    // bloom filter exists for (at test scale everything broadcasts)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    views(s, d)
    s.sql("""
      SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_items,
             round(sum(l_extendedprice) + 1e-6, 2) AS gross
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 490000
      GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** NOT IN (subquery): Catalyst must plan a NULL-AWARE anti join — if
    * the subquery ever yields a NULL, SQL's three-valued logic makes
    * NOT IN empty, so the join condition carries the null checks a plain
    * anti join lacks. The subquery here is null-free (keys are not
    * nullable at the source), so the result is non-degenerate and equals
    * DuckDB's. */
  def joinAntiNull(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql("""
      SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_cust
      FROM customer
      WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** Correlated EXISTS — decorrelated by Catalyst into a left-semi join
    * (no per-row subquery execution; one keyed shuffle). */
  def subqueryExists(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql("""
      SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_cust
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 450000)
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  }

  /** Uncorrelated scalar subquery — executed once, result folded into the
    * predicate as a literal-like broadcast (no join at all). */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    views(s, d)
    s.sql("""
      SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n_above
      FROM orders
      WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }

  val queries: Map[String, Q] = Map(
    "q_join_bloom"      -> joinBloom _,
    "q_join_anti_null"  -> joinAntiNull _,
    "q_subquery_exists" -> subqueryExists _,
    "q_subquery_scalar" -> subqueryScalar _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_bloom" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n_items,
                round(sum(l_extendedprice) + 1e-6, 2) AS gross
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 490000
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_join_anti_null" ->
      """SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_cust
         FROM customer
         WHERE c_custkey NOT IN (
           SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_subquery_exists" ->
      """SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_cust
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_subquery_scalar" ->
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n_above
         FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
  )
}
