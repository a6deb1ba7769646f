package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.Tables

/** The remaining 12 TPC-H shapes (q2/7/8/9/11/13/15/16/17/20/21/22),
  * completing all 22 alongside Relational's q1/3/4/5/6/10/12/14/18/19.
  * All run through `spark.sql`: the value of this block is what CATALYST
  * does with the text — subquery decorrelation (correlated scalar aggs,
  * EXISTS/NOT EXISTS pairs, nested IN), outer-join aggregates, and
  * multi-dim join trees — not hand-written physical strategies.
  *
  * Schema adaptations (the testdata has no partsupp / phone / comment /
  * commitdate columns; each swap preserves the query's PLAN shape):
  *  - partsupp ⇒ the observed supply relation `SELECT DISTINCT l_partkey,
  *    l_suppkey FROM lineitem`; ps_supplycost ⇒ min unit sell price
  *    `min(l_extendedprice / l_quantity)` per pair (q2, q16, q20);
  *  - lateness (receipt > commit) ⇒ shipped >90 days after o_orderdate
  *    (q21, same convention as Relational's q4/q12);
  *  - phone country code ⇒ `substr(c_name, 18, 1)` — the terminal digit of
  *    the zero-padded customer number; same substring-extraction shape,
  *    deterministic across engines (q22);
  *  - "no orders at all" ⇒ "no orders since 1999" — the synthetic order
  *    stream covers every customer, so the pristine predicate is empty at
  *    every SF (q22);
  *  - nation/part constants mapped to this testdata's domains (NATION_n,
  *    color-prefixed p_name, 6-value p_type).
  *
  * 100 TB posture: every query below is joins + aggregates on declared
  * keys — Catalyst broadcasts the dims (nation/region/supplier at ≤100
  * rows per SF here; at 100 TB supplier graduates to a shuffle join on
  * suppkey automatically), shuffles fact tables on their join keys, and
  * every correlated subquery decorrelates to a join + aggregate over the
  * SAME key domain as the outer query (asserted in TpchDeepSpec — a
  * surviving correlated-subquery loop would be O(n²) driver murder at
  * scale). No collects, no UDFs, everything whole-stage codegen.
  *
  * NOTE (r12 measurement): materializing the twice-referenced CTEs
  * (q2's supply, q11's supply_value, q15's revenue) as persisted temp
  * views was tried and measured 1.2–1.4× SLOWER at sf0.1 — the static
  * formatted plan shows the CTE inlined twice, but AQE's runtime stage
  * reuse already dedupes the identical shuffle stages, so the persist
  * only added cache-write cost and broke pipelining. Left as single
  * SQL texts deliberately.
  */
object TpchDeep {
  type Q = (SparkSession, String) => DataFrame

  private def views(s: SparkSession, d: String): Unit = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.part(s, d).createOrReplaceTempView("part")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
  }

  /** Q2 (min-cost supplier): correlated scalar MIN subquery that repeats
    * the outer's join tree. Catalyst decorrelates to a per-part min over
    * the region-filtered supply relation joined back on partkey — the
    * same two-level "aggregate then re-join" plan a human would write,
    * derived mechanically. The supply CTE appears in both branches; at
    * 100 TB it is the pre-aggregated (part,supp) pair table, ~|part|×
    * suppliers-per-part rows, far smaller than lineitem. */
  val q2Sql: String = """
    WITH supply AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY 1, 2)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(unit_cost + 1e-6, 2) AS unit_cost
    FROM part
    JOIN supply   ON p_partkey = partkey
    JOIN supplier ON suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
      AND unit_cost = (SELECT min(s2.unit_cost)
                       FROM supply s2
                       JOIN supplier sp2 ON s2.suppkey = sp2.s_suppkey
                       JOIN nation n2 ON sp2.s_nationkey = n2.n_nationkey
                       JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                       WHERE s2.partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100"""

  /** Q7 (volume shipping): the symmetric nation-pair OR across a 5-table
    * join. The disjunction references BOTH nation dims, so it cannot push
    * to either scan alone — it applies after the (broadcast) nation joins,
    * while the date range pushes to the lineitem scan. Group key is
    * (nation, nation, year): tiny domain, partial agg collapses the fact
    * stream before the final shuffle. */
  val q7Sql: String = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume) + 1e-6, 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier
          JOIN lineitem ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
              OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
            AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year"""

  /** Q8 (market share): one nation's share of a region's volume, per
    * year — the conditional-sum-over-total ratio computed in a SINGLE
    * aggregation pass over a 7-table join (two roles for nation). The
    * CASE keeps it one agg, not two subqueries re-running the join. */
  val q8Sql: String = """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume) + 1e-6, 4) AS mkt_share
    FROM (SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region   ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00') all_nations
    GROUP BY o_year
    ORDER BY o_year"""

  /** Q9 (product-type profit): profit per supplier-nation × year over a
    * LIKE-filtered part set. ps_supplycost ⇒ 10% of retail × quantity.
    * The p_name LIKE 'red%' predicate pushes as a StartsWith scan filter
    * on part (the build side), so the lineitem probe meets a pre-shrunk
    * broadcast/build — the selective-dim pattern q_join_bloom hardens. */
  val q9Sql: String = """
    SELECT nation, o_year, round(sum(amount) + 1e-6, 2) AS sum_profit
    FROM (SELECT n_name AS nation,
                 CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON o_orderkey = l_orderkey
          JOIN nation   ON s_nationkey = n_nationkey
          WHERE p_name LIKE 'red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year"""

  /** Q11 (important stock): filter-against-global-scalar — the same
    * grouped aggregation feeds both the rows and the threshold, so the
    * CTE runs twice (or once under exchange reuse); the scalar side
    * collapses to one number broadcast into the filter. The spec's
    * absolute fraction (0.0001/SF) is swapped for 1.25× the mean part
    * value: scale-FREE, so the query returns rows at every SF (a fixed
    * fraction of the total goes empty as the part domain grows — measured
    * 0 rows at sf0.001). NATION_3 is the one nation with suppliers at
    * every SF (sf0.001 samples only 10 suppliers across 25 nations). */
  val q11Sql: String = """
    WITH supply_value AS (
      SELECT l_partkey AS partkey,
             sum(l_extendedprice * (1 - l_discount)) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY 1)
    SELECT partkey, round(value + 1e-6, 2) AS value
    FROM supply_value
    WHERE value > (SELECT 1.25 * avg(value) FROM supply_value)
    ORDER BY value DESC, partkey"""

  /** Q13 (customer distribution): the outer-join-with-ON-predicate
    * signature — the priority filter lives in the LEFT JOIN's ON clause,
    * NOT the WHERE (where it would turn the join inner and drop the
    * zero-order customers q13 exists to count). Two-level agg: count per
    * customer, then histogram of counts. */
  val q13Sql: String = """
    SELECT c_count, CAST(count(1) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS INT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  /** Q15 (top supplier): aggregate-view + scalar-MAX self-reference. The
    * revenue CTE is computed for the join AND for the max; the argmax is
    * found by value equality, not a LIMIT 1 (spec semantics: ties all
    * surface). Within one engine the max is drawn from the identical
    * computed set, so float equality is safe. */
  val q15Sql: String = """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1)
    SELECT s_suppkey, s_name, round(total_revenue + 1e-6, 2) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  /** Q16 (supplier-count per part attribute): DISTINCT pair relation ⋈
    * part, NOT IN with a non-nullable build (plans as a plain anti join —
    * contrast q_join_anti_null's null-aware variant), then count(DISTINCT)
    * per 3-attribute group. The distinct-pair pre-agg is the load-bearing
    * piece at scale: it collapses lineitem to the supply relation BEFORE
    * the part join and the wide-key shuffle. */
  val q16Sql: String = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  /** Q17 (small-quantity revenue): correlated scalar AVG against the SAME
    * table being scanned — the canonical "per-group threshold" shape.
    * Catalyst decorrelates to avg-per-partkey ⋈ lineitem on partkey; the
    * brand/type filter pushes to the part scan and shrinks the join's
    * probe BEFORE the threshold comparison. */
  val q17Sql: String = """
    SELECT round(sum(l_extendedprice) / 7.0 + 1e-6, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'MEDIUM'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)"""

  /** Q20 (excess suppliers): nested IN whose inner query carries its OWN
    * correlated scalar subquery (share-of-part threshold) — two levels of
    * decorrelation. Inner grain is (suppkey, partkey) supply totals; the
    * correlated sum decorrelates to per-part totals joined on partkey;
    * the IN becomes a semi join on suppkey. Threshold 0.25 = supplier
    * carries >25% of the part's year volume. */
  val q20Sql: String = """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
        SELECT suppkey
        FROM (SELECT l_suppkey AS suppkey, l_partkey AS partkey,
                     sum(l_quantity) AS qty
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_name LIKE 'blue%'
                AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
              GROUP BY 1, 2) ps
        WHERE ps.qty > (SELECT 0.25 * sum(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = ps.partkey
                          AND l2.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                          AND l2.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'))
    ORDER BY s_name"""

  /** Q21 (suppliers who kept orders waiting): the EXISTS + NOT EXISTS
    * pair over the same fact table — "another supplier contributed" and
    * "no other supplier was late", the second correlated on BOTH l1's
    * orderkey (equi) and the outer o_orderdate (non-equi). Decorrelates
    * to a semi + anti join on orderkey; the status/nation filters shrink
    * the outer before either probe. */
  val q21Sql: String = """
    SELECT s_name, CAST(count(1) AS BIGINT) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders    ON o_orderkey = l1.l_orderkey
    JOIN nation    ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_11'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100"""

  /** Q22 (global sales opportunity): substring-derived group key, global
    * scalar AVG threshold, and a NOT EXISTS anti join — three decorrelation
    * /pushdown features in one two-table query. The avg subquery collapses
    * to one broadcast number; the anti join runs on custkey. */
  val q22Sql: String = """
    SELECT cntrycode, CAST(count(1) AS BIGINT) AS numcust,
           round(sum(c_acctbal) + 1e-6, 2) AS totacctbal
    FROM (SELECT substr(c_name, 18, 1) AS cntrycode, c_acctbal
          FROM customer
          WHERE substr(c_name, 18, 1) IN ('1', '2', '3', '4', '5', '6', '7')
            AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                             WHERE c_acctbal > 0.00
                               AND substr(c_name, 18, 1)
                                   IN ('1', '2', '3', '4', '5', '6', '7'))
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >=
                                  TIMESTAMP '1999-01-01 00:00:00')) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode"""

  private val sqls: Map[String, String] = Map(
    "q_sql_tpch_q2"  -> q2Sql,  "q_sql_tpch_q7"  -> q7Sql,
    "q_sql_tpch_q8"  -> q8Sql,  "q_sql_tpch_q9"  -> q9Sql,
    "q_sql_tpch_q11" -> q11Sql, "q_sql_tpch_q13" -> q13Sql,
    "q_sql_tpch_q15" -> q15Sql, "q_sql_tpch_q16" -> q16Sql,
    "q_sql_tpch_q17" -> q17Sql, "q_sql_tpch_q20" -> q20Sql,
    "q_sql_tpch_q21" -> q21Sql, "q_sql_tpch_q22" -> q22Sql)

  val queries: Map[String, Q] = sqls.map { case (name, sql) =>
    name -> ((s: SparkSession, d: String) => { views(s, d); s.sql(sql) })
  }

  /** Same text runs in DuckDB: the SQL above sticks to the common dialect
    * (EXTRACT, substr, INTERVAL n DAY, TIMESTAMP literals) with explicit
    * CASTs where the engines' natural types differ (count → BIGINT,
    * EXTRACT(YEAR) → INT). */
  val oracle: Map[String, String] = sqls
}
