package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Interval-OVERLAP join: two interval sets match when the ranges
  * intersect (`a.s <= b.e AND b.s <= a.e`) — the interval×interval
  * sibling of Temporal.rangeJoin (point×interval) and
  * SpatialGrid (point×box). Promo windows derived from high-value
  * orders against shipment windows derived from high-quantity
  * lineitems.
  *
  * Scale shape: the naive plan is a nested-loop theta join. Instead
  * both sides EXPLODE to the day-grid cells their interval covers
  * (bounded: interval length / cell size, ≤3 cells for ≤15-day windows)
  * and the join is a plain equi-join on the cell — a keyed shuffle,
  * linear in rows. Two intervals overlap iff they co-occupy ≥1 cell
  * (their intersection is non-empty and lives inside both covers), with
  * the exact predicate filtering inside buckets. Dedup is structural,
  * not a post-pass: a matching pair is EMITTED ONLY IN ITS OWNER CELL —
  * the cell containing `greatest(a.s, b.s)`, the intersection's left
  * endpoint, which is unique per pair and covered by both sides — so
  * no distinct over the (potentially huge) multi-cell matches. Neither
  * side needs to fit in memory: unlike the broadcast in SpatialGrid,
  * both interval sets here shuffle by cell, which is the 100 TB-safe
  * form when both sides are fact-sized.
  *
  * All arithmetic is integer epoch-days, so the DuckDB oracle (the
  * naive theta join) compares bit-exactly. */
object IntervalJoin {
  type Q = (SparkSession, String) => DataFrame

  /** Day-grid cell width. Intervals here span ≤15 days ⇒ ≤3 cells. */
  val CellDays = 8

  def intervalJoin(s: SparkSession, d: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    // promo windows: [o_orderdate, +7d] on high-value orders
    val promos = Tables.orders(s, d)
      .filter(col("o_totalprice") > 498000)
      .select(col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"), epoch).as("a_s"))
      .withColumn("a_e", col("a_s") + lit(7))
    // shipment windows: [l_shipdate, +(qty%7+3)d] on near-full lines
    val ships = Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"), col("l_linenumber"),
        datediff(col("l_shipdate").cast("date"), epoch).as("b_s"),
        (col("l_quantity").cast("int") % 7 + 3).as("dur"))
      .withColumn("b_e", col("b_s") + col("dur"))
    // `div` (integral division) — `/` on Spark ints is DOUBLE division;
    // epoch days are positive so floor == trunc and covers stay exact
    val pa = promos.withColumn("cell",
      explode(sequence(expr(s"a_s div $CellDays"),
        expr(s"a_e div $CellDays"))))
    val pb = ships.withColumn("cell",
      explode(sequence(expr(s"b_s div $CellDays"),
        expr(s"b_e div $CellDays"))))
    pa.join(pb, Seq("cell"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      // owner cell of the pair = cell of the intersection's left end
      .filter(col("cell") ===
        expr(s"greatest(a_s, b_s) div $CellDays"))
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .orderBy("o_orderkey", "l_orderkey", "l_linenumber")
  }

  val queries: Map[String, Q] = Map("q_join_interval" -> intervalJoin _)

  /** Naive theta join over identical integer epoch-day intervals —
    * re-proves the cell-cover + owner-cell argument every gate run. */
  val oracle: Map[String, String] = Map(
    "q_join_interval" ->
      s"""WITH a AS (
           SELECT o_orderkey,
                  datediff('day', DATE '1970-01-01',
                           CAST(o_orderdate AS DATE)) AS a_s
           FROM orders WHERE o_totalprice > 498000),
         a2 AS (SELECT o_orderkey, a_s, a_s + 7 AS a_e FROM a),
         b AS (
           SELECT l_orderkey, l_linenumber,
                  datediff('day', DATE '1970-01-01',
                           CAST(l_shipdate AS DATE)) AS b_s,
                  CAST(l_quantity AS INT) % 7 + 3 AS dur
           FROM lineitem WHERE l_quantity >= 48),
         b2 AS (SELECT l_orderkey, l_linenumber, b_s, b_s + dur AS b_e
                FROM b)
         SELECT a2.o_orderkey, b2.l_orderkey, b2.l_linenumber
         FROM a2 JOIN b2 ON a2.a_s <= b2.b_e AND b2.b_s <= a2.a_e
         ORDER BY o_orderkey, l_orderkey, l_linenumber""")
}
