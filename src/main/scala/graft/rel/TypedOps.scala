package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Typed Dataset surface: `KeyValueGroupedDataset.flatMapGroups` as the
  * escape hatch for per-group imperative logic that window/agg functions
  * can't express (multi-pass scans over a group, early exits, stateful
  * in-group accumulators). The demo computes per-customer order history
  * stats where the gap computation needs the group sorted in memory.
  *
  * Scale posture: one hash shuffle on the group key; per-group memory is
  * O(orders-per-customer) — bounded for customer-keyed data (tens of
  * rows). For unbounded groups this shape is WRONG: use window functions
  * (one sorted pass, spillable) — `q_window_lag` is that formulation.
  * flatMapGroups also breaks whole-stage codegen at its boundary, so it
  * costs an encoder round-trip either side; it earns its place only when
  * the in-group logic genuinely can't be a window/aggregate.
  */
object TypedOps {
  import Relational.Q

  /** One order, day pre-computed RELATIONALLY (`datediff` under the
    * session's UTC timezone) before the typed boundary — the group
    * function never touches timestamp/timezone conversion, so its day
    * arithmetic cannot drift from the oracle's `date_diff('day', …)`. */
  case class OrderRow(o_custkey: Long, o_orderkey: Long,
                      day: Int, o_totalprice: Double)

  /** Per-customer history stats: order count, the longest gap in days
    * between consecutive orders (NULL with fewer than 2 orders), total
    * spend accumulated in date order. */
  case class CustStats(o_custkey: Long, n_orders: Int,
                       max_gap_days: Option[Int], total_spend: Double)

  def custStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).as("day"),
        col("o_totalprice"))
      .as[OrderRow]
      .groupByKey(_.o_custkey)
      .flatMapGroups { (cust: Long, rows: Iterator[OrderRow]) =>
        val sorted = rows.toArray.sortBy(r => (r.day, r.o_orderkey))
        var maxGap = -1L
        var spend = 0.0
        var i = 0
        while (i < sorted.length) {
          if (i > 0) {
            val gap = (sorted(i).day - sorted(i - 1).day).toLong
            if (gap > maxGap) maxGap = gap
          }
          spend += sorted(i).o_totalprice
          i += 1
        }
        Iterator.single(CustStats(cust, sorted.length,
          if (maxGap < 0) None else Some(maxGap.toInt), spend))
      }
      .toDF()
      .withColumn("total_spend", round(col("total_spend") + lit(1e-9), 2))
      .orderBy("o_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_grouped_custom" -> custStats _,
  )

  val oracle: Map[String, String] = Map(
    "q_grouped_custom" ->
      """WITH g AS (
           SELECT o_custkey, o_totalprice,
                  date_diff('day',
                    lag(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS gap
           FROM orders)
         SELECT o_custkey, CAST(count(1) AS INT) AS n_orders,
                CAST(max(gap) AS INT) AS max_gap_days,
                round(sum(o_totalprice) + 1e-9, 2) AS total_spend
         FROM g GROUP BY o_custkey ORDER BY o_custkey""",
  )
}
