package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
import graft.tables.Tables

/** Relational operator surface: scans, joins, aggregations (SURVEY.md §2B,
  * categories scan/join/agg).
  *
  * Design rules (100 TB posture — SURVEY.md §4.2):
  *  - declarative DataFrame plans only: filters/projections reach the parquet
  *    scan (PushedFilters / ReadSchema), Catalyst + AQE pick join strategies;
  *  - small dimension tables (region: 5 rows, nation: 25 rows) are broadcast
  *    explicitly so the big side never shuffles for the join;
  *  - large⋈large joins (orders⋈customer) shuffle on the join key and are
  *    AQE-coalesced / skew-split at runtime — no driver-side state anywhere;
  *  - every oracle'd query ends in a total ORDER BY and rounds floats
  *    (FIXTURES.md §4 determinism rules). Aggregate sums of BIGINT are cast
  *    on the DuckDB side (DuckDB sums to HUGEINT, Spark to BIGINT).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- scan --

  /** Filter + 4-column projection on lineitem; both the predicate and the
    * column set must be visible in the parquet scan node (pushdown check in
    * RelationalSpec). */
  def scanProjectFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  // ---------------------------------------------------------------- join --

  /** Tiny dim ⋈ tiny dim, explicit broadcast: BroadcastHashJoinExec. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** orders ⋈ customer (shuffle on custkey) ⋈ nation (broadcast): revenue by
    * nation. The orders⋈customer side is the scale path — keyed shuffle,
    * partial aggregation after the join. */
  def joinShuffle(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")

  /** customer LEFT JOIN orders — unmatched customers keep NULL aggregates;
    * count(o_orderkey) ignores them, sum is coalesced to 0. */
  def joinLeft(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(round(sum(col("o_totalprice")), 2), lit(0.0)).as("total"))
      .orderBy("c_custkey")

  /** Customers with ≥1 order — left-semi: no row multiplication, the probe
    * side short-circuits on first match. */
  def joinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Customers with no orders since 2000 — left-anti (NOT EXISTS). The date
    * filter keeps the result non-empty on this data (every customer has SOME
    * order) and is pushed below the anti-join into the orders scan. */
  def joinAnti(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(
        Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Same-region nation pairs, n1.name < n2.name. Deliberately planned as an
    * equi-join on regionkey with the `<` as a post-join predicate — at scale
    * this hash-partitions instead of degenerating to a nested-loop cross
    * product (the naive theta-only formulation). */
  def joinTheta(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(
      col("n_name").as("name1"), col("n_regionkey").as("rk1"))
    val n2 = Tables.nation(s, d).select(
      col("n_name").as("name2"), col("n_regionkey").as("rk2"))
    n1.join(n2, col("rk1") === col("rk2") && col("name1") < col("name2"))
      .select(col("name1"), col("name2"), col("rk1").as("regionkey"))
      .orderBy("name1", "name2")
  }

  // ----------------------------------------------------------------- agg --

  /** TPC-H Q1 shape: scan + filter + hash-agg (partial/final) + sort. The
    * flagship relational query (SparkEntry.entry). */
  def aggHash(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** count(DISTINCT) — Catalyst rewrites to Expand + two-phase agg, so the
    * distinct set is never collected to one node. */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** HLL++ distinct users per event type — the 100 TB path for distinct
    * counts (fixed-size sketch per group, no expand). Approximate by design:
    * declared oracle:no. */
  def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
      .orderBy("event_type")

  /** Reaggregatable HLL sketches (DataSketches binary form) — the
    * pattern that makes distinct-count work at 100 TB: build ONE sketch
    * per shard (here per order-year), persist/ship the fixed-size
    * binaries, and hll_union_agg them downstream for the global
    * estimate. No raw re-scan for rollups across shards, and the sketch
    * column is itself storable (contrast approx_count_distinct, whose
    * partials die inside one query). Deterministic (register maxima are
    * insertion-order-free) but engine-specific bits: oracle:no;
    * SketchMergeSpec gates merge==direct and the error envelope. */
  def aggSketchMerge(s: SparkSession, d: String): DataFrame = {
    val shards = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"),
        count(lit(1)).as("n_rows"))
    shards.agg(
      count(lit(1)).cast("long").as("n_shards"),
      sum(col("n_rows")).as("n_orders"),
      hll_sketch_estimate(hll_union_agg(col("sk"))).cast("long")
        .as("approx_custs"))
  }

  /** Approximate percentiles (sketch-based, fixed accuracy) — the 100 TB
    * companion to q_agg_stats' exact percentile: bounded-memory sketch per
    * group, mergeable partials. Approximate by design: oracle:no. */
  def aggApproxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      // ONE sketch per group serving all three percentiles (the array
      // form), then split to scalar columns — three separate
      // approx_percentile calls each build their own QuantileSummaries
      // over the same 600 k values (measured 3× the aggregate cost).
      // Scalar output columns, not the array: the driver's rows-only
      // checker cannot sort array cells (round-1 lesson).
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
        .as("pcts"))
      .select(col("l_returnflag"),
        element_at(col("pcts"), 1).as("p50"),
        element_at(col("pcts"), 2).as("p90"),
        element_at(col("pcts"), 3).as("p99"))
      .orderBy("l_returnflag")

  /** Pivot: revenue by nation × order-priority, priorities as columns.
    * Explicit pivot values keep the schema static (no extra distinct scan)
    * — required for a deterministic oracle and the right call at scale. */
  def aggPivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      // +1e-6 round-boundary epsilon (money-magnitude sum of products),
      // same convention as Skew/Events/Partitioned — cross-engine
      // half-even rounding can otherwise flake a pivot cell
      .agg(round(sum(col("o_totalprice")) + lit(1e-6), 2))
      .withColumnRenamed("1-URGENT", "urgent")
      .withColumnRenamed("2-HIGH", "high")
      .withColumnRenamed("3-MEDIUM", "medium")
      .orderBy("n_name")

  /** Unpivot (melt): the pivoted nation×priority matrix back to long form
    * — the inverse reshape. Oracle-differential value: DuckDB derives the
    * same long form directly from the base tables, so the pivot→unpivot
    * roundtrip is proven lossless, not just self-consistent. Unpivot is a
    * per-row Expand (narrow, no shuffle beyond the pivot's own). */
  def aggUnpivot(s: SparkSession, d: String): DataFrame =
    aggPivot(s, d)
      .unpivot(
        ids = Array(col("n_name")),
        values = Array(col("urgent"), col("high"), col("medium")),
        variableColumnName = "priority",
        valueColumnName = "revenue")
      // EXCLUDE NULLS (the SQL UNPIVOT default): a nation with no orders
      // of some priority has a null pivot cell, which the oracle's direct
      // long-form derivation never emits
      .filter(col("revenue").isNotNull)
      .orderBy("n_name", "priority")

  /** Fixed-width histogram of order values: the bucket key is computed
    * per-row (floor division, top bucket clamped), so the aggregation is
    * an ordinary 10-group hash agg — the two-pass "compute bounds, then
    * bucket" shape is only needed for data-dependent bounds. */
  def aggHistogram(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(least(lit(9), floor(col("o_totalprice") / 50000))
        .cast("int").as("bucket"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("o_totalprice")) + lit(1e-6), 2).as("avg_price"))
      .orderBy("bucket")

  /** Equi-DEPTH binning of order totals (deciles) — the feature-binning
    * complement to aggHistogram's fixed-width buckets. Two stages, both
    * scale-clean: (1) the nine interior decile bounds via one exact
    * interpolated-percentile aggregate (partial-aggregable; the
    * approx_percentile twin is the unbounded-cardinality swap), rounded
    * so both engines bucket on identical doubles; (2) bucket assignment
    * is a BROADCAST of the 9-value bounds array folded per row — the
    * table is never sorted or shuffled for ranking, which is what kills
    * the naive ntile()-over-everything form at scale. Per-bucket counts
    * land within ±1/n of equal depth (ties at bounds go low, by `>`). */
  def aggEqDepth(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d).select(col("o_totalprice").as("v"))
    val fracs = (1 to 9).map(_ / 10.0)
    val bounds = t.agg(
      expr(s"percentile(v, array(${fracs.mkString(",")}))").as("qs"))
      .select(transform(col("qs"),
        q => round(q + lit(1e-6), 2)).as("qs"))
    t.crossJoin(broadcast(bounds))
      .select(col("v"),
        (aggregate(col("qs"), lit(0),
          (a, q) => a + when(col("v") > q, 1).otherwise(0)) + 1)
          .cast("int").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(min(col("v")) + lit(1e-6), 2).as("min_v"),
        round(max(col("v")) + lit(1e-6), 2).as("max_v"))
      .orderBy("bucket")
  }

  /** Exact mode with a deterministic tie-break: the modal ship month per
    * returnflag. SQL's mode() is non-deterministic on ties in both
    * engines, so this computes it as two partial-aggregable hash aggs:
    * count per (group, value), then max(struct(count, value)) — struct
    * ordering breaks ties toward the larger value, identically
    * everywhere. At scale both aggs map-side combine; there is no
    * per-group sort and no window, which is what kills the naive
    * row_number()-over-counts form when a group holds millions of
    * distinct values. */
  def modeBy(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key.as("k"), value.as("v"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("k"))
      .agg(max(struct(col("cnt"), col("v"))).as("m"))
      .select(col("k"), col("m.v").as("mode_v"), col("m.cnt").as("mode_n"))

  def aggMode(s: SparkSession, d: String): DataFrame =
    modeBy(Tables.lineitem(s, d),
      col("l_returnflag"), month(col("l_shipdate")))
      .select(col("k").as("l_returnflag"),
        col("mode_v").as("mode_month"), col("mode_n"))
      .orderBy("l_returnflag")

  /** Revenue by ROLLUP(region, nation): ExpandExec duplicates each row per
    * grouping set; partial agg keeps the shuffle bounded by group count. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** Counts by CUBE(returnflag, linestatus). */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** GROUPING SETS ((mktsegment), (nation)) over customer⋈nation. */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("gs_customer")
    Tables.nation(s, d).createOrReplaceTempView("gs_nation")
    s.sql("""
      SELECT c_mktsegment, n_name,
             COUNT(1) AS n_cust,
             ROUND(SUM(c_acctbal), 2) AS acctbal
      FROM gs_customer JOIN gs_nation ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
      ORDER BY c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST
    """)
  }

  // ------------------------------------------------------------- wiring --

  /** TPC-H Q1 shape (pricing summary report): the canonical full-scan
    * aggregation — one pass over the fact table, eight aggregates over
    * six groups. The textbook partial-aggregation query: map-side
    * combine collapses each input partition to ≤6 rows before the
    * shuffle, so the exchange moves O(partitions × 6) rows regardless of
    * table size — at 100 TB this is scan-bound, never shuffle-bound,
    * and the shipdate predicate pushes to the parquet scan. */
  def sqlTpchQ1(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    // money sums through the DECIMAL accumulation convention
    // (NumFmt.moneySumSql — identical text on both engines): at sf10 the
    // 60M-row double sums drifted past the cent boundary by accumulation
    // order (438947722471.68 vs .67), the exact class moneySum closes.
    // avg_* stay double: their 4-dp display needs only ~1e-9 relative
    // precision on values ~1e4, nine orders above the drift.
    s.sql(s"""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
             ${NumFmt.moneySumSql("l_extendedprice", 2, 2)}
               AS sum_base_price,
             ${NumFmt.moneySumSql("l_extendedprice * (1 - l_discount)", 4, 2)}
               AS sum_disc_price,
             ${NumFmt.moneySumSql(
                "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6, 2)}
               AS sum_charge,
             round(avg(l_quantity) + 1e-6, 4) AS avg_qty,
             round(avg(l_extendedprice) + 1e-6, 4) AS avg_price,
             round(avg(l_discount) + 1e-6, 4) AS avg_disc,
             CAST(count(1) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")
  }

  /** TPC-H Q10 shape (returned-item revenue): fact-side join of the
    * returnflag-filtered lineitem to a one-quarter window of orders,
    * re-keyed to the customer dimension, top-20 by revenue. Catalyst
    * pushes both filters to the scans, broadcasts nation, shuffles
    * orders⋈lineitem on orderkey then re-partitions on custkey for the
    * customer join — two keyed exchanges, both over pre-filtered data.
    * The LIMIT rides the rounded-revenue total order with a custkey
    * tiebreak, planned as TakeOrderedAndProject (per-partition top-20,
    * no global sort). */
  def sqlTpchQ10(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql("""
      SELECT c_custkey, c_name,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS revenue,
             c_acctbal, n_name
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20""")
  }

  /** The pure-SQL entry point: the engine's tables registered as temp
    * views, the query authored as ANSI SQL through `spark.sql` — the
    * route a BI tool or SQL-only user takes. TPC-H Q3 shape (3-table
    * join, selective date/segment predicates, grouped revenue). Catalyst
    * plans it identically to the DataFrame form: customer broadcast,
    * shipdate/orderdate predicates pushed to the scans. The HAVING
    * threshold keeps the output set deterministic (no float-ordered
    * LIMIT). */
  def sqlTpchQ3(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    // +1e-6 round-boundary epsilon on the revenue sum (the 32ef5a9
    // convention, sized up for ~1e5-magnitude money sums whose cross-engine
    // float-order difference can reach ~1e-8): sums of PRODUCTS land on
    // .005 boundaries where Spark and DuckDB round apart — observed at
    // sf0.1 (287075.905 → .91 vs .9)
    s.sql("""
      SELECT o_orderkey,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY o_orderkey
      HAVING round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) > 100000
      ORDER BY o_orderkey""")
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-table join with the
    * non-hierarchical c_nationkey = s_nationkey condition — the classic
    * join-ORDER stress query. Catalyst broadcasts nation/region (tiny
    * dims), shuffles the three fact-side joins on their keys, and pushes
    * the region/date predicates to the scans; the c/s nation equality is
    * applied as a join condition, not a post-filter, so the supplier join
    * output never inflates. */
  def sqlTpchQ5(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.supplier(s, d).createOrReplaceTempView("supplier")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    Tables.region(s, d).createOrReplaceTempView("region")
    s.sql("""
      SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY n_name""")
  }

  /** TPC-H Q18 shape (large-volume customers): the aggregate-then-
    * semi-join stress query whose inner GROUP BY runs over the LARGEST
    * key domain in the schema (every orderkey). Catalyst plans the
    * HAVING subquery as partial+final hash agg feeding a semi join on
    * orderkey — at 100 TB the partial agg is the load-bearing piece
    * (per-mapper combine collapses the lineitem fan-in before the
    * shuffle), and the outer 3-table join reuses the orderkey
    * partitioning. LIMIT rides a total order (totalprice DESC with
    * orderkey tiebreak), so the top-100 is engine-independent. */
  def sqlTpchQ18(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             round(sum(l_quantity) + 1e-6, 2) AS sum_qty
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100""")
  }

  /** TPC-H Q6 shape (forecasting revenue change): the pure
    * scan→filter→scalar-aggregate query — no join, no group key. The
    * entire WHERE clause pushes into the parquet scan (range predicates
    * on three columns), so at 100 TB this is the query where row-group
    * min/max skipping does nearly all the work; what survives is a
    * single partial+final agg over one arithmetic expression, the
    * cheapest distributed plan Spark has. */
  def sqlTpchQ6(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT round(sum(l_extendedprice * l_discount) + 1e-6, 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""")
  }

  /** TPC-H Q4 shape (order-priority checking): EXISTS-decorrelation
    * stress. ADAPTED to this schema: the testdata lineitem carries no
    * l_commitdate/l_receiptdate, so "late" is l_shipdate more than 60
    * days after o_orderdate — same correlated-EXISTS-with-extra-
    * condition shape (equi on the key, non-equi on the outer column).
    * Catalyst decorrelates it to a left-semi join on orderkey with the
    * lateness predicate as a join condition; the quarter filter pushes
    * to the orders scan so the semi join probes a pre-filtered build. */
  def sqlTpchQ4(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")
  }

  /** TPC-H Q12 shape (shipping-mode/priority matrix): join + dual
    * conditional aggregate. ADAPTED: no l_shipmode column, so the group
    * key is the lateness class (shipped >90 days after order date) and
    * the CASE counters split by order priority, preserving the
    * shape — one orderkey-keyed shuffle join, then a two-row hash agg
    * whose CASE arithmetic all rides whole-stage codegen. */
  def sqlTpchQ12(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 'late' ELSE 'ontime' END AS ship_class,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1
      ORDER BY ship_class""")
  }

  /** TPC-H Q14 shape (promo revenue): join + conditional-sum ratio in
    * one aggregate (p_type = 'PROMO' in this schema's flat type domain).
    * The one-month shipdate window pushes to the lineitem scan; part is
    * the join's build side. The two sums share one aggregation pass —
    * the CASE keeps it a single join + single scalar agg, not two
    * subqueries over the same join. */
  def sqlTpchQ14(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql("""
      SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END)
                   / sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""")
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    * OR-of-ANDs planner stress — three brand/size/quantity bands OR'd
    * together across a join. Catalyst extracts the common join key
    * (l_partkey = p_partkey) so this still plans as one equi-join (NOT
    * a nested loop), with each side's disjunction pushed to its scan:
    * part prunes on the brand/size union, lineitem on the quantity
    * union, and the band pairing applies post-join. The quantity bands
    * are adapted to this schema's 1–50 uniform domain. */
  def sqlTpchQ19(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql("""
      SELECT round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
               AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 30)""")
  }

  /** Recursive CTE (new SQL surface in Spark 4.x): walk the implicit
    * digit-tree over customer keys (parent = key div 10 — every key's
    * parent exists because keys are contiguous from 1) computing each
    * node's ROOT and DEPTH, then roll up per (root, depth). The
    * hierarchy-expansion shape (org charts, BOM explosions, category
    * trees) that previously forced driver-side loops or an external
    * engine. Each recursion level plans as one keyed join — the same
    * per-round shape as the PageRank/CC loops, but expressed in pure
    * SQL with the engine managing the fixpoint; depth here is
    * log10(|customer|), so levels stay few even at 100 TB. */
  def sqlRecursive(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql("""
      WITH RECURSIVE walk(id, root, depth) AS (
        SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, w.root, w.depth + 1
        FROM customer c JOIN walk w ON w.id = c.c_custkey div 10
        WHERE c.c_custkey >= 10)
      SELECT root, depth, CAST(count(1) AS BIGINT) AS n_nodes,
             min(id) AS min_id, max(id) AS max_id
      FROM walk GROUP BY root, depth ORDER BY root, depth""")
  }

  /** SQL pipe syntax (`|>`, new Spark 4.x surface): the same
    * scan→filter→aggregate→sort plan written as a linear pipeline —
    * each stage consumes the previous one's output, the reading order
    * IS the execution order (no inside-out subquery nesting), and
    * Catalyst plans it identically to the classic form (the oracle is
    * the classic form, so the gate proves plan equivalence by value). */
  def sqlPipe(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      FROM lineitem
      |> WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      |> AGGREGATE round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                     AS revenue,
                   CAST(count(1) AS BIGINT) AS n_rows
         GROUP BY l_returnflag
      |> ORDER BY l_returnflag""")
  }

  /** GROUP BY ALL / ORDER BY ALL (the Spark-4 ⋂ DuckDB convenience
    * dialect): every non-aggregate select item becomes a grouping key,
    * the full select list the sort key — killing the stale-GROUP-BY-list
    * bug class in hand-maintained reports. Catalyst expands both at
    * analysis time to the explicit form; the oracle IS the explicit
    * form, so the gate proves the expansion by value. */
  def sqlGroupByAll(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql("""
      SELECT l_returnflag, l_linestatus,
             CAST(count(1) AS BIGINT) AS n_rows,
             round(sum(l_quantity) + 1e-6, 2) AS sum_qty
      FROM lineitem
      GROUP BY ALL
      ORDER BY ALL""")
  }

  /** Parameterized SQL (named parameter markers, new Spark 4.x API):
    * `spark.sql(text, args)` binds `:name` markers server-side as
    * literals in the PLAN, not by string interpolation — the injection-
    * safe, plan-cache-friendly way applications ship constants into
    * queries. The oracle is the same text with constants inlined, so
    * the gate proves binding semantics (types, timestamp handling)
    * rather than trusting them. */
  def sqlParams(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue,
                CAST(count(1) AS BIGINT) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= :lo AND l_shipdate < :hi
           AND l_quantity <= :maxqty
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
      Map("lo" -> java.sql.Timestamp.valueOf("1997-01-01 00:00:00"),
        "hi" -> java.sql.Timestamp.valueOf("1998-01-01 00:00:00"),
        "maxqty" -> Int.box(40)))
  }

  val queries: Map[String, Q] = Map(
    "q_sql_params"    -> sqlParams _,
    "q_sql_pipe"      -> sqlPipe _,
    "q_sql_group_by_all" -> sqlGroupByAll _,
    "q_sql_tpch_q1"   -> sqlTpchQ1 _,
    "q_sql_tpch_q3"   -> sqlTpchQ3 _,
    "q_sql_tpch_q4"   -> sqlTpchQ4 _,
    "q_sql_tpch_q5"   -> sqlTpchQ5 _,
    "q_sql_tpch_q6"   -> sqlTpchQ6 _,
    "q_sql_tpch_q10"  -> sqlTpchQ10 _,
    "q_sql_tpch_q12"  -> sqlTpchQ12 _,
    "q_sql_tpch_q14"  -> sqlTpchQ14 _,
    "q_sql_tpch_q18"  -> sqlTpchQ18 _,
    "q_sql_tpch_q19"  -> sqlTpchQ19 _,
    "q_sql_recursive" -> sqlRecursive _,
    "q_scan_project_filter" -> scanProjectFilter _,
    "q_join_broadcast"      -> joinBroadcast _,
    "q_join_shuffle"        -> joinShuffle _,
    "q_join_left"           -> joinLeft _,
    "q_join_semi"           -> joinSemi _,
    "q_join_anti"           -> joinAnti _,
    "q_join_theta"          -> joinTheta _,
    "q_agg_hash"            -> aggHash _,
    "q_agg_distinct"        -> aggDistinct _,
    "q_agg_approx_distinct" -> aggApproxDistinct _,
    "q_agg_sketch_merge"    -> aggSketchMerge _,
    "q_agg_approx_percentile" -> aggApproxPercentile _,
    "q_agg_pivot"           -> aggPivot _,
    "q_agg_unpivot"         -> aggUnpivot _,
    "q_agg_histogram"       -> aggHistogram _,
    "q_agg_eqdepth"         -> aggEqDepth _,
    "q_agg_mode"            -> aggMode _,
    "q_agg_rollup"          -> aggRollup _,
    "q_agg_cube"            -> aggCube _,
    "q_agg_grouping_sets"   -> aggGroupingSets _,
  )

  /** DuckDB 1.0.0 oracle SQL — column names/aliases must match the Spark
    * side exactly (driver sorts columns by name before hashing). */
  val oracle: Map[String, String] = Map(
    // The oracle takes the window form (count desc, value desc, row 1);
    // the hash gate proves it equal to the struct-max derivation.
    "q_agg_mode" ->
      """WITH c AS (SELECT l_returnflag,
                           CAST(EXTRACT(month FROM l_shipdate) AS INT)
                             AS ship_month,
                           CAST(count(1) AS BIGINT) AS cnt
                    FROM lineitem GROUP BY 1, 2)
         SELECT l_returnflag, ship_month AS mode_month, cnt AS mode_n
         FROM c
         QUALIFY row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY cnt DESC, ship_month DESC) = 1
         ORDER BY l_returnflag""",
    // integer division dialect: Spark `div` == DuckDB `//`
    "q_sql_recursive" ->
      """WITH RECURSIVE walk(id, root, depth) AS (
           SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 10
           UNION ALL
           SELECT c.c_custkey, w.root, w.depth + 1
           FROM customer c JOIN walk w ON w.id = c.c_custkey // 10
           WHERE c.c_custkey >= 10)
         SELECT root, CAST(depth AS INT) AS depth,
                CAST(count(1) AS BIGINT) AS n_nodes,
                min(id) AS min_id, max(id) AS max_id
         FROM walk GROUP BY root, depth ORDER BY root, depth""",
    "q_sql_params" ->
      """SELECT l_returnflag,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue,
                CAST(count(1) AS BIGINT) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
           AND l_quantity <= 40
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    // the EXPLICIT expansion GROUP BY ALL / ORDER BY ALL must produce
    "q_sql_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(count(1) AS BIGINT) AS n_rows,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty
         FROM lineitem
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus, n_rows, sum_qty""",
    "q_sql_pipe" ->
      """SELECT l_returnflag,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue,
                CAST(count(1) AS BIGINT) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q_sql_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
                ${NumFmt.moneySumSql("l_extendedprice", 2, 2)}
                  AS sum_base_price,
                ${NumFmt.moneySumSql("l_extendedprice * (1 - l_discount)", 4, 2)}
                  AS sum_disc_price,
                ${NumFmt.moneySumSql(
                   "l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6, 2)}
                  AS sum_charge,
                round(avg(l_quantity) + 1e-6, 4) AS avg_qty,
                round(avg(l_extendedprice) + 1e-6, 4) AS avg_price,
                round(avg(l_discount) + 1e-6, 4) AS avg_disc,
                CAST(count(1) AS BIGINT) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue,
                c_acctbal, n_name
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN nation   ON c_nationkey = n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_returnflag = 'R'
         GROUP BY c_custkey, c_name, c_acctbal, n_name
         ORDER BY revenue DESC, c_custkey
         LIMIT 20""",
    "q_sql_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
         GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
         ORDER BY o_totalprice DESC, o_orderkey
         LIMIT 100""",
    "q_sql_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount) + 1e-6, 2) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_sql_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
           AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_sql_tpch_q12" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                     THEN 'late' ELSE 'ontime' END AS ship_class,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT)
                  AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT)
                  AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1
         ORDER BY ship_class""",
    "q_sql_tpch_q14" ->
      """SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0 END)
                      / sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""",
    "q_sql_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    "q_sql_tpch_q5" ->
      """SELECT n_name,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2)
                  AS revenue
         FROM customer
         JOIN orders   ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON s_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name
         ORDER BY n_name""",
    "q_sql_tpch_q3" ->
      """SELECT o_orderkey,
                round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         GROUP BY o_orderkey
         HAVING round(sum(l_extendedprice * (1 - l_discount)) + 1e-6, 2) > 100000
         ORDER BY o_orderkey""",
    "q_scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
         ORDER BY l_orderkey, l_linenumber""",
    "q_join_broadcast" ->
      """SELECT n_nationkey, n_name, r_name
         FROM nation JOIN region ON n_regionkey = r_regionkey
         ORDER BY n_nationkey""",
    "q_join_shuffle" ->
      """SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue,
                CAST(COUNT(1) AS BIGINT) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q_join_left" ->
      """SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
                COALESCE(ROUND(SUM(o_totalprice), 2), 0.0) AS total
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         ORDER BY c_custkey""",
    "q_join_theta" ->
      """SELECT n1.n_name AS name1, n2.n_name AS name2,
                n1.n_regionkey AS regionkey
         FROM nation n1 JOIN nation n2
           ON n1.n_regionkey = n2.n_regionkey AND n1.n_name < n2.n_name
         ORDER BY name1, name2""",
    "q_agg_hash" ->
      """SELECT l_returnflag, l_linestatus,
                ROUND(SUM(l_quantity), 2) AS sum_qty,
                ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
                ROUND(AVG(l_quantity), 4) AS avg_qty,
                ROUND(AVG(l_discount), 4) AS avg_disc,
                CAST(COUNT(1) AS BIGINT) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_agg_distinct" ->
      """SELECT o_orderpriority, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
                CAST(COUNT(1) AS BIGINT) AS n_orders
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_agg_pivot" ->
      """SELECT n_name,
                round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END) + 1e-6, 2) AS urgent,
                round(sum(CASE WHEN o_orderpriority = '2-HIGH'
                          THEN o_totalprice END) + 1e-6, 2) AS high,
                round(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                          THEN o_totalprice END) + 1e-6, 2) AS medium
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    // derives the long form directly from base tables — proves the
    // Spark-side pivot→unpivot roundtrip against an independent path
    "q_agg_unpivot" ->
      """SELECT n_name,
                CASE o_orderpriority WHEN '1-URGENT' THEN 'urgent'
                     WHEN '2-HIGH' THEN 'high' ELSE 'medium' END AS priority,
                round(sum(o_totalprice) + 1e-6, 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
         GROUP BY n_name, priority ORDER BY n_name, priority""",
    "q_agg_histogram" ->
      """SELECT CAST(least(9, floor(o_totalprice / 50000)) AS INT) AS bucket,
                CAST(count(1) AS BIGINT) AS n,
                round(avg(o_totalprice) + 1e-6, 2) AS avg_price
         FROM orders GROUP BY bucket ORDER BY bucket""",
    // Spark percentile() == DuckDB quantile_cont (both exact
    // interpolated); bounds rounded BEFORE bucketing so both engines
    // compare v against identical doubles (the q_agg_winsor precedent)
    "q_agg_eqdepth" ->
      """WITH b AS (SELECT list_transform(
                      quantile_cont(o_totalprice,
                        [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
                      q -> round(q + 1e-6, 2)) AS qs
                    FROM orders),
         a AS (SELECT o_totalprice AS v,
                      1 + len(list_filter(b.qs, q -> o_totalprice > q))
                        AS bucket
               FROM orders, b)
         SELECT CAST(bucket AS INT) AS bucket,
                CAST(count(1) AS BIGINT) AS n,
                round(min(v) + 1e-6, 2) AS min_v,
                round(max(v) + 1e-6, 2) AS max_v
         FROM a GROUP BY bucket ORDER BY bucket""",
    "q_agg_rollup" ->
      """SELECT r_name, n_name, ROUND(SUM(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(COUNT(1) AS BIGINT) AS n,
                ROUND(SUM(l_quantity), 2) AS sum_qty
         FROM lineitem
         GROUP BY CUBE (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_agg_grouping_sets" ->
      """SELECT c_mktsegment, n_name, CAST(COUNT(1) AS BIGINT) AS n_cust,
                ROUND(SUM(c_acctbal), 2) AS acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
         ORDER BY c_mktsegment ASC NULLS FIRST, n_name ASC NULLS FIRST""",
  )
}
