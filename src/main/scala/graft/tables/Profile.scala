package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-pass table profiling: per-column row/null/distinct counts and
  * formatted min/max — the data-quality report every ingest job emits
  * before a corpus is admitted to training (schema drift, null storms,
  * and key-cardinality collapse all show up here first).
  *
  * Scale shape: one UNION ALL branch per profiled column, each a
  * column-PRUNED scan + one aggregate. This deliberately beats the
  * "one scan" multi-distinct formulation (`t.agg(count_distinct(c1),
  * count_distinct(c2), …)`): that plans an Expand that duplicates
  * every row once per distinct column — 7× the rows through a single
  * hash aggregate carrying all columns — where the union's branches
  * each read ONE column (columnar parquet: total bytes across branches
  * ≈ the single wide scan) and map-side dedup to that column's
  * distinct values before the exchange. Measured at sf0.1: Expand form
  * 3.76 s, union form 0.73 s (5×); the Expand version is kept in
  * ProfileSpec as the proven-equal semantic reference. At 100 TB the
  * remaining swap is exact → approx_count_distinct (per-column HLL,
  * genuinely one scan, no Expand — the q_agg_approx_distinct /
  * q_agg_sketch_merge machinery); exact is kept here because the
  * profile IS the oracle-checked contract.
  *
  * Min/max are formatted driver-deterministically per type class
  * (printf %.4f for doubles, fixed strftime for timestamps, plain cast
  * for integers/strings) so the report is stable across engines —
  * shortest-round-trip double printing is NOT portable, fixed-precision
  * is. */
object Profile {
  type Q = (SparkSession, String) => DataFrame

  private def fmt(c: Column, dt: String): Column = dt match {
    case "double"    => format_string("%.4f", c)
    case "timestamp" => date_format(c, "yyyy-MM-dd HH:mm:ss")
    case _           => c.cast("string")
  }

  /** (column, type-class) inventory of the profiled table. */
  private val specs: Seq[(String, String)] = Seq(
    "o_orderkey"      -> "long",
    "o_custkey"       -> "long",
    "o_orderstatus"   -> "string",
    "o_totalprice"    -> "double",
    "o_orderdate"     -> "timestamp",
    "o_orderpriority" -> "string")

  def profileTable(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d)
    specs.map { case (c, dt) =>
      t.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(col(c)).as("n_distinct"),
          fmt(min(col(c)), dt).as("min_s"),
          fmt(max(col(c)), dt).as("max_s"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionAll _).orderBy("col_name")
  }

  /** The single-scan multi-distinct formulation (Expand plan) — kept as
    * the semantic reference; ProfileSpec proves it equal to the union
    * form the public id ships. */
  def profileTableExpand(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d)
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      specs.flatMap { case (c, dt) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(c + "__nn"),
        count_distinct(col(c)).as(c + "__nd"),
        fmt(min(col(c)), dt).as(c + "__mn"),
        fmt(max(col(c)), dt).as(c + "__mx"))
      }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    // pivot the single wide row to one report row per column
    val stackExpr = s"stack(${specs.size}, " + specs.map { case (c, _) =>
      s"'$c', ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx"
    }.mkString(", ") + ") as (col_name, n_null, n_distinct, min_s, max_s)"
    wide.select(col("n_rows"), expr(stackExpr))
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")
      .orderBy("col_name")
  }

  /** Declarative data-quality RULES over orders — the assertion
    * complement to profileTable's statistics (the Deequ-style check
    * suite an ingest gate runs): range, domain, completeness, a
    * time-window sanity rule, and a referential-integrity check against
    * customer. The four scalar rules are conditional sums inside ONE
    * aggregate over one scan (stack()'d to report rows); the
    * referential rule is a LEFT ANTI join — the only rule that needs a
    * second input, and the join broadcasts when the dimension fits,
    * shuffles on the key otherwise (planner's call; either way it's
    * keyed, never all-pairs). Counts are exact BIGINTs; pass_rate is a
    * ratio of exact counts. */
  def dqRules(s: SparkSession, d: String): DataFrame = {
    val t = Tables.orders(s, d)
    def viol(cond: Column): Column = sum(when(!cond, 1L).otherwise(0L))
    val scalarRules: Seq[(String, Column)] = Seq(
      "price_positive"   -> (col("o_totalprice") > 0.0),
      "status_in_domain" -> col("o_orderstatus").isin("O", "F", "P"),
      "custkey_not_null" -> col("o_custkey").isNotNull,
      "orderdate_in_window" ->
        col("o_orderdate").between("1992-01-01", "1998-12-31"))
    val aggs = count(lit(1)).as("n_rows") +:
      scalarRules.map { case (nm, c) => viol(c).as(nm) }
    val wide = t.agg(aggs.head, aggs.tail: _*)
    val stackExpr = s"stack(${scalarRules.size}, " + scalarRules.map {
      case (nm, _) => s"'$nm', $nm" }.mkString(", ") +
      ") as (rule, n_violations)"
    val scalarReport = wide.select(col("n_rows"), expr(stackExpr))
      .select(col("rule"), col("n_rows").as("n_checked"),
        col("n_violations"))
    val orphan = t.join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(t.agg(count(lit(1)).as("n_checked"))))
      .select(lit("custkey_references_customer").as("rule"),
        col("n_checked"), col("n_violations"))
    scalarReport.unionAll(orphan)
      .select(col("rule"), col("n_checked"), col("n_violations"),
        round(lit(1.0) - col("n_violations") / col("n_checked") + lit(1e-9), 6)
          .as("pass_rate"))
      .orderBy("rule")
  }

  /** `Dataset.observe` — audit metrics piggybacked on the MAIN job: the
    * accumulator-backed aggregates ride the existing scan, so at 100 TB
    * a pipeline gets its row/sum/violation counters for free instead of
    * paying a second pass (the Observation API is Spark's sanctioned
    * replacement for hand-rolled accumulators). Here the observed plan
    * is a lineitem scan driven by a noop write; the query RESULT is the
    * observed metrics row itself, so the DuckDB oracle value-proves
    * that observe's accumulator path aggregates exactly like a
    * groupBy-less agg would. The metrics land on the driver as one
    * bounded row (the bounded-stats class).
    *
    * EAGER by necessity (round-8 advisory): Observation.get blocks on a
    * completed job, so unlike every other Q-map entry this one runs its
    * full lineitem scan at CONSTRUCTION time and returns the already-
    * materialized one-row frame. A caller building the query map's
    * DataFrames without executing them pays that scan here — acceptable
    * for the gate/bench harnesses (they always execute), documented for
    * anyone else. */
  def obsMetrics(s: SparkSession, d: String): DataFrame = {
    val obs = org.apache.spark.sql.Observation()
    Tables.lineitem(s, d)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"),
        count(when(col("l_discount") > 0.05, 1)).as("n_heavy_discount"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import s.implicits._
    Seq((m("n_rows").asInstanceOf[Long],
        m("sum_qty").asInstanceOf[Double],
        m("n_heavy_discount").asInstanceOf[Long]))
      .toDF("n_rows", "sum_qty", "n_heavy_discount")
  }

  val queries: Map[String, Q] = Map(
    "q_profile_table" -> profileTable _,
    "q_dq_rules"      -> dqRules _,
    "q_obs_metrics"   -> obsMetrics _,
  )

  val oracle: Map[String, String] = Map(
    "q_obs_metrics" ->
      """SELECT CAST(count(1) AS BIGINT) AS n_rows,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty,
                CAST(count(CASE WHEN l_discount > 0.05 THEN 1 END)
                     AS BIGINT) AS n_heavy_discount
         FROM lineitem""",
    // counts are exact BIGINTs; pass_rate is a ratio of exact counts —
    // identical doubles on both engines (the q_text_oov precedent)
    "q_dq_rules" ->
      """WITH n AS (SELECT CAST(count(1) AS BIGINT) AS n_checked
                    FROM orders),
         s AS (
           SELECT 'price_positive' AS rule,
                  CAST(sum(CASE WHEN NOT (o_totalprice > 0) THEN 1
                           ELSE 0 END) AS BIGINT) AS n_violations
           FROM orders
           UNION ALL
           SELECT 'status_in_domain',
                  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                           THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'custkey_not_null',
                  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'orderdate_in_window',
                  CAST(sum(CASE WHEN o_orderdate
                                     NOT BETWEEN TIMESTAMP '1992-01-01'
                                             AND TIMESTAMP '1998-12-31'
                                THEN 1 ELSE 0 END) AS BIGINT)
           FROM orders
           UNION ALL
           SELECT 'custkey_references_customer',
                  CAST(count(1) FILTER (WHERE c.c_custkey IS NULL)
                       AS BIGINT)
           FROM orders o LEFT JOIN customer c
             ON o.o_custkey = c.c_custkey)
         SELECT rule, n.n_checked, n_violations,
                round(CAST(1 AS DOUBLE)
                      - CAST(n_violations AS DOUBLE) / n.n_checked
                      + 1e-9, 6) AS pass_rate
         FROM s, n ORDER BY rule""",
    // One UNION ALL branch per column (DuckDB rescans; fine for an
    // oracle). printf/strftime mirror the Spark-side fixed formatting.
    "q_profile_table" -> {
      def branch(c: String, dt: String): String = {
        val mn = dt match {
          case "double"    => s"printf('%.4f', min($c))"
          case "timestamp" => s"strftime(min($c), '%Y-%m-%d %H:%M:%S')"
          case _           => s"CAST(min($c) AS VARCHAR)"
        }
        val mx = mn.replace(s"min($c)", s"max($c)")
        s"""SELECT '$c' AS col_name,
               CAST(count(1) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_null,
               CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
               $mn AS min_s, $mx AS max_s
             FROM orders"""
      }
      specs.map { case (c, dt) => branch(c, dt) }
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY col_name")
    },
  )
}
