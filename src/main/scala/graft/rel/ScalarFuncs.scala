package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
import graft.tables.Tables

/** Scalar expression surface (SURVEY.md §2B category scalar): string, date,
  * math, array (higher-order), and JSON functions.
  *
  * Everything here is a codegen'd built-in `org.apache.spark.sql.functions`
  * expression — per-row, no shuffle, fully pipelined inside
  * WholeStageCodegen; at 100 TB these run at scan speed. Float outputs are
  * rounded and cast per FIXTURES.md §4 so results hash-match the DuckDB
  * oracle bit-for-bit.
  */
object ScalarFuncs {
  import Relational.Q

  /** upper/substring/length/LIKE/concat/split over part. */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pfx"),
        length(col("p_name")).as("name_len"),
        col("p_name").like("%ol%").as("has_ol"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
        size(split(col("p_name"), " ")).as("n_words"))
      .orderBy("p_partkey")

  /** year/quarter/month/date_trunc/datediff over orders. Sort-first shape
    * (the q_math_funcs lesson, PERF.md): the range sort runs on the two
    * raw columns and the datetime projection happens once, after the
    * shuffle — never in the partitioner's sample pass. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderdate")
      .orderBy("o_orderkey")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mo"),
        unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        datediff(col("o_orderdate"),
          to_timestamp(lit("1995-01-01 00:00:00"))).as("days_since_95"))

  /** round/abs/sqrt/pow/ln over lineitem prices. Per-row IEEE-double math —
    * deterministic on both engines; rounded at 4dp.
    *
    * Shape matters: sort FIRST on the narrow raw columns, project the
    * computed columns AFTER. With project-then-sort, the range
    * partitioner's sample pass re-executes the whole projection and the
    * shuffle carries it again — Spark's `round` is a per-row BigDecimal
    * setScale (3 allocs/row here), so the double execution dominated
    * (round-1 bench: 8.4 s; this shape: ~0.3 s at sf0.1). Sort stays on
    * 5 narrow columns; the scalar map runs once, post-shuffle, ordering
    * preserved by the projection. */
  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice",
        "l_discount", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(pow(col("l_quantity"), 2.0), 2).as("qty_sq"),
        round(log(col("l_extendedprice") + lit(1.0)), 4).as("price_ln1p"))

  /** size/element_at/slice + higher-order aggregate over the embedding
    * array — the array surface the sc-matrix ops build on. */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        NumFmt.roundSigned(element_at(col("embedding"), 1).cast("double"), 4).as("first_val"),
        // + 0.0 collapses IEEE −0.0 (a vector summing to a tiny negative
        // that rounds to zero — first seen at sf1)
        NumFmt.roundSigned(aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("vec_sum"),
        NumFmt.roundSigned(aggregate(slice(col("embedding"), 1, 8), lit(0.0),
          (acc, x) => acc + x.cast("double")), 4).as("head8_sum"))
      .orderBy("vec_id")

  /** get_json_object over events.props (single-key JSON {"k": int}). */
  def jsonFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"))
      .orderBy("event_type")

  /** VARIANT surface (new in Spark 4): `parse_json` converts the props
    * string ONCE into the binary variant encoding, `variant_get`
    * extracts typed fields from it — where q_json_funcs'
    * get_json_object re-parses the JSON string on every extraction.
    * Same aggregate, same oracle family; at 100 TB parse-once-extract-
    * many wins whenever more than one field is touched, and the binary
    * variant is what a modern lake stores for semi-structured columns.
    * The schema_of_variant probe doubles as a type audit: every props
    * row must carry the same {"k": BIGINT} shape. */
  def variantFuncs(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "long").as("k"),
        schema_of_variant(col("v")).as("vschema"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        count(col("k")).as("n_with_k"),
        countDistinct(col("vschema")).as("n_schemas"))
      .orderBy("event_type")

  /** NULL-handling surface: coalesce/nullif/nvl2-style conditionals over
    * the left-join shape that actually produces NULLs. */
  def nullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00"))),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(max(col("o_totalprice")).as("max_price"))
      .select(
        col("c_custkey"),
        coalesce(round(col("max_price"), 2), lit(-1.0)).as("price_or_default"),
        col("max_price").isNull.as("no_recent_orders"),
        when(col("max_price").isNull, lit("inactive"))
          .otherwise(lit("active")).as("status"),
        nullif(coalesce(col("max_price"), lit(0.0)), lit(0.0)).isNull
          .as("zero_as_null"))
      .orderBy("c_custkey")

  /** Regex surface: extract / replace / match over part names. */
  def regexFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+) ", 1).as("first_word"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        col("p_name").rlike("^(small|large)").as("is_sized"),
        size(split(col("p_type"), "[^A-Z]+")).as("type_parts"))
      .orderBy("p_partkey")

  /** Statistical aggregates: exact percentiles, stddev, correlation,
    * covariance — per returnflag over lineitem.
    *
    * Both percentiles come from ONE `percentile(col, array(...))` call:
    * exact percentile buffers every group value, so two separate calls
    * would build (and sort) that per-group buffer twice. Exact percentile
    * is inherently a per-group materialization — bounded here by the
    * 3-value group key; at unbounded group sizes use
    * q_agg_approx_percentile's sketch instead. */
  def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, array(0.5, 0.9))").as("pcts"),
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        // roundSigned: at sf10 one group's corr lands within 1e-9 of 0
        // and the engines round to differently-signed zeros
        NumFmt.roundSigned(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("qty_price_corr"),
        NumFmt.roundSigned(covar_samp(col("l_discount"), col("l_tax")), 6).as("disc_tax_cov"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1), 4).as("median_price"),
        round(element_at(col("pcts"), 2), 4).as("p90_price"),
        col("sd_price"), col("qty_price_corr"), col("disc_tax_cov"))
      .orderBy("l_returnflag")

  /** Association between two categorical columns: per-cell mutual-
    * information and chi-square contributions over the (lang, source)
    * contingency table — the feature-selection / drift-detection
    * primitive (is the language mix independent of the source?).
    *
    * Scale shape: one keyed count for the joint table plus two
    * vocabulary-sized marginal counts broadcast back onto it, and a
    * one-row total on a broadcast cross join — all map-side combinable,
    * nothing driver-side. Counts are cast to DOUBLE BEFORE multiplying
    * (n_x*n_y as 64-bit integers overflows at corpus scale). Only
    * observed cells are emitted (zero cells contribute 0 to MI; their
    * chi-square term needs the dense grid — documented, not computed).
    * ln() last-ulp portability is handled by rounding the terms (PMI
    * precedent). */
  /** The contingency core over any (x, y) categorical pair — split out
    * so specs can drive closed-form fixtures (x==y → MI = ln(k)). */
  def miTable(df: DataFrame, x: String, y: String): DataFrame = {
    val joint = df.groupBy(col(x), col(y)).agg(count(lit(1)).as("n_xy"))
    val mx = df.groupBy(col(x)).agg(count(lit(1)).as("n_x"))
    val my = df.groupBy(col(y)).agg(count(lit(1)).as("n_y"))
    val nt = df.agg(count(lit(1)).as("n"))
    val e = col("n_x").cast("double") * col("n_y").cast("double") /
      col("n").cast("double")
    joint
      .join(broadcast(mx), Seq(x))
      .join(broadcast(my), Seq(y))
      .crossJoin(broadcast(nt))
      .select(col(x), col(y), col("n_xy"),
        round(e + lit(1e-9), 4).as("expected"),
        // + 0.0 normalizes -0.0 (negative terms can round to zero)
        NumFmt.roundSigned((col("n_xy").cast("double") / col("n")) *
          log(col("n_xy").cast("double") * col("n") /
            (col("n_x").cast("double") * col("n_y"))) + lit(1e-9), 6).as("mi_term"),
        round(pow(col("n_xy").cast("double") - e, 2) / e + lit(1e-9), 4)
          .as("chi2_term"))
      .orderBy(x, y)
  }

  def statsMi(s: SparkSession, d: String): DataFrame =
    miTable(Tables.documents(s, d), "lang", "source")

  /** Grid-KS two-sample drift test: the Kolmogorov–Smirnov D statistic
    * between the click and purchase `value` distributions, evaluated on
    * a fixed 99-point percentile grid of the POOLED sample — the
    * distributed-safe formulation. Exact KS needs a globally ordered
    * CDF walk (a full-sort bottleneck at corpus scale); the grid form
    * is one exact-percentile broadcast (99 doubles) + ONE conditional
    * aggregation pass — no sort, no window, no second scan — and is
    * what drift monitors actually evaluate. Deterministic: the grid is
    * exact interpolated percentiles, bit-identical across engines (the
    * same linear-interpolation contract the normalize-median relies
    * on), so D is hash-verified, not approximated. */
  def statsKs(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("et"), col("value").cast("double").as("v"))
    val grid = ev.agg(
      expr(s"percentile(v, array(${KsFracs.mkString(",")}))").as("g"))
    val n1 = sum(when(col("et") === "click", 1).otherwise(0))
      .cast("long").as("n1")
    val n2 = sum(when(col("et") === "purchase", 1).otherwise(0))
      .cast("long").as("n2")
    val cdfCols = (0 until KsFracs.length).flatMap { k =>
      Seq(
        sum(when(col("et") === "click" &&
            col("v") <= element_at(col("g"), k + 1), 1).otherwise(0))
          .cast("double").as(s"c$k"),
        sum(when(col("et") === "purchase" &&
            col("v") <= element_at(col("g"), k + 1), 1).otherwise(0))
          .cast("double").as(s"p$k"))
    }
    val wide = ev.crossJoin(broadcast(grid))
      .agg(n1, (n2 +: cdfCols): _*)
    val dStat = KsFracs.indices.map(k =>
        abs(col(s"c$k") / col("n1") - col(s"p$k") / col("n2")))
      .reduce(greatest(_, _))
    // a zero-row side is a degenerate input where Spark (NULL) and
    // DuckDB (inf/NaN) division semantics diverge — fail loudly instead
    // of producing an engine-dependent non-answer
    wide.select(col("n1"), col("n2"),
      when(col("n1") > 0 && col("n2") > 0, round(dStat + lit(1e-9), 6))
        .otherwise(raise_error(lit(
          "statsKs: a compared side has zero rows")).cast("double"))
        .as("d_stat"))
  }
  private val KsFracs: Seq[Double] = (1 to 99).map(_ / 100.0)

  /** Winsorized aggregation: clip the value column at the group's exact
    * p05/p95 before averaging — the standard outlier-robust feature
    * cleaning step (heavy tails move the mean; clipping bounds their
    * leverage without dropping rows).
    *
    * Two-phase plan: exact percentiles per group (bounded by the 3-value
    * group key; the sketch twin covers unbounded groups), broadcast back
    * onto the fact table, per-row clip, ordinary hash agg. The fact
    * table is scanned twice — at scale phase 1 runs on the
    * q_agg_approx_percentile sketch so the bounds pass is cheap. */
  def aggWinsor(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.05, 0.95))").as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("lo"),
        round(element_at(col("ps"), 2), 4).as("hi"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .withColumn("clipped",
        least(greatest(col("l_extendedprice"), col("lo")), col("hi")))
      .groupBy(col("l_returnflag"))
      .agg(first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        round(avg(col("clipped")) + lit(1e-6), 2).as("avg_winsor"),
        sum(when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L))
          .as("n_clip_lo"),
        sum(when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L))
          .as("n_clip_hi"))
      .orderBy("l_returnflag")
  }

  /** Robust outlier detection per series: median/MAD z-scores (the
    * mean/stddev pair breaks down under the very outliers it should
    * find; median and MAD have 50% breakdown). Reports per-group
    * summary: scaled MAD (1.4826x for normal consistency), outlier
    * count at |z| > 3.5 (Iglewicz–Hoaglin cutoff), and the worst score.
    * The batch-robust complement to q_ts_anomaly's rolling mean z.
    *
    * Plan: two exact-percentile passes (median, then MAD around it)
    * with vocabulary-sized broadcast joins between them, then one
    * scoring pass — 3 scans of the fact table, group count bounded by
    * the series vocabulary. At corpus scale the two percentile passes
    * run on the approx_percentile sketch (one scan, bounded memory) —
    * exact is kept here because the profile IS the oracle contract. */
  def outliersMad(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
    val mad = ev.join(broadcast(med), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
    ev.join(broadcast(med), Seq("event_type"))
      .join(broadcast(mad), Seq("event_type"))
      .withColumn("z", round(abs(col("value") - col("med")) /
        (lit(1.4826) * col("mad")) + lit(1e-9), 3))
      .groupBy(col("event_type"), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("z") > 3.5, 1L).otherwise(0L)).as("n_outliers"),
        max(col("z")).as("max_z"))
      .select("event_type", "n", "med", "mad", "n_outliers", "max_z")
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "q_stats_mi"     -> statsMi _,
    "q_stats_ks"     -> statsKs _,
    "q_outliers_mad" -> outliersMad _,
    "q_agg_winsor"   -> aggWinsor _,
    "q_string_funcs" -> stringFuncs _,
    "q_date_funcs"   -> dateFuncs _,
    "q_math_funcs"   -> mathFuncs _,
    "q_array_funcs"  -> arrayFuncs _,
    "q_json_funcs"   -> jsonFuncs _,
    "q_variant_funcs" -> variantFuncs _,
    "q_null_funcs"   -> nullFuncs _,
    "q_regex_funcs"  -> regexFuncs _,
    "q_agg_stats"    -> aggStats _,
  )

  val oracle: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey,
                upper(p_name) AS name_upper,
                substr(p_name, 1, 5) AS name_pfx,
                CAST(length(p_name) AS INT) AS name_len,
                p_name LIKE '%ol%' AS has_ol,
                concat(p_brand, '-', p_type) AS brand_type,
                CAST(len(str_split(p_name, ' ')) AS INT) AS n_words
         FROM part ORDER BY p_partkey""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS yr,
                CAST(quarter(o_orderdate) AS INT) AS qtr,
                CAST(month(o_orderdate) AS INT) AS mo,
                epoch_us(date_trunc('month', o_orderdate)) AS month_start_us,
                CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                              o_orderdate) AS INT) AS days_since_95
         FROM orders ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
                round(l_extendedprice, 1) AS price_r1,
                abs(l_discount - 0.05) AS disc_dev,
                round(sqrt(l_extendedprice), 4) AS price_sqrt,
                round(pow(l_quantity, 2.0), 2) AS qty_sq,
                round(ln(l_extendedprice + 1.0), 4) AS price_ln1p
         FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_array_funcs" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 4) + 0.0 AS first_val,
                round(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE))), 4) + 0.0 AS vec_sum,
                round(list_sum(list_transform(embedding[1:8],
                      x -> CAST(x AS DOUBLE))), 4) + 0.0 AS head8_sum
         FROM embeddings ORDER BY vec_id""",
    "q_json_funcs" ->
      """SELECT event_type,
                CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(COUNT(props->>'$.k') AS BIGINT) AS n_with_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the variant route must produce json_funcs' numbers exactly, plus
    // the single-schema audit (every props row is {"k": BIGINT})
    "q_variant_funcs" ->
      """SELECT event_type,
                CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                CAST(COUNT(props->>'$.k') AS BIGINT) AS n_with_k,
                CAST(1 AS BIGINT) AS n_schemas
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_null_funcs" ->
      """WITH m AS (
           SELECT c_custkey, max(o_totalprice) AS max_price
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey
             AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
           GROUP BY c_custkey)
         SELECT c_custkey,
                coalesce(round(max_price, 2), -1.0) AS price_or_default,
                max_price IS NULL AS no_recent_orders,
                CASE WHEN max_price IS NULL THEN 'inactive'
                     ELSE 'active' END AS status,
                nullif(coalesce(max_price, 0.0), 0.0) IS NULL AS zero_as_null
         FROM m ORDER BY c_custkey""",
    "q_regex_funcs" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '^([a-z]+) ', 1) AS first_word,
                regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
                regexp_matches(p_name, '^(small|large)') AS is_sized,
                CAST(len(regexp_split_to_array(p_type, '[^A-Z]+')) AS INT)
                  AS type_parts
         FROM part ORDER BY p_partkey""",
    // operand ORDER inside each term mirrors the Spark expression
    // left-to-right so both engines run the identical IEEE op sequence
    // same 99-point pooled percentile grid (quantile_cont == Spark's
    // exact percentile interpolation), same conditional-count CDFs
    "q_stats_ks" -> {
      val fr = KsFracs.mkString(", ")
      s"""WITH ev AS (SELECT event_type AS et, CAST(value AS DOUBLE) AS v
                      FROM events
                      WHERE event_type IN ('click', 'purchase')),
         g AS (SELECT quantile_cont(v, [$fr]) AS q FROM ev),
         pts AS (SELECT ix, q[ix] AS gp
                 FROM g, unnest(range(1, ${KsFracs.length + 1})) AS t(ix)),
         c AS (SELECT ix,
                 CAST(count(1) FILTER (WHERE et = 'click' AND v <= gp)
                   AS DOUBLE) AS c1,
                 CAST(count(1) FILTER (WHERE et = 'purchase' AND v <= gp)
                   AS DOUBLE) AS c2
               FROM ev CROSS JOIN pts GROUP BY ix),
         n AS (SELECT
                 CAST(count(1) FILTER (WHERE et = 'click') AS BIGINT) AS n1,
                 CAST(count(1) FILTER (WHERE et = 'purchase') AS BIGINT) AS n2
               FROM ev)
         SELECT n1, n2, round(max(abs(c1 / n1 - c2 / n2)) + 1e-9, 6)
                  AS d_stat
         FROM c, n GROUP BY n1, n2"""
    },
    "q_stats_mi" ->
      """WITH joint AS (SELECT lang, source, CAST(count(1) AS BIGINT) AS n_xy
                        FROM documents GROUP BY 1, 2),
         mx AS (SELECT lang, CAST(count(1) AS BIGINT) AS n_x
                FROM documents GROUP BY 1),
         my AS (SELECT source, CAST(count(1) AS BIGINT) AS n_y
                FROM documents GROUP BY 1),
         nt AS (SELECT CAST(count(1) AS BIGINT) AS n FROM documents)
         SELECT lang, source, n_xy,
                round(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                      / CAST(n AS DOUBLE) + 1e-9, 4) AS expected,
                round((CAST(n_xy AS DOUBLE) / n)
                      * ln(CAST(n_xy AS DOUBLE) * n
                           / (CAST(n_x AS DOUBLE) * n_y)) + 1e-9, 6) + 0.0
                  AS mi_term,
                round(pow(CAST(n_xy AS DOUBLE)
                          - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                            / CAST(n AS DOUBLE), 2)
                      / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)
                         / CAST(n AS DOUBLE)) + 1e-9, 4) AS chi2_term
         FROM joint JOIN mx USING (lang) JOIN my USING (source)
         CROSS JOIN nt
         ORDER BY lang, source""",
    "q_outliers_mad" ->
      """WITH ev AS (SELECT event_type, value FROM events),
         med AS (SELECT event_type,
                        round(quantile_cont(value, 0.5), 4) AS med
                 FROM ev GROUP BY 1),
         mad AS (SELECT e.event_type,
                        round(quantile_cont(abs(value - med), 0.5), 4)
                          AS mad
                 FROM ev e JOIN med USING (event_type)
                 GROUP BY e.event_type),
         sc AS (SELECT e.event_type, med, mad,
                       round(abs(value - med)
                             / (CAST(1.4826 AS DOUBLE) * mad) + 1e-9, 3)
                         AS z
                FROM ev e JOIN med USING (event_type)
                          JOIN mad USING (event_type))
         SELECT event_type, CAST(count(1) AS BIGINT) AS n, med, mad,
                CAST(sum(CASE WHEN z > CAST(3.5 AS DOUBLE) THEN 1 ELSE 0
                             END) AS BIGINT) AS n_outliers,
                max(z) AS max_z
         FROM sc GROUP BY event_type, med, mad
         ORDER BY event_type""",
    // bounds are ROUNDED before the clip on both engines, so the join
    // and per-row least/greatest see identical doubles
    "q_agg_winsor" ->
      """WITH b AS (SELECT l_returnflag,
                           round(quantile_cont(l_extendedprice, 0.05), 4)
                             AS lo,
                           round(quantile_cont(l_extendedprice, 0.95), 4)
                             AS hi
                    FROM lineitem GROUP BY 1)
         SELECT l.l_returnflag, b.lo, b.hi,
                round(avg(least(greatest(l_extendedprice, lo), hi))
                      + 1e-6, 2) AS avg_winsor,
                CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clip_lo,
                CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_clip_hi
         FROM lineitem l JOIN b USING (l_returnflag)
         GROUP BY l.l_returnflag, b.lo, b.hi
         ORDER BY l_returnflag""",
    "q_agg_stats" ->
      """SELECT l_returnflag,
                round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
                round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
                round(stddev_samp(l_extendedprice), 2) AS sd_price,
                round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS qty_price_corr,
                round(covar_samp(l_discount, l_tax), 6) + 0.0 AS disc_tax_cov
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
