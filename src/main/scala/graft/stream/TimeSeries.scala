package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
import graft.tables.Tables

/** Time-series regularization: resample the event stream onto a fixed
  * hourly grid per series (event_type) and FORWARD-FILL values across
  * gaps — the densify step between an irregular event log and anything
  * that assumes regular samples (monitoring, feature windows, model
  * input). Gaps keep n = 0 so downstream can tell observed from filled;
  * hours before a series' first observation stay NULL (nothing to
  * carry).
  *
  * Scale shape: ONE pass over the raw stream — the keyed aggregation
  * down to the (series × hour) frame, which is the CALENDAR size, not
  * the event count: at 100 TB of events the grid is still
  * |series|·|hours| rows. That reduced frame is persisted and feeds all
  * three consumers (grid bounds, series list, the fill join) — it holds
  * every observed (series, hour) pair, so its min/max/distinct equal
  * the raw stream's, and the event log is never rescanned. (Column
  * pruning specializes the three subtrees differently, so ReuseExchange
  * alone would NOT dedupe them — without the cache each consumer
  * re-reads the raw events; TimeSeriesSpec pins the single-scan plan.)
  * Cache lifecycle follows the session, as in recipeZheng17/Pca —
  * Bench and Verify both clear the session cache between queries, so
  * the calendar-sized frame never outlives its query in a multi-query
  * run. The forward-fill window partitions
  * on the series key, so parallelism = |series|, bounded by the grid
  * size per series, not the raw stream. */
object TimeSeries {
  type Q = (SparkSession, String) => DataFrame

  /** The shared dense (series × hour) grid: one keyed agg over the raw
    * stream (persisted — calendar-sized), cross-joined onto the full
    * hour range, observed cells carrying (n, av) and gap cells NULL.
    * Both fill strategies (forward fill, linear interpolation) are
    * windows OVER this one frame. */
  private def hourlyGrid(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("value"))
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"),
        // round BEFORE the fill so filled cells copy the rounded value
        round(avg(col("value")) + lit(1e-6), 4).as("av"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grid = hourly
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
      .crossJoin(broadcast(hourly.select("event_type").distinct()))
    grid.join(hourly, Seq("event_type", "h"), "left")
  }

  def resampleHourly(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hourlyGrid(s, d)
      .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("av"), ignoreNulls = true).over(w).as("value_ff"))
      .orderBy("event_type", "hour_us")
  }

  /** Linear-interpolation gap fill over the same dense grid — the other
    * standard regularization next to forward fill: a gap cell takes the
    * value on the straight line between its bracketing observations,
    * proportional to its time offset; cells before the first or after
    * the last observation of a series stay NULL (nothing to bracket).
    * Observed cells pass through unchanged.
    *
    * Scale shape identical to resampleHourly: the four bracketing
    * columns (prev/next value and hour) are two cumulative windows over
    * the calendar-sized grid, partitioned on the series key — no extra
    * scan of the raw stream, no self-join. Hour stamps in micros are
    * exact integer-valued doubles (< 2^53), so the interpolation
    * fraction is bit-identical cross-engine; the result is rounded at
    * 4 dp per repo float discipline. */
  def tsInterpolate(s: SparkSession, d: String): DataFrame =
    interpolateGrid(hourlyGrid(s, d)
      .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
        col("n"), col("av")))

  /** The fill stage alone, over any (event_type, hour_us, n, av) grid
    * frame with NULL av in gap cells — split out for planted-gap spec
    * fixtures. */
  def interpolateGrid(g: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy("event_type").orderBy("hour_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("event_type").orderBy("hour_us")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsH = when(col("av").isNotNull, col("hour_us"))
    val pv = last(col("av"), ignoreNulls = true).over(wPrev)
    val ph = last(obsH, ignoreNulls = true).over(wPrev)
    val nv = first(col("av"), ignoreNulls = true).over(wNext)
    val nh = first(obsH, ignoreNulls = true).over(wNext)
    val frac = (col("hour_us") - ph).cast("double") /
      (nh - ph).cast("double")
    g.select(col("event_type"), col("hour_us"),
        coalesce(col("n"), lit(0L)).as("n"),
        NumFmt.roundSigned(
          when(col("av").isNotNull, col("av"))
            .otherwise(pv + (nv - pv) * frac) + lit(1e-9), 4)
          .as("value_li"))
      .orderBy("event_type", "hour_us")
  }

  /** Rolling z-score anomaly detection over the hourly series: each
    * (event_type, hour) mean is scored against the trailing 24-hour
    * window (EXCLUSIVE of the current row, so an outlier can't mask
    * itself), flagged when |z| > 3 with at least 12 trailing
    * observations. The standard monitoring primitive between a metric
    * stream and an alerting rule.
    *
    * Scale shape: the keyed agg reduces the raw stream to the calendar
    * frame (|series|·|hours| rows) in one pass with map-side partials;
    * the rolling window then partitions on the series key, so its
    * per-partition sort is bounded by hours-per-series, never by the
    * event count. No grid densify here — missing hours simply don't
    * score, which is the right alerting semantics (no data ≠ anomaly).
    *
    * Cross-engine float discipline (repo convention): hourly means are
    * rounded before windowing, the window mean/stddev are rounded at
    * 6 dp (+1e-9) so Spark's incremental-moment accumulation and
    * DuckDB's summation order can't diverge, and z is computed FROM the
    * rounded values — identical IEEE inputs → identical doubles — then
    * itself rounded at 3 dp. */
  /** The scoring stage alone, over any (event_type, hour_us, av) frame —
    * split out so specs can drive it with planted-spike fixtures. */
  def scoreHourly(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour_us")
      .rowsBetween(-24, -1)
    val m  = round(avg(col("av")).over(w) + lit(1e-9), 6)
    val sd = round(stddev_samp(col("av")).over(w) + lit(1e-9), 6)
    val nw = count(col("av")).over(w)
    hourly
      .select(col("event_type"), col("hour_us"), col("av"),
        when(nw >= 12 && sd > 0.0,
          NumFmt.roundSigned((col("av") - m) / sd + lit(1e-9), 3)).as("z"))
      .withColumn("is_anomaly", coalesce(abs(col("z")) > lit(3.0), lit(false)))
  }

  def tsAnomaly(s: SparkSession, d: String): DataFrame =
    scoreHourly(
      Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(round(avg(col("value")) + lit(1e-6), 4).as("av"))
        .select(col("event_type"), unix_micros(col("h")).as("hour_us"),
          col("av")))
      .orderBy("event_type", "hour_us")

  /** EWMA smoothing (α = 0.2) over the forward-filled hourly grid — the
    * trend line next to q_ts_anomaly's alert flags. The horizon is
    * truncated at 24 hours: (1−α)^24 ≈ 0.5 % weight, so the infinite
    * recursive EWMA and this windowed form agree to well under the 4 dp
    * output precision, and UNLIKE the recursion the window DISTRIBUTES —
    * partitions on the series key, no sequential scan per series at
    * 100 TB. Weights are normalized by the geometric closed form
    * (1−(1−α)^n)/α so partial warmup windows average correctly.
    *
    * The Spark plan is one window + per-row HOF fold (collect the ≤24
    * trailing values, weight by position, fold); the DuckDB oracle is
    * the naive O(n·24) self-join over the dense grid — hash equality
    * proves the windowed decomposition, not just speed (the
    * oracle-proves-optimization pattern). */
  def tsEwma(s: SparkSession, d: String): DataFrame =
    ewmaHourly(resampleHourly(s, d).filter(col("value_ff").isNotNull)
      .select(col("event_type"), col("hour_us"), col("value_ff")))

  /** The smoothing stage alone, over any dense (event_type, hour_us,
    * value_ff) frame — split out for closed-form spec fixtures. Input
    * must be hour-dense per series (resampleHourly guarantees it);
    * ROWS-frame weights assume consecutive hours. */
  def ewmaHourly(g: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("hour_us")
      .rowsBetween(-23, 0)
    // frame order == orderBy order, so the list is oldest → newest and
    // element i of n gets weight (1-α)^(n-1-i)
    val withL = g.withColumn("l", collect_list(col("value_ff")).over(w))
    val n = size(col("l"))
    val num = aggregate(
      transform(col("l"), (x, i) =>
        x * pow(lit(0.8), (n - 1 - i).cast("double"))),
      lit(0.0), (a, x) => a + x)
    val den = (lit(1.0) - pow(lit(0.8), n.cast("double"))) / lit(0.2)
    withL.select(col("event_type"), col("hour_us"), col("value_ff"),
        NumFmt.roundSigned(num / den + lit(1e-9), 4).as("ewma"))
      .orderBy("event_type", "hour_us")
  }

  val queries: Map[String, Q] = Map(
    "q_ts_resample" -> resampleHourly _,
    "q_ts_anomaly" -> tsAnomaly _,
    "q_ts_ewma" -> tsEwma _,
    "q_ts_interpolate" -> tsInterpolate _,
  )

  val oracle: Map[String, String] = Map(
    // CASTs to plain TIMESTAMP: events.ts is ns-precision in DuckDB and
    // generate_series yields µs timestamps — the join key must agree.
    "q_ts_resample" ->
      """WITH ev AS (SELECT event_type,
                            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                            value
                     FROM events),
         hourly AS (SELECT event_type, h, CAST(count(1) AS BIGINT) AS n,
                           round(avg(value) + 1e-6, 4) AS av
                    FROM ev GROUP BY event_type, h),
         b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
         grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS h
                  FROM b),
         tg AS (SELECT DISTINCT event_type FROM events),
         g2 AS (SELECT tg.event_type, grid.h FROM grid CROSS JOIN tg),
         j AS (SELECT g2.event_type, g2.h,
                      coalesce(hourly.n, 0) AS n, hourly.av
               FROM g2 LEFT JOIN hourly
                 ON g2.event_type = hourly.event_type AND g2.h = hourly.h)
         SELECT event_type, epoch_us(h) AS hour_us, n,
                last_value(av IGNORE NULLS) OVER (
                  PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS value_ff
         FROM j ORDER BY event_type, hour_us""",
    // z is recomputed in the outer select from the SAME rounded m/sd —
    // identical double inputs and op sequence on both engines. Constants
    // are CAST to DOUBLE (DuckDB bare decimals are DECIMAL-typed).
    "q_ts_anomaly" ->
      """WITH ev AS (SELECT event_type,
                            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                            value
                     FROM events),
         hourly AS (SELECT event_type, h,
                           round(avg(value) + 1e-6, 4) AS av
                    FROM ev GROUP BY event_type, h),
         wz AS (SELECT event_type, h, av,
                       count(av) OVER w AS nw,
                       round(avg(av) OVER w + 1e-9, 6) AS m,
                       round(stddev_samp(av) OVER w + 1e-9, 6) AS sd
                FROM hourly
                WINDOW w AS (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT event_type, h, av,
                      CASE WHEN nw >= 12 AND sd > CAST(0 AS DOUBLE)
                           THEN round((av - m) / sd + 1e-9, 3) + 0.0
                      END AS z
               FROM wz)
         SELECT event_type, epoch_us(h) AS hour_us, av, z,
                coalesce(abs(z) > CAST(3.0 AS DOUBLE), false) AS is_anomaly
         FROM z ORDER BY event_type, hour_us""",
    // the NAIVE complete form: per output row, join the trailing 23
    // hours and weight by the integer hour gap — proves the Spark
    // window+fold decomposition over the dense grid. Weight exponents
    // are exact integer-valued doubles on both engines; the weighted
    // sum is rounded at 4 dp (+1e-9, +0.0) per repo float discipline.
    "q_ts_ewma" ->
      """WITH ev AS (SELECT event_type,
                            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                            value
                     FROM events),
         hourly AS (SELECT event_type, h, round(avg(value) + 1e-6, 4) AS av
                    FROM ev GROUP BY event_type, h),
         b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
         grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS h
                  FROM b),
         tg AS (SELECT DISTINCT event_type FROM events),
         g2 AS (SELECT tg.event_type, grid.h FROM grid CROSS JOIN tg),
         j AS (SELECT g2.event_type, g2.h, hourly.av
               FROM g2 LEFT JOIN hourly
                 ON g2.event_type = hourly.event_type AND g2.h = hourly.h),
         f AS (SELECT event_type, epoch_us(h) AS hour_us,
                      last_value(av IGNORE NULLS) OVER (
                        PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS value_ff
               FROM j),
         nn AS (SELECT * FROM f WHERE value_ff IS NOT NULL)
         SELECT a.event_type, a.hour_us, a.value_ff,
                round(sum(b2.value_ff * power(CAST(0.8 AS DOUBLE),
                        CAST((a.hour_us - b2.hour_us) // 3600000000
                             AS DOUBLE)))
                      / ((1 - power(CAST(0.8 AS DOUBLE),
                                    CAST(count(1) AS DOUBLE)))
                         / CAST(0.2 AS DOUBLE)) + 1e-9, 4) + 0.0 AS ewma
         FROM nn a JOIN nn b2 ON a.event_type = b2.event_type
           AND b2.hour_us BETWEEN a.hour_us - 23 * 3600000000
                              AND a.hour_us
         GROUP BY a.event_type, a.hour_us, a.value_ff
         ORDER BY a.event_type, a.hour_us""",
    // same dense-grid CTEs as q_ts_resample; the fill is the mirrored
    // pair of cumulative IGNORE NULLS windows. epoch_us stamps are exact
    // doubles (< 2^53) so the fraction is bit-identical cross-engine.
    "q_ts_interpolate" ->
      """WITH ev AS (SELECT event_type,
                            CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
                            value
                     FROM events),
         hourly AS (SELECT event_type, h, CAST(count(1) AS BIGINT) AS n,
                           round(avg(value) + 1e-6, 4) AS av
                    FROM ev GROUP BY event_type, h),
         b AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
         grid AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                    AS h
                  FROM b),
         tg AS (SELECT DISTINCT event_type FROM events),
         g2 AS (SELECT tg.event_type, grid.h FROM grid CROSS JOIN tg),
         j AS (SELECT g2.event_type, epoch_us(g2.h) AS hour_us,
                      coalesce(hourly.n, 0) AS n, hourly.av
               FROM g2 LEFT JOIN hourly
                 ON g2.event_type = hourly.event_type AND g2.h = hourly.h),
         f AS (SELECT event_type, hour_us, n, av,
                      last_value(av IGNORE NULLS) OVER wp AS pv,
                      last_value(CASE WHEN av IS NOT NULL THEN hour_us END
                                 IGNORE NULLS) OVER wp AS ph,
                      first_value(av IGNORE NULLS) OVER wn AS nv,
                      first_value(CASE WHEN av IS NOT NULL THEN hour_us END
                                  IGNORE NULLS) OVER wn AS nh
               FROM j
               WINDOW wp AS (PARTITION BY event_type ORDER BY hour_us
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY hour_us
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_type, hour_us, n,
                round(CASE WHEN av IS NOT NULL THEN av
                           ELSE pv + (nv - pv) *
                             (CAST(hour_us - ph AS DOUBLE) /
                              CAST(nh - ph AS DOUBLE)) END + 1e-9, 4) + 0.0
                  AS value_li
         FROM f ORDER BY event_type, hour_us""",
  )
}
