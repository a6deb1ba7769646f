package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Temporal operators beyond the as-of join (AsOf.scala): point-in-interval
  * range join and SCD2 (slowly-changing-dimension) history build.
  *
  * Reference repo (lasersonlab/single-cell-experiments; mount empty at build
  * time, SURVEY.md §0) has no temporal surface — both ops are north-star
  * extension queries in the interval family, the classic "operators Spark
  * lacks natively" pair next to as-of.
  */
object Temporal {
  type Q = (SparkSession, String) => DataFrame

  /** Point-in-interval range join: high-value promo orders define 7-day
    * windows [o_orderdate, +7d); count lineitem shipments falling inside
    * each window (no key relation — a pure range predicate).
    *
    * Scale shape: a naive range join is a BroadcastNestedLoopJoin —
    * O(|intervals|·|points|) compares. Instead the interval side EXPLODES
    * to one row per covered day (bounded: 7 rows/interval) and the join
    * becomes an equi-join on the day bucket, i.e. a plain keyed shuffle;
    * the exact range predicate then filters within buckets. Each point has
    * exactly one day, so a (interval, point) pair can match at most one
    * bucket — no post-join dedup needed. At 100 TB this is the standard
    * bucketed interval join: cost is points-per-day × intervals-covering-
    * that-day, linear in both inputs for bounded interval length. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val promos = Tables.orders(s, d)
      .filter(col("o_totalprice") > 495000)
      .select(col("o_orderkey"), col("o_orderdate").as("start_ts"),
        expr("o_orderdate + INTERVAL 7 DAYS").as("end_ts"))
    // one row per covered day; end is exclusive at midnight of day 7, so
    // days start..start+6 cover the interval exactly
    val buckets = promos.withColumn("day",
      explode(sequence(to_date(col("start_ts")),
        date_add(to_date(col("start_ts")), 6))))
    val points = Tables.lineitem(s, d)
      .select(col("l_shipdate"), to_date(col("l_shipdate")).as("day"))
    buckets.join(points, Seq("day"))
      // exact predicate within the bucket (kept for generality — buckets
      // alone are exact here because interval bounds are midnight-aligned)
      .filter(col("l_shipdate") >= col("start_ts") &&
        col("l_shipdate") < col("end_ts"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_shipped"))
      .orderBy("o_orderkey")
  }

  /** SCD2 build: compress a changelog (orders as per-customer status
    * events) into effective-dated ranges — collapse consecutive runs of
    * the same status, then [valid_from, valid_to) from each run start to
    * the next, open-ended rows closed with the 9999-12-31 sentinel (kept
    * non-null so the output schema is uniformly BIGINT).
    *
    * Scale shape: two window passes over the same (custkey | date, key)
    * ordering — one partitioned shuffle total (the second window reuses
    * the first's partitioning+sort since the filter preserves them). The
    * per-key history is bounded (orders per customer), so no reducer
    * hotspot. This is the CDC→dimension compaction every warehouse
    * pipeline runs; q_dedup_latest is its keep-last-only sibling. */
  /** Open-ended rows close at this sentinel instead of NULL so the output
    * schema is uniformly BIGINT (the classic warehouse convention). */
  val OpenEndUs = "unix_micros(TIMESTAMP '9999-12-31 00:00:00')"

  /** The reusable core: changelog (key, status, ts, tie) → effective-dated
    * run ranges. `tie` must make (ts, tie) unique per key so both window
    * passes are deterministically ordered. */
  def buildScd2(changelog: DataFrame, key: String, status: String,
                ts: String, tie: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tie)
    changelog
      .withColumn("__prev", lag(col(status), 1).over(w))
      // keep run starts only: first row per key or a status change
      .filter(col("__prev").isNull || col("__prev") =!= col(status))
      // parquet ms-timestamps surface as TIMESTAMP_NTZ; the cast to
      // TIMESTAMP is exact under the UTC session and matches the oracle's
      // epoch_us on the same naive values
      .withColumn("valid_from_us", unix_micros(col(ts).cast("timestamp")))
      .withColumn("valid_to_us",
        coalesce(lead(col("valid_from_us"), 1).over(w), expr(OpenEndUs)))
      .select(col(key), col(status).as("status"),
        col("valid_from_us"), col("valid_to_us"))
  }

  def scd2(s: SparkSession, d: String): DataFrame =
    buildScd2(
      Tables.orders(s, d).select(col("o_custkey"), col("o_orderstatus"),
        col("o_orderdate"), col("o_orderkey")),
      key = "o_custkey", status = "o_orderstatus",
      ts = "o_orderdate", tie = "o_orderkey")
      // valid_to_us is a REQUIRED sort key for totality: alternating
      // statuses on one date (F,O,F by orderkey) emit two rows equal in
      // (custkey, from, status) that differ only in valid_to
      .orderBy("o_custkey", "valid_from_us", "status", "valid_to_us")

  val queries: Map[String, Q] = Map(
    "q_join_range" -> rangeJoin _,
    "q_scd2"       -> scd2 _,
  )

  val oracle: Map[String, String] = Map(
    // DuckDB plans the inequality join natively (IEJoin) — same result,
    // different physical strategy, which is exactly the point of the test
    "q_join_range" ->
      """SELECT o_orderkey, CAST(count(1) AS BIGINT) AS n_shipped
         FROM orders JOIN lineitem
           ON l_shipdate >= o_orderdate
          AND l_shipdate < o_orderdate + INTERVAL 7 DAY
         WHERE o_totalprice > 495000
         GROUP BY o_orderkey ORDER BY o_orderkey""",
    "q_scd2" ->
      """WITH r AS (
           SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
                  lag(o_orderstatus) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev_status
           FROM orders),
         starts AS (
           SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey FROM r
           WHERE prev_status IS NULL OR prev_status <> o_orderstatus)
         SELECT o_custkey, o_orderstatus AS status,
                epoch_us(o_orderdate) AS valid_from_us,
                coalesce(
                  lead(epoch_us(o_orderdate)) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                  epoch_us(TIMESTAMP '9999-12-31 00:00:00')) AS valid_to_us
         FROM starts
         ORDER BY o_custkey, valid_from_us, status, valid_to_us""",
  )
}
