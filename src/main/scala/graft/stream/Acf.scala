package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Autocorrelation structure of the event stream: for each lag
  * k = 1..MaxLag over the hourly event-count series, the Pearson
  * numerator `n·Σxy − Σx·Σy` and the two variance numerators — the
  * quantities a seasonality detector / forecaster actually consumes
  * (r_k is just num / sqrt(denx·deny), a driver-side division).
  *
  * Exactness: counts are BIGINT, so every sum/product is exact integer
  * arithmetic end-to-end — no float summation order anywhere, which is
  * what makes a windowless bit-exact DuckDB oracle possible (emitting
  * r_k itself would put a sqrt+divide inside the hash compare). Hour
  * buckets come from integer `ts_ns div 3.6e12` — no timezone or
  * interval arithmetic to diverge on.
  *
  * Scale shape: ONE keyed agg reduces the raw stream to the
  * calendar-sized hourly frame (at 100 TB of events still
  * |hours| rows); the lag pairing is that small frame exploded ×MaxLag
  * and self-joined on (hour+k) — a keyed equi-join on the reduced
  * frame, never touching raw events again; then one MaxLag-group agg.
  * Only hours present on BOTH ends of a lag pair contribute (inner
  * join), the standard "available-case" ACF over an incomplete grid. */
object Acf {
  type Q = (SparkSession, String) => DataFrame

  val MaxLag = 6

  def acf(s: SparkSession, d: String): DataFrame = {
    // persisted: the lag self-join reads it twice and the result plan
    // keeps referencing it — harness-released via Bench/Verify
    // clearCache (the Selection.textDsir contract); looping library
    // callers should clearCache themselves (round-8 advisory)
    val hourly = Tables.events(s, d)
      .groupBy(expr("ts_ns div 3600000000000").as("hb"))
      .agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lags = (1 to MaxLag).toArray
    val left = hourly
      .withColumn("lag", explode(lit(lags)))
      .select(col("lag"), (col("hb") + col("lag")).as("hb2"),
        col("cnt").as("cx"))
    val paired = left.join(
      hourly.select(col("hb").as("hb2"), col("cnt").as("cy")), "hb2")
    paired.groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("cx") * col("cy")).as("sxy"),
        sum(col("cx")).as("sx"), sum(col("cy")).as("sy"),
        sum(col("cx") * col("cx")).as("sxx"),
        sum(col("cy") * col("cy")).as("syy"))
      .select(col("lag"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("denx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("deny"))
      .orderBy("lag")
  }

  val queries: Map[String, Q] = Map("q_ts_acf" -> acf _)

  val oracle: Map[String, String] = Map(
    "q_ts_acf" ->
      s"""WITH c AS (
           SELECT epoch_us(ts) // 3600000000 AS hb,
                  CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY 1),
         l AS (SELECT CAST(range AS INT) AS lag
               FROM range(1, ${MaxLag + 1})),
         j AS (
           SELECT l.lag, a.cnt AS cx, b.cnt AS cy
           FROM l CROSS JOIN c a
           JOIN c b ON b.hb = a.hb + l.lag)
         SELECT lag, CAST(count(*) AS BIGINT) AS n,
                CAST(count(*) * sum(cx * cy)
                     - sum(cx) * sum(cy) AS BIGINT) AS num,
                CAST(count(*) * sum(cx * cx)
                     - sum(cx) * sum(cx) AS BIGINT) AS denx,
                CAST(count(*) * sum(cy * cy)
                     - sum(cy) * sum(cy) AS BIGINT) AS deny
         FROM j GROUP BY lag ORDER BY lag""")
}
