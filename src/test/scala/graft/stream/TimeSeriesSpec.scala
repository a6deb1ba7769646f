package graft.stream

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("resample grid is dense and forward fill carries last observation") {
    val out = TimeSeries.resampleHourly(spark, sf).cache()
    try {
      // dense: every series has the identical full hour range
      val span = out.agg(
        ((max("hour_us") - min("hour_us")) / 3600000000L + 1).cast("long"))
        .head.getLong(0)
      val perSeries = out.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(perSeries.filter(col("n") =!= span).count() == 0)
      // observed hours match an independent groupBy of the raw events
      val observed = Tables.events(spark, sf)
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("n0"))
      val mism = out.join(observed, Seq("event_type", "hour_us"), "left")
        .filter(coalesce(col("n0"), lit(0L)) =!= col("n"))
      assert(mism.count() == 0)
      // forward fill: a gap row (n=0) after at least one observation
      // carries a non-null value equal to the previous non-gap value
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hour_us")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val gaps = out
        .withColumn("seen", sum(col("n")).over(w))
        .filter(col("n") === 0 && col("seen") > 0)
      assert(gaps.filter(col("value_ff").isNull).count() == 0)
    } finally out.unpersist()
  }

  test("resample scans the raw event stream once") {
    // bounds, series list and the fill join all read the persisted hourly
    // frame (column pruning blocks plain ReuseExchange here), so every
    // consumer in the executed plan is an in-memory scan of the cache —
    // the raw event log is read only to materialize it
    spark.sharedState.cacheManager.clearCache()
    try {
      val out = TimeSeries.resampleHourly(spark, sf)
      out.count()
      val plan = out.queryExecution.executedPlan.toString
      val cached = "InMemoryTableScan".r.findAllIn(plan).size
      assert(cached >= 3, s"expected 3 cached hourly consumers\n$plan")
    } finally spark.sharedState.cacheManager.clearCache()
  }

  test("anomaly z-scores: warmup never fires, flags agree with |z|>3") {
    val out = TimeSeries.tsAnomaly(spark, sf).cache()
    try {
      // row frame = the observed hourly groups (no densify)
      val hourly = Tables.events(spark, sf)
        .groupBy(col("event_type"), date_trunc("hour", col("ts"))).count()
      assert(out.count() == hourly.count())
      // flag is defined purely by z (no flag without a score)
      assert(out.filter(col("z").isNull && col("is_anomaly")).count() == 0)
      assert(out.filter(col("is_anomaly") =!= (abs(col("z")) > 3.0))
        .filter(col("z").isNotNull).count() == 0)
      // the first 12 hours of every series can never score (window needs
      // 12 trailing observations, exclusive of the current row)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("hour_us")
      val early = out
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 12)
      assert(early.filter(col("z").isNotNull).count() == 0)
      // the window partitions on the series key — no global window sink
      assert(!planOf(out).contains("No Partition Defined"))
    } finally out.unpersist()
  }

  test("anomaly detection fires on a planted spike") {
    import spark.implicits._
    // 48 hourly points at value 10 ± tiny jitter, one 100-valued spike,
    // through the operator's actual scoring stage
    val base = (0 until 48).map { i =>
      ("s1", i.toLong * 3600L * 1000000L,
        if (i == 40) 100.0 else 10.0 + (i % 3) * 0.01)
    }.toDF("event_type", "hour_us", "av")
    val flagged = TimeSeries.scoreHourly(base)
      .filter(col("is_anomaly")).select("hour_us")
      .as[Long].collect().toSet
    assert(flagged.contains(40L * 3600L * 1000000L),
      s"spike at hour 40 not flagged: $flagged")
    // jittered steady-state rows before the spike are not flagged
    assert(!flagged.exists(_ < 40L * 3600L * 1000000L))
  }

  test("ewma: constant series smooths to itself, warmup row is exact") {
    import spark.implicits._
    val HR = 3600L * 1000000L
    val const = (0 until 30).map(i => ("a", i * HR, 5.0))
      .toDF("event_type", "hour_us", "value_ff")
    val out = TimeSeries.ewmaHourly(const).collect()
    assert(out.forall(r => math.abs(r.getDouble(3) - 5.0) < 1e-3))

    // unit impulse at t=0: ewma(t) = 0.2*0.8^t / (1 - 0.8^(t+1)),
    // exact closed form of the normalized truncated EWMA
    val impulse = (0 until 10).map(i =>
      ("b", i * HR, if (i == 0) 1.0 else 0.0))
      .toDF("event_type", "hour_us", "value_ff")
    val got = TimeSeries.ewmaHourly(impulse).collect()
      .map(r => r.getLong(1) / HR -> r.getDouble(3)).toMap
    (0 until 10).foreach { t =>
      val want = 0.2 * math.pow(0.8, t) / (1 - math.pow(0.8, t + 1))
      assert(math.abs(got(t.toLong) - want) < 1e-3,
        s"t=$t got ${got(t.toLong)} want $want")
    }
  }

  test("ewma: horizon truncation keeps weight outside 24h under output precision") {
    import spark.implicits._
    val HR = 3600L * 1000000L
    // step series: 100 for the first 30 hours, then 0. Once 24+ hours
    // past the step, the truncated window holds only zeros -> ewma == 0,
    // and the INFINITE recursion would still carry 100*0.8^24 ~ 0.47 of
    // pre-normalization mass; the normalized windowed form discards it.
    val step = (0 until 60).map(i => ("c", i * HR, if (i < 30) 100.0 else 0.0))
      .toDF("event_type", "hour_us", "value_ff")
    val got = TimeSeries.ewmaHourly(step).collect()
      .map(r => r.getLong(1) / HR -> r.getDouble(3)).toMap
    assert(got(29L) > 99.0)              // deep in the step: ~constant
    assert(got(54L) == 0.0 && got(59L) == 0.0) // >=24h past the step
  }
}
