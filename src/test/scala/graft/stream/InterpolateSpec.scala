package graft.stream

import graft.SparkSpec

/** Planted-gap fixtures through TimeSeries.interpolateGrid — the fill
  * stage q_ts_interpolate runs over the dense hourly grid. */
class InterpolateSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // one hour in micros

  test("gap cells take the straight line between bracketing observations") {
    // observed at h0 (=10.0) and h3 (=16.0); h1, h2 are gaps
    val g = Seq(
      ("a", 0L * H, Some(1L), Some(10.0)),
      ("a", 1L * H, None, None),
      ("a", 2L * H, None, None),
      ("a", 3L * H, Some(2L), Some(16.0)))
      .toDF("event_type", "hour_us", "n", "av")
    val out = TimeSeries.interpolateGrid(g).collect()
      .map(r => r.getLong(1) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(0L) === Some(10.0))
    assert(out(1L * H) === Some(12.0))
    assert(out(2L * H) === Some(14.0))
    assert(out(3L * H) === Some(16.0))
  }

  test("edges stay NULL: nothing to bracket before first / after last") {
    val g = Seq(
      ("a", 0L * H, None, Option.empty[Double]),
      ("a", 1L * H, Some(1L), Some(5.0)),
      ("a", 2L * H, None, None))
      .toDF("event_type", "hour_us", "n", "av")
    val out = TimeSeries.interpolateGrid(g).collect()
      .map(r => r.getLong(1) -> Option(r.get(3))).toMap
    assert(out(0L) === None)
    assert(out(1L * H) === Some(5.0))
    assert(out(2L * H) === None)
  }

  test("series are independent: one series' observations never bleed " +
    "into another's gaps") {
    val g = Seq(
      ("a", 0L * H, Some(1L), Some(1.0)),
      ("a", 1L * H, None, None),
      ("a", 2L * H, Some(1L), Some(3.0)),
      ("b", 0L * H, Some(1L), Some(100.0)),
      ("b", 1L * H, None, None),
      ("b", 2L * H, Some(1L), Some(200.0)))
      .toDF("event_type", "hour_us", "n", "av")
    val out = TimeSeries.interpolateGrid(g).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(out(("a", 1L * H)) === 2.0)
    assert(out(("b", 1L * H)) === 150.0)
  }
}
