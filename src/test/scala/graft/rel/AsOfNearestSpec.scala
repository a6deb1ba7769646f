package graft.rel

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class AsOfNearestSpec extends SparkSpec {

  test("nearest == brute-force min |delta| with earlier-signup tiebreak") {
    val ev = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
      .select("event_id", "user_id", "event_type", "us").collect()
    val signups = ev.filter(_.getString(2) == "signup")
      .groupBy(_.getLong(1))
      .map { case (u, rs) => u -> rs.map(_.getLong(3)).sorted }
    val want = ev.filter(_.getString(2) == "purchase").flatMap { r =>
      signups.get(r.getLong(1)).map { ss =>
        val p = r.getLong(3)
        val best = ss.minBy(s => (math.abs(p - s), s))
        (r.getLong(0), r.getLong(1), p, best)
      }
    }.sortBy(_._1).toSeq
    val got = AsOf.joinAsOfNearest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want && got.nonEmpty)
  }

  test("nearest matches backward as-of whenever a prior signup is nearer") {
    val backward = AsOf.joinAsOf(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val nearest = AsOf.joinAsOfNearest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    nearest.foreach { case (eid, p, s) =>
      backward.get(eid).foreach { b =>
        // the nearest match can never be FARTHER than the backward match
        assert(math.abs(p - s) <= math.abs(p - b))
      }
    }
  }

  test("nearest plans ONE exchange+sort feeding both window frames") {
    val plan = planOf(AsOf.joinAsOfNearest(spark, sf))
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    // one shuffle for the union'd window input (plus the final orderBy's
    // range exchange, which is not a hash partitioning)
    assert(exchanges == 1, plan.take(2000))
  }
}
