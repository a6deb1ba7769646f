package graft.stream

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class AcfSessionizeSpec extends SparkSpec {

  test("acf numerators match the brute-force definition over hourly counts") {
    val hourly = Tables.events(spark, sf)
      .groupBy(expr("ts_ns div 3600000000000").as("hb"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Acf.acf(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got.keySet == (1 to Acf.MaxLag).toSet)
    (1 to Acf.MaxLag).foreach { k =>
      val pairs = hourly.toSeq.flatMap { case (h, cx) =>
        hourly.get(h + k).map(cy => (cx, cy)) }
      val n = pairs.size.toLong
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val (gn, gnum, gdenx, _) = got(k)
      assert(gn == n)
      assert(gnum == n * sxy - sx * sy)
      assert(gdenx == n * sxx - sx * sx)
    }
  }

  test("acf lag-0 analogue sanity: den numerators are non-negative") {
    // n·Σx² − (Σx)² >= 0 by Cauchy–Schwarz; a negative value means an
    // overflow or a pairing bug
    Acf.acf(spark, sf).collect().foreach { r =>
      assert(r.getLong(3) >= 0L && r.getLong(4) >= 0L)
    }
  }

  test("sessionize: per-user event counts are conserved") {
    val sessions = Sessionize.sessionize(spark, sf)
    val perUserSessions = sessions.groupBy("user_id")
      .agg(sum("n_events").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUserEvents = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUserSessions == perUserEvents)
  }

  test("sessionize: closed-form gaps split exactly at >30min") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // replicate the operator's windows over a tiny literal frame to pin
    // the boundary: gap == 30min keeps the session, 30min+1us breaks it
    val us = Seq(0L, Sessionize.GapUs, Sessionize.GapUs * 2,
      Sessionize.GapUs * 3 + 1)
    val byUser = Window.partitionBy("user_id").orderBy("us")
    val got = us.map(u => (1L, u)).toDF("user_id", "us")
      .withColumn("brk",
        when($"us" - lag($"us", 1).over(byUser) > Sessionize.GapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum($"brk").over(byUser))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 3L, 1L -> 1L))
  }

  test("sessionize durations are non-negative and bounded by the span") {
    val bad = Sessionize.sessionize(spark, sf)
      .filter(col("duration_us") < 0).count()
    assert(bad == 0L)
  }
}
