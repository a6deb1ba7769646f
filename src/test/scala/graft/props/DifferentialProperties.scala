package graft.props

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Differential properties: Spark operators vs straightforward in-memory
  * Scala models on random inputs — the same oracle style the reference
  * used (scanpy vs scanpy_spark allclose), aimed at the operators whose
  * semantics have the most edge cases (as-of join, sessionization,
  * salted join). */
object DifferentialProperties extends Properties("graft.diff") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // ---- as-of join vs in-memory model ----------------------------------

  private val asofGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    probes <- Gen.listOf(Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
    builds <- Gen.listOf(Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 100L)))
  } yield (probes.distinct, builds.distinct)

  property("asOfJoin == per-probe max(build.ts <= probe.ts) model") =
    forAll(asofGen) { case (probes, builds) =>
      val p = probes.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "ts_us")
      val b = builds.toDF("user_id", "ts_us")
        .withColumn("built_us", $"ts_us")
      val got = graft.rel.AsOf
        .asOfJoin(p, b, "user_id", "ts_us", Map("built_us" -> "built_us"))
        .select("event_id", "built_us")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = probes.zipWithIndex.flatMap { case ((u, t), i) =>
        val priors = builds.filter { case (bu, bt) => bu == u && bt <= t }
        if (priors.isEmpty) None else Some(i.toLong -> priors.map(_._2).max)
      }.toMap
      got == want
    }

  // ---- batch sessionization vs in-memory model ------------------------

  /** (user, ts_us) over a ~5-minute span so a 1-minute gap splits often. */
  private val eventsGen: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 300000000L)))
      .map(_.distinct)

  property("sessionsBatch == fold-based gap-split model (gap=1min)") =
    forAll(eventsGen) { evs =>
      val gapUs = 60L * 1000000L
      val df = evs.zipWithIndex
        .map { case ((u, t), i) => (i.toLong, u, t) }
        .toDF("event_id", "user_id", "ts_us")
        .withColumn("ts", timestamp_micros($"ts_us")).drop("ts_us")
        .withColumn("value", lit(0.0))
      val got = graft.stream.Events.sessionsBatch(df, gapMinutes = 1)
        .select("user_id", "session_start_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = ts.foldLeft(List.empty[List[Long]]) {
          case (cur :: rest, t) if t - cur.head < gapUs =>
            (t :: cur) :: rest
          case (acc, t) => List(t) :: acc
        }.map(_.reverse).reverse
        sessions.map(sess => (u, sess.min, sess.length.toLong))
      }.toSet
      got == want
    }

  // ---- salted join vs plain join on random skew ------------------------

  property("saltedJoin == plain join for any key distribution") =
    forAll(Gen.listOf(Gen.choose(0L, 5L)), Gen.choose(1, 8)) { (keys, salts) =>
      val probe = keys.zipWithIndex.map { case (k, i) => (k, i.toLong) }
        .toDF("k", "payload")
      val build = (0L to 5L).map(k => (k, s"v$k")).toDF("k", "name")
      val plain = probe.join(build, Seq("k"))
        .select("k", "payload", "name").collect().map(_.toSeq).toSet
      val salted = graft.rel.Skew.saltedJoin(probe, build, "k", salts)
        .select("k", "payload", "name").collect().map(_.toSeq).toSet
      plain == salted
    }

  // ---- interval join vs in-memory model --------------------------------

  /** Seconds-granularity events over a ~3-hour span so the 1-hour window
    * boundary ([s, s+1h): inclusive start, EXCLUSIVE end) gets hit. */
  private val ijGen: Gen[(List[(Long, Long)], List[(Long, Long)])] = for {
    signups <- Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 10800L)))
    purchases <- Gen.listOf(Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 10800L)))
  } yield (signups.distinct, purchases.distinct)

  property("intervalJoinPairs == per-signup [s, s+1h) window model") =
    forAll(ijGen) { case (signups, purchases) =>
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
      val sgn = signups.zipWithIndex
        .map { case ((u, t), i) => (u, i.toLong, ts(t)) }
        .toDF("user_id", "signup_id", "s_ts")
      val pur = purchases.map { case (u, t) => (u, ts(t), 1.0) }
        .toDF("p_user", "p_ts", "value")
      val got = graft.stream.Events.intervalJoinPairs(sgn, pur)
        .select("signup_id", "p_ts")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSet
      val want = (for {
        ((su, st), i) <- signups.zipWithIndex
        (pu, pt) <- purchases
        if pu == su && pt >= st && pt < st + 3600L
      } yield (i.toLong, pt * 1000L)).toSet
      got == want
    }
}
