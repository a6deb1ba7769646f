package graft.plans

import graft.SparkSpec
import graft.rel.AsOf
import org.apache.spark.sql.functions._

/** The rung-(c) as-of operator vs rung (a) (union+window) vs a brute
  * model — three independent derivations of the same semantics. */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of == composed as-of on the events table") {
    val native = AsOf.joinAsOfNative(spark, sf).collect()
    val composed = AsOf.joinAsOf(spark, sf).collect()
    assert(native.length == composed.length && native.nonEmpty)
    assert(native.toSeq == composed.toSeq)
  }

  test("plan: AsOfJoinExec with planner-planted exchanges and sorts") {
    val df = AsOf.joinAsOfNative(spark, sf)
    val plan = planOf(df)
    assert(plan.contains("AsOfJoin"), plan.take(1500))
    // EnsureRequirements must have planted a hash exchange per side and
    // the (key, ts) sorts — the operator declares, the planner provides
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2,
      plan.take(2000))
    assert("\\+- Sort ".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("property: native == brute-force model on random inputs") {
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 5) {
      // small domains force every edge: ties, multi-band keys,
      // probe-before-any-build, keys on only one side
      val probe = Seq.fill(80)((rnd.nextInt(6).toLong,
        rnd.nextInt(20).toLong, rnd.nextInt(1000)))
        .distinct.toDF("k", "t", "payload")
      val build = Seq.fill(40)((rnd.nextInt(8).toLong,
        rnd.nextInt(20).toLong, rnd.nextInt(1000)))
        .distinct
        // one build value per (key, ts): the as-of "latest row" is
        // otherwise ambiguous under ties WITHIN the build side, which
        // the operator contract (like DuckDB's) does not define
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
        .toDF("bk", "bt", "bval")
      // MULTISET compare (sorted Seq + explicit length), not Set: a
      // duplicate-emission regression (e.g. a lookahead bug emitting a
      // probe twice) must fail, and Set would collapse it (round-7
      // advisory)
      val got = AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt")
        .select("k", "t", "payload", "bt", "bval")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3), r.getInt(4))).toSeq.sorted
      val b = build.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2)))
      val expect = probe.collect().toSeq.flatMap { r =>
        val (k, t, p) = (r.getLong(0), r.getLong(1), r.getInt(2))
        val cand = b.filter(x => x._1 == k && x._2 <= t)
        if (cand.isEmpty) None
        else {
          val best = cand.maxBy(_._2)
          Some((k, t, p, best._2, best._3))
        }
      }.sorted
      assert(got.length == expect.length,
        s"round $round: ${got.length} rows vs model ${expect.length}")
      assert(got == expect, s"round $round: ${got.diff(expect).take(3)} / " +
        s"${expect.diff(got).take(3)}")
    }
  }

  test("NULL key/ts never matches (SQL semantics), on either side") {
    // NULL probe key, NULL probe ts, NULL build key, NULL build ts —
    // each must be invisible to the join; the old exec unboxed NULL to
    // 0L and silently joined on key 0 (round-7 advisory)
    val probe = Seq[(Option[Long], Option[Long], String)](
      (Some(0L), Some(10L), "p_k0"),      // would collide with null-as-0L
      (None, Some(10L), "p_nullk"),
      (Some(1L), None, "p_nullt"),
      (Some(1L), Some(10L), "p_ok"))
      .toDF("k", "t", "tag")
    val build = Seq[(Option[Long], Option[Long], String)](
      (None, Some(5L), "b_nullk"),
      (Some(0L), None, "b_nullt"),
      (Some(1L), Some(5L), "b_ok"))
      .toDF("bk", "bt", "bv")
    val inner = AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt")
      .select("tag", "bv").collect().map(r => r.getString(0) -> r.getString(1))
      .toList.sorted
    // only the fully non-null pair joins; p_k0 must NOT pick up b_nullk
    // (null key) or b_nullt (null ts)
    assert(inner == List("p_ok" -> "b_ok"))
    val left = AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt",
        leftOuter = true)
      .select("tag", "bv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toList.sorted
    assert(left == List("p_k0" -> None, "p_nullk" -> None,
      "p_nullt" -> None, "p_ok" -> Some("b_ok")))
  }

  test("left-outer keeps unmatched probes null-padded; inner drops them") {
    val probe = Seq((1L, 10L, "hit"), (1L, 2L, "early"), (9L, 5L, "nokey"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 3L, "b3")).toDF("bk", "bt", "bv")
    val left = AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt",
        leftOuter = true)
      .select("tag", "bt", "bv").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1)),
        Option(r.getString(2)))).toList.sortBy(_._1)
    assert(left == List(
      ("early", None, None), ("hit", Some(3L), Some("b3")),
      ("nokey", None, None)))
  }

  test("tolerance bounds the match window; left+tolerance compose") {
    val probe = Seq((1L, 100L, "in"), (1L, 200L, "out"), (1L, 103L, "edge"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 98L, "b98")).toDF("bk", "bt", "bv")
    // tolerance 5: build at 98 matches probes in [98, 103]; probe 200 far
    def run(outer: Boolean) =
      AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt",
        leftOuter = outer, tolerance = Some(5L))
        .select("tag", "bv").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toList.sorted
    assert(run(false) == List("edge" -> Some("b98"), "in" -> Some("b98")))
    assert(run(true) == List("edge" -> Some("b98"), "in" -> Some("b98"),
      "out" -> None))
  }

  test("tie at equal timestamps matches; probe before any build drops") {
    val probe = Seq((1L, 10L, "p1"), (1L, 5L, "p0"), (2L, 3L, "p2"))
      .toDF("k", "t", "tag")
    val build = Seq((1L, 10L, "b10"), (1L, 6L, "b6"), (2L, 4L, "b4"))
      .toDF("bk", "bt", "bv")
    val got = AsOf.asOfJoinNative(probe, build, "k", "t", "bk", "bt")
      .select("tag", "bv").collect().map(r => r.getString(0) -> r.getString(1))
      .toMap
    // p1 at t=10 takes the EQUAL-ts build row (>= semantics); p0 at t=5
    // precedes every build row of key 1; p2 at t=3 precedes b4
    assert(got == Map("p1" -> "b10"))
  }
}
