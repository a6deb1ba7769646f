package graft.rel

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // probe: (event_id, user_id, ts_us) ; build: (user_id, ts_us, signup_us)
  private def run(probe: Seq[(Long, Long, Long)], build: Seq[(Long, Long)]) = {
    val p = probe.toDF("event_id", "user_id", "ts_us")
    val b = build.toDF("user_id", "ts_us")
      .withColumn("signup_us", $"ts_us")
    AsOf.asOfJoin(p, b, "user_id", "ts_us", Map("signup_us" -> "signup_us"))
      .select("event_id", "signup_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("picks the latest build row at or before the probe ts") {
    val got = run(
      probe = Seq((1L, 7L, 100L), (2L, 7L, 250L)),
      build = Seq((7L, 50L), (7L, 200L), (7L, 300L)))
    assert(got == Map(1L -> 50L, 2L -> 200L))
  }

  test("equal timestamps match (inclusive, DuckDB ASOF semantics)") {
    val got = run(probe = Seq((1L, 7L, 100L)), build = Seq((7L, 100L)))
    assert(got == Map(1L -> 100L))
  }

  test("probe rows with no prior build row are dropped (inner as-of)") {
    val got = run(
      probe = Seq((1L, 7L, 10L), (2L, 8L, 500L)),
      build = Seq((7L, 50L)))
    assert(got == Map.empty[Long, Long])
  }

  test("keys never cross-match") {
    val got = run(
      probe = Seq((1L, 7L, 100L)),
      build = Seq((8L, 50L)))
    assert(got.isEmpty)
  }

  test("sf0.001 asof output: signup <= purchase for every row") {
    val bad = AsOf.joinAsOf(spark, sf)
      .filter($"signup_us" > $"purchase_us").count()
    assert(bad == 0)
  }
}
