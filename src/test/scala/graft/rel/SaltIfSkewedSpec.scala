package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The saltIfSkewed contract: branch choice follows the sampled hot-key
  * estimate, and BOTH branches are row-identical to the plain join — the
  * salt is an execution detail that may never change results. */
class SaltIfSkewedSpec extends SparkSpec {
  import spark.implicits._

  // 1 hot key (90 %) + a uniform tail — the shape AQE's skew split
  // handles for bare joins but not under an agg-above-join
  private def skewed = spark.range(0, 20000)
    .select((when(col("id") % 10 < 9, 1L).otherwise(col("id") % 1000))
      .as("k"), (col("id") * 7 % 97).as("x"))

  private def uniform = spark.range(0, 20000)
    .select((col("id") % 1000).as("k"), (col("id") * 7 % 97).as("x"))

  private def dim = spark.range(0, 1000)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

  test("hot-key estimate separates skewed from uniform input") {
    // skewed: ~18k rows on key 1 → estimate far above the uniform ~20/key
    val hot = Skew.estimatedHotKeyRows(skewed, "k", sampleFraction = 0.1)
    val flat = Skew.estimatedHotKeyRows(uniform, "k", sampleFraction = 0.1)
    assert(hot > 10000, s"hot estimate $hot")
    assert(flat < 1000, s"uniform estimate $flat")
  }

  test("skewed input takes the salted branch; result equals the plain join") {
    val out = Skew.saltIfSkewed(skewed, dim, "k",
      hotRowThreshold = 2000, salts = 8, sampleFraction = 0.1)
    // branch check: the salted join's condition carries __salt into the
    // optimized plan (the output column itself is dropped)
    assert(out.queryExecution.optimizedPlan.toString.contains("__salt"))
    val plain = skewed.join(dim, Seq("k"))
    assert(out.count() == plain.count())
    val diff = out.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("sx"))
      .except(plain.groupBy("k").agg(count(lit(1)).as("n"), sum("x").as("sx")))
    assert(diff.isEmpty)
  }

  test("uniform input takes the plain branch") {
    val out = Skew.saltIfSkewed(uniform, dim, "k",
      hotRowThreshold = 2000, salts = 8, sampleFraction = 0.1)
    assert(!out.queryExecution.optimizedPlan.toString.contains("__salt"))
    assert(out.count() == uniform.join(dim, Seq("k")).count())
  }

  test("empty probe estimates 0 and joins plain") {
    val empty = skewed.filter(lit(false))
    assert(Skew.estimatedHotKeyRows(empty, "k", 1.0) == 0L)
    assert(Skew.saltIfSkewed(empty, dim, "k", 1L).count() == 0L)
  }
}
