package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Skew-handling utilities. AQE's skew-join splitting covers sort-merge
  * joins at runtime; explicit salting remains the tool of choice when one
  * hot key dominates a shuffled join against a small-but-not-broadcastable
  * build side, or for aggregations (two-phase salted groupBy).
  */
object Skew {

  /** Salted equi-join: the probe (large, skewed) side gets a uniform salt
    * in [0, salts); the build side is replicated once per salt value. The
    * join key becomes (key, salt) so a hot key's rows spread across `salts`
    * reducers instead of one. Result is row-identical to the plain join.
    *
    * Cost model: build side payload ×salts (keep salts modest, 8–32);
    * probe side gains one narrow column. Worth it when the hot key's row
    * count ≫ rows/reducer; pointless (but harmless) otherwise.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: partial aggregate on (key, salt), then
    * final aggregate on key — caps any single reducer's input at
    * ~rows(hotkey)/salts. `partial` and `finalAgg` must form a decomposable
    * pair (e.g. count→sum, sum→sum, min→min). */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Estimated row count of the HOTTEST key, from a seeded sample: the
    * sampled per-key histogram is a keyed shuffle over only the sample,
    * and the driver fetch is one scalar (the max). Scaled back up by
    * 1/fraction. Hot keys are hot in every sample, so the estimate is
    * reliable exactly when it matters (a key big enough to hurt a reducer
    * cannot hide from a 1% sample); sub-threshold keys may jitter, but
    * both branches below are row-identical so a flipped borderline branch
    * is invisible in results. Row-level sampling is partition-seeded, so
    * the ESTIMATE (not the result) can vary across cluster shapes. */
  def estimatedHotKeyRows(df: DataFrame, key: String,
                          sampleFraction: Double = 0.01,
                          seed: Long = 42L): Long = {
    val s = if (sampleFraction >= 1.0) df
            else df.sample(withReplacement = false, sampleFraction, seed)
    val top = s.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c"))).head()
    if (top.isNullAt(0)) 0L
    else math.round(top.getLong(0) / math.min(1.0, sampleFraction))
  }

  /** Automatic salted fallback: probes the key histogram on a bounded
    * sample and picks the plain equi-join when no key is hot, the salted
    * join (build side ×salts) when one is. The threshold is in ESTIMATED
    * ROWS OF THE HOTTEST KEY — set it to a few × your target rows-per-
    * reducer (shuffle partition). Turns the r3 SkewSpec lesson (AQE skew
    * splitting is suppressed under an agg-above-join) into reusable code:
    * result is row-identical to `probe.join(build, key)` either way,
    * which SaltIfSkewedSpec's property test pins. */
  def saltIfSkewed(probe: DataFrame, build: DataFrame, key: String,
                   hotRowThreshold: Long, salts: Int = 16,
                   sampleFraction: Double = 0.01,
                   seed: Long = 42L): DataFrame =
    if (estimatedHotKeyRows(probe, key, sampleFraction, seed)
        > hotRowThreshold)
      saltedJoin(probe, build, key, salts)
    else probe.join(build, Seq(key))

  // ------------------------------------------------------------- queries --

  type Q = (SparkSession, String) => DataFrame

  /** Salted shuffle join, oracle'd against the PLAIN join SQL — the salt is
    * an execution-strategy detail that must be row-invisible, and the hash
    * match proves it. Probe = orders (big side), build = customer
    * replicated ×8; the downstream aggregate collapses the result so the
    * oracle stays small. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.orders(s, d)
    val build = Tables.customer(s, d)
      .withColumnRenamed("c_custkey", "o_custkey")
      .select(col("o_custkey"), col("c_mktsegment"))
    saltedJoin(probe, build, "o_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // +1e-6 round-boundary epsilon, both engines (repo convention for
        // money-magnitude sums)
        round(sum(col("o_totalprice")) + lit(1e-6), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Two-phase salted aggregation on the 3-value l_returnflag — exactly the
    * hot-key shape where a plain groupBy funnels 600 k rows into 3
    * reducers; the salt caps any reducer at ~rows/16. Oracle = the plain
    * GROUP BY count. */
  def aggSalted(s: SparkSession, d: String): DataFrame =
    saltedCount(Tables.lineitem(s, d), "l_returnflag", salts = 16)
      .orderBy("l_returnflag")

  val queries: Map[String, Q] = Map(
    "q_join_salted" -> joinSalted _,
    "q_agg_salted"  -> aggSalted _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_salted" ->
      """SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_orders,
                round(sum(o_totalprice) + 1e-6, 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_agg_salted" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}
