package graft.rel

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

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
}
