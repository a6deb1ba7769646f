package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric determinism conventions, shared by the Spark side
  * of every query AND (via the *Sql twins) the DuckDB oracle text, so the
  * two engines can never drift one query at a time.
  *
  * Two float-representation classes surfaced by the sf1 scale-up gate
  * (both invisible at sf0.1) are handled here:
  *
  *  1. **IEEE signed zero.** A sum that lands at a tiny negative and is
  *     then rounded prints `-0.0` in one engine and `0.0` in the other —
  *     a hash mismatch on equal values. `x + 0.0` collapses `-0.0` to
  *     `+0.0` (IEEE 754: `-0.0 + 0.0 = +0.0`) and is the identity on
  *     every other double. Use [[roundSigned]] on BOTH sides of every
  *     rounded-double output column.
  *
  *  2. **Money-sum accumulation order.** Summing millions of 2-dp doubles
  *     reaches magnitudes (~1e11 at sf1) where the result's last ulp
  *     exceeds a cent, so partial-aggregation order — which differs
  *     between engines AND between cluster sizes — shifts the 2-dp
  *     rounding by one cent. [[moneySum]] accumulates in DECIMAL
  *     instead: 2-dp sources cast exactly, decimal addition is
  *     associative/order-independent, so the sum is bit-equal in every
  *     engine at every scale and any partitioning — the money-aggregation
  *     pattern that survives 100 TB.
  */
object NumFmt {

  /** round to `dp` decimals, collapsing IEEE −0.0 to +0.0. */
  def roundSigned(c: Column, dp: Int): Column = round(c, dp) + lit(0.0)

  /** Oracle-SQL twin of [[roundSigned]] (DuckDB prints -0.0 too). */
  def roundSignedSql(expr: String, dp: Int): String =
    s"round($expr, $dp) + 0.0"

  /** Order-independent sum of dp-decimal money values: accumulate in
    * DECIMAL(18,`srcDp`) (exact for srcDp-decimal doubles), display at
    * `dp` as double.
    *
    * Scale-preserving (`dp == srcDp`): widen to DECIMAL(30,dp), cast to
    * double — both engines nearest-double the same exact decimal.
    *
    * Scale-REDUCING (`dp < srcDp`): the naive DECIMAL(30,dp) downcast is
    * a trap — DuckDB TRUNCATES decimal scale-downs (123.455 → 123.45,
    * even 123.4550001 → 123.45) while Spark rounds HALF_UP, so every
    * row whose dropped digits are nonzero disagrees by one display unit
    * (surfaced at sf10: q_sql_tpch_q1's 6-dp charge sums, all 6 groups
    * one cent apart). Instead: cast the EXACT decimal sum to double
    * (identical bits both engines) and apply the repo's shared
    * round(+1e-6) display convention to identical inputs. */
  def moneySum(c: Column, srcDp: Int, dp: Int): Column =
    if (dp == srcDp)
      sum(c.cast(s"decimal(18,$srcDp)")).cast(s"decimal(30,$dp)").cast("double")
    else
      round(sum(c.cast(s"decimal(18,$srcDp)")).cast("double") + lit(1e-6), dp)

  /** Oracle-SQL twin of [[moneySum]] — the same text runs on Spark SQL
    * and DuckDB, so SQL-mode queries can share one string. */
  def moneySumSql(expr: String, srcDp: Int, dp: Int): String =
    if (dp == srcDp)
      s"CAST(CAST(sum(CAST($expr AS DECIMAL(18,$srcDp))) AS DECIMAL(30,$dp)) AS DOUBLE)"
    else
      s"round(CAST(sum(CAST($expr AS DECIMAL(18,$srcDp))) AS DOUBLE) + 1e-6, $dp)"
}
