package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** PII scrubbing — the anonymization pass a training-data pipeline runs
  * before a corpus leaves its trust boundary (north-star extension; the
  * reference repo processes expression matrices, not identities). Three
  * standard techniques over the customer table, all pure per-row
  * expressions:
  *
  *  - pseudonymization: a keyed-hash surrogate for the direct identifier
  *    (md5 here; a production run would use a salted/keyed hash so the
  *    pseudonym can't be dictionary-reversed — the salt is a config
  *    concern, the plan shape is identical);
  *  - redaction: digit runs replaced by a sentinel token, with an audit
  *    count of how many digits were masked;
  *  - generalization (k-anonymity style): the quasi-identifier
  *    `c_acctbal` coarsened to a 1000-wide band.
  *
  * Scale shape: a single narrow projection — no shuffle, no UDF, fully
  * whole-stage-codegen (md5 / regexp_replace / floor are all native
  * expressions). At 100 TB this runs at scan speed with column pruning
  * reading only the 4 referenced columns.
  */
object Privacy {
  type Q = (SparkSession, String) => DataFrame

  def piiMask(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("name_pseudo"),
        regexp_replace(col("c_name"), "[0-9]+", "<ID>").as("name_redacted"),
        length(regexp_replace(col("c_name"), "[^0-9]", "")).as("n_digits"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .orderBy("c_custkey")

  /** k-anonymity audit over the quasi-identifier pair
    * (c_nationkey, bal_band): every combination's population, whether
    * it breaks k = 50 (re-identifiable: an attacker who knows a
    * target's nation + balance band narrows to < k candidates), and
    * how many rows the band must absorb to heal (k - n). This is the
    * audit that decides which bands [[piiMask]]'s generalization must
    * widen. Scale shape: ONE keyed aggregation on the quasi-identifier
    * — the grouping domain is (nations × bands), tiny by construction,
    * and the scan reads two columns. */
  val KAnon = 50
  def kAnonAudit(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "bal_band")
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("bal_band"), col("n"),
        (col("n") < KAnon).as("at_risk"),
        greatest(lit(KAnon.toLong) - col("n"), lit(0L)).as("deficit"))
      .orderBy("c_nationkey", "bal_band")

  val queries: Map[String, Q] = Map(
    "q_pii_mask" -> piiMask _,
    "q_privacy_kanon" -> kAnonAudit _,
  )

  val oracle: Map[String, String] = Map(
    "q_privacy_kanon" ->
      s"""SELECT c_nationkey,
                CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
                CAST(count(1) AS BIGINT) AS n,
                count(1) < $KAnon AS at_risk,
                greatest($KAnon - count(1), 0) AS deficit
         FROM customer
         GROUP BY 1, 2 ORDER BY 1, 2""",
    // DuckDB regexp_replace is first-match-only without the 'g' flag;
    // Spark's replaces all occurrences, so the flag is load-bearing.
    "q_pii_mask" ->
      """SELECT c_custkey,
                md5(c_name) AS name_pseudo,
                regexp_replace(c_name, '[0-9]+', '<ID>', 'g')
                  AS name_redacted,
                CAST(length(regexp_replace(c_name, '[^0-9]', '', 'g'))
                  AS INT) AS n_digits,
                CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS bal_band,
                c_mktsegment
         FROM customer ORDER BY c_custkey""",
  )
}
