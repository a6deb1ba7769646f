package graft.rel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** EXACT distinct counting via fixed-size bitmaps — the
  * re-aggregatable alternative to `count(DISTINCT ...)` for pipelines
  * that maintain rollups incrementally: a `count(DISTINCT)` partial
  * cannot be merged with tomorrow's batch, but a bitmap partial can
  * (bitwise OR), which is why warehouse rollup tables store bitmaps.
  * Spark 4 ships the primitives (`bitmap_bucket_number` /
  * `bitmap_bit_position` / `bitmap_construct_agg` / `bitmap_count`),
  * and this query is the canonical two-level plan over them.
  *
  * Scale shape: level 1 groups by (group, bucket) — each bucket covers
  * 32768 ids so the per-group state is a fixed 4 KB bitmap, built with
  * map-side partial aggregation (bitmaps OR-combine before the
  * exchange); level 2 sums the per-bucket cardinalities per group.
  * Both levels are keyed shuffles with bounded state — unlike
  * `count(DISTINCT)`, which Spark plans as an expand + two exchanges
  * carrying every distinct value. The exactness contract is proven by
  * the `count(DISTINCT)` DuckDB oracle on every gate run. */
object BitmapAgg {
  type Q = (SparkSession, String) => DataFrame

  def bitmapDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"),
        expr("bitmap_bucket_number(o_custkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
        .as("bm"))
      .groupBy("o_orderpriority")
      .agg(sum(expr("bitmap_count(bm)")).as("n_cust"))
      .orderBy("o_orderpriority")

  /** HyperLogLog registers + estimate, DETERMINISTIC and cross-engine
    * reproducible — unlike `approx_count_distinct` (whose xxhash64
    * sketch only Spark can build, hence that query's rows-only
    * contract), this HLL derives every register from the md5-hex→int
    * hash BOTH engines can compute, so the full sketch state and the
    * estimate are hash-verified against DuckDB rebuilding them from
    * first principles. m=1024 buckets: bucket = h mod m, rho = leading
    * -zero rank of the remaining 50 bits via `51 − length(bin(w))`
    * (integer-exact in both engines — no float log2 off-by-one at
    * powers of two). The register sum is emitted at fixed-point scale
    * 2^51 (Σ 2^(51−Mj) ≤ 2^61, exact BIGINT), which IS the sketch's
    * sufficient statistic: two partitions' registers merge by max, the
    * warehouse-mergeable property the sketch exists for.
    *
    * Scale shape: one keyed agg to (group, bucket) registers — 1024
    * fixed rows per group, map-side max-combine — plus a broadcast
    * spine join for empty buckets; the raw stream is touched once. */
  def hllDistinct(s: SparkSession, d: String): DataFrame = {
    val m = 1024
    val h = graft.llm.Dedup.md5Hash60(
      concat(lit("hll:"), col("o_custkey").cast("string")))
    val regs = Tables.orders(s, d)
      .select(col("o_orderpriority"), (h % m).as("j"),
        expr(s"(${hSql("o_custkey")}) div $m").as("w"))
      .withColumn("rho",
        when(col("w") === 0, 51).otherwise(lit(51) - length(bin(col("w")))))
      .groupBy("o_orderpriority", "j")
      .agg(max(col("rho")).as("mj"))
    val spine = Tables.orders(s, d).select("o_orderpriority").distinct()
      .crossJoin(s.range(m).select(col("id").as("j")))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(1024.0))
    // (no broadcast hint: Spark cannot broadcast the LEFT side of a
    // left join; both frames are group×1024-sized anyway)
    spine.join(regs, Seq("o_orderpriority", "j"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
      .groupBy("o_orderpriority")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), 51 - mj)")).as("reg_sum"),
        sum(when(col("mj") === 0, 1L).otherwise(0L)).as("v0"))
      .withColumn("raw_est",
        alpha * lit(1048576.0) * lit(2251799813685248.0) / col("reg_sum"))
      // small-range (linear counting) correction, Flajolet et al. §4:
      // raw HLL is biased high when most buckets are empty. ln() is the
      // one non-algebraic op in the pipeline — a 1-ulp libm difference
      // between engines could in principle flip the 2-dp HALF_UP
      // boundary, but only if 1024·ln(1024/V) (V ∈ 1..1024, a finite
      // set) lands within ~1e-13 of a boundary the +1e-9 nudge didn't
      // clear — none of the 1024 values does.
      .select(col("o_orderpriority"), col("reg_sum"), col("v0"),
        round(when(col("raw_est") <= lit(2560.0) && col("v0") > 0,
          lit(1024.0) * log(lit(1024.0) / col("v0")))
          .otherwise(col("raw_est")) + lit(1e-9), 2).as("hll_est"))
      .orderBy("o_orderpriority")
  }

  /** The md5Hash60 expression as Spark SQL text (for the `div`). */
  private def hSql(c: String): String =
    s"conv(substring(md5(concat('hll:', CAST($c AS STRING))), 1, 15), 16, 10)"

  /** Distinct-set ALGEBRA on bitmaps — |A|, |B|, |A∪B| directly from
    * per-bucket bitmaps (union = the same `bitmap_construct_agg` over
    * BOTH slices), |A∩B| and |A\B| by inclusion–exclusion. This is how
    * a rollup store answers "customers active in BOTH years" without a
    * distinct-join: three mergeable counters instead of a shuffle of
    * the raw id sets. A = custkeys ordering in 1995, B = 1996.
    *
    * Scale shape: one scan of the filtered fact slice, keyed agg to
    * (slice, bucket) bitmaps (fixed 4 KB state, map-side OR-combine),
    * then bucket-level counts reduce to ONE row. Exactness of the
    * derived set sizes is proven by the INTERSECT/EXCEPT count
    * oracle. */
  def bitmapSetOps(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr").isin(1995, 1996))
    def cnt(df: DataFrame): DataFrame = df
      .groupBy(expr("bitmap_bucket_number(o_custkey)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))")
        .as("bm"))
      .agg(sum(expr("bitmap_count(bm)")).as("n"))
    val a = cnt(o.filter(col("yr") === 1995))
    val b = cnt(o.filter(col("yr") === 1996))
    val u = cnt(o) // union: same agg over both slices at once
    a.select(col("n").as("n_a"))
      .crossJoin(b.select(col("n").as("n_b")))
      .crossJoin(u.select(col("n").as("n_union")))
      .select(col("n_a"), col("n_b"), col("n_union"),
        (col("n_a") + col("n_b") - col("n_union")).as("n_both"),
        (col("n_union") - col("n_b")).as("n_only_a"))
  }

  val queries: Map[String, Q] = Map(
    "q_agg_bitmap_distinct" -> bitmapDistinct _,
    "q_agg_bitmap_setops" -> bitmapSetOps _,
    "q_agg_hll" -> hllDistinct _)

  val oracle: Map[String, String] = Map(
    "q_agg_bitmap_distinct" ->
      """SELECT o_orderpriority,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_agg_bitmap_setops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE year(o_orderdate) = 1995),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1996),
         u AS (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b),
         i AS (SELECT o_custkey FROM a INTERSECT
               SELECT o_custkey FROM b),
         oa AS (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
         SELECT CAST((SELECT count(*) FROM a) AS BIGINT) AS n_a,
                CAST((SELECT count(*) FROM b) AS BIGINT) AS n_b,
                CAST((SELECT count(*) FROM u) AS BIGINT) AS n_union,
                CAST((SELECT count(*) FROM i) AS BIGINT) AS n_both,
                CAST((SELECT count(*) FROM oa) AS BIGINT) AS n_only_a""",
    // DuckDB REBUILDS the identical sketch: same md5-derived buckets,
    // same integer rho, same fixed-point register sum, same estimate
    // arithmetic (e0 literals force DOUBLE, not DECIMAL, so the IEEE
    // operations match Spark's bit for bit)
    "q_agg_hll" ->
      """WITH h AS (
           SELECT o_orderpriority,
                  CAST(('0x' || substr(md5('hll:' ||
                    CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
           FROM orders),
         r AS (
           SELECT o_orderpriority, hv % 1024 AS j,
                  CASE WHEN hv // 1024 = 0 THEN 51
                       ELSE 51 - length(bin(hv // 1024)) END AS rho
           FROM h),
         regs AS (
           SELECT o_orderpriority, j, max(rho) AS mj
           FROM r GROUP BY o_orderpriority, j),
         spine AS (
           SELECT DISTINCT o_orderpriority, CAST(range AS BIGINT) AS j
           FROM orders CROSS JOIN range(1024)),
         filled AS (
           SELECT s.o_orderpriority, coalesce(regs.mj, 0) AS mj
           FROM spine s LEFT JOIN regs
             ON regs.o_orderpriority = s.o_orderpriority AND regs.j = s.j),
         sums AS (
           SELECT o_orderpriority,
                  CAST(sum(CAST(1 AS BIGINT) << (51 - mj)) AS BIGINT)
                    AS reg_sum,
                  CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS v0
           FROM filled GROUP BY o_orderpriority),
         est AS (
           SELECT o_orderpriority, reg_sum, v0,
                  0.7213e0 / (1.0e0 + 1.079e0 / 1024.0e0)
                    * 1048576.0e0 * 2251799813685248.0e0 / reg_sum
                    AS raw_est
           FROM sums)
         SELECT o_orderpriority, reg_sum, v0,
                round(CASE WHEN raw_est <= 2560.0e0 AND v0 > 0
                           THEN 1024.0e0 * ln(1024.0e0 / v0)
                           ELSE raw_est END + 1e-9, 2) AS hll_est
         FROM est ORDER BY o_orderpriority""")
}
