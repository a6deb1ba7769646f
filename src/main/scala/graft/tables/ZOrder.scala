package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: the multi-dimensional generalization of
  * the Sorted layout. Interleaving the bits of two band columns into one
  * sort key places rows close in BOTH dimensions into the same row
  * groups, so each column's independent min/max footer stats become
  * selective — a predicate on EITHER dimension (or both) skips row
  * groups, where a plain sort only ever serves its own leading column.
  * This is the standard lakehouse layout for fact tables with two hot
  * filter dimensions (time × entity); the z-value is layout-only and is
  * dropped at read time.
  *
  * The interleave is a pure codegen'd bit expression (fold of
  * shift/mask/or — no UDF), computed once per row at WRITE time: the
  * one-off range exchange on the z-value is the entire cost, and it
  * buys stats-based skipping on every later read. ZOrderSpec measures
  * the contrast: a partkey-only predicate reads a small fraction of the
  * z-layout but (nearly) all of the date-sorted layout.
  */
object ZOrder {
  type Q = (SparkSession, String) => DataFrame

  /** Bit-interleave two non-negative band columns (a in even positions,
    * b in odd) — the Morton code. `bits` per input, 2*bits out. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Day index of the NTZ shipdate — the DATE-derived band (see Sorted:
    * NTZ itself cannot drive parquet skipping; an integer day index
    * both skips and interleaves cleanly). */
  private def shipDayIndex: Column =
    datediff(to_date(col("l_shipdate")), lit("1995-01-01").cast("date"))
      .cast("long")

  /** Normalize a column to a [0, 2^bits) band via its min/max — the
    * write-time stats step every z-order implementation runs first.
    * Raw interleaving would let the wider dimension's high bits drown
    * the narrower one's (measured: day index spans ~12 bits vs ~8 for
    * partkey at sf0.001 → the z-sort degenerates to day-major and a
    * partkey slice reads 6000/6000); equal-width bands give each
    * dimension the same say in every bit position. */
  def band(v: Column, min: Long, max: Long, bits: Int): Column = {
    val span = math.max(1L, max - min + 1)
    least(lit((1 << bits) - 1),
      ((v - lit(min)) * lit(1L << bits) / lit(span)).cast("long"))
  }

  /** One-time z-ordered rewrite of lineitem over (ship day × partkey):
    * collect the two dimensions' min/max (one 4-value aggregate — the
    * bounded stats-to-driver class), band both to 8 bits, range-
    * partition + sort by the 16-bit Morton code, drop it, write. The
    * band columns ship with the data; the z-value does not need to. */
  def fixture(s: SparkSession, sfDir: String): String =
    Fixtures.cached("zorder2", "lineitem_zorder", sfDir) { dir =>
      val withDay = Tables.lineitem(s, sfDir).withColumn("ship_day", shipDayIndex)
      val r = withDay.agg(min("ship_day"), max("ship_day"),
        min("l_partkey"), max("l_partkey")).head()
      withDay
        .withColumn("__z", interleaveBits(
          band(col("ship_day"), r.getLong(0), r.getLong(1), 8),
          band(col("l_partkey"), r.getLong(2), r.getLong(3), 8), 8))
        .repartitionByRange(16, col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(dir.toString)
    }()

  /** Entity-slice query over the z-layout: a partkey band with NO time
    * predicate — the dimension a time-sorted layout cannot skip on.
    * Row-group partkey stats are tight under z-ordering, so the scan
    * reads only the matching bands (metric-asserted in ZOrderSpec).
    * Oracle recomputes from the unsorted original. */
  def scanZOrder(s: SparkSession, d: String): DataFrame =
    Tables.readParquet(s, fixture(s, d))
      .filter(col("l_partkey") <= 25)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"))
      .orderBy("l_partkey")

  val queries: Map[String, Q] = Map(
    "q_scan_zorder" -> scanZOrder _,
  )

  val oracle: Map[String, String] = Map(
    "q_scan_zorder" ->
      """SELECT l_partkey, CAST(count(1) AS BIGINT) AS n_items,
                round(sum(l_quantity) + 1e-6, 2) AS sum_qty
         FROM lineitem WHERE l_partkey <= 25
         GROUP BY l_partkey ORDER BY l_partkey""",
  )
}
