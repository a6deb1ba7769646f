package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (see TESTDATA.md /
  * FIXTURES.md).
  *
  * Mirrors the reference's source layer (`zarr_spark.py` chunk readers —
  * reference repo lasersonlab/single-cell-experiments; mount empty at build
  * time, see SURVEY.md §0): there, 1 Zarr chunk = 1 RDD partition. Here the
  * equivalent is Parquet row-group splits = input partitions, handled by
  * Spark's vectorized DSv2 reader — predicate pushdown and column pruning
  * come for free and matter at 100 TB (only referenced columns are read).
  */
object Tables {
  val relationalTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val extensionTables: Seq[String] = Seq("events", "documents", "embeddings")

  private def path(dir: String, name: String) = s"$dir/$name.parquet"

  /** Plain parquet load for every table except `events`. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(name != "events", "use Tables.events (ns-timestamp handling)")
    spark.read.parquet(path(dir, name))
  }

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Rechunk (reference R11, zarr_spark.py::repartition_chunks): with
    * Parquet + AQE this is just an explicit repartition — hash for balanced
    * chunks, range when downstream wants clustered writes. */
  def rechunk(df: DataFrame, n: Int, rangeBy: Option[String] = None): DataFrame =
    rangeBy match {
      case Some(c) => df.repartitionByRange(n, col(c))
      case None    => df.repartition(n)
    }

  /** `events.parquet` has shipped with THREE physical types for `ts` across
    * testdata generations: TIMESTAMP(NANOS) (surfaces as BIGINT nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`), TIMESTAMP(MICROS) with
    * isAdjustedToUTC=true (surfaces as TimestampType), and TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (surfaces as TimestampNTZType —
    * `spark.sql.parquet.inferTimestampNTZ.enabled` defaults true in Spark 4).
    * This loader inspects the loaded schema and normalizes every shape to
    * the same two columns:
    *   ts    TIMESTAMP (microsecond precision, session-local = UTC)
    *   ts_ns BIGINT    (epoch nanos, exact ordering key; DuckDB epoch_ns(ts)
    *                    parity — the TIMESTAMP column alone truncates)
    * The NTZ→LTZ cast interprets the wall-clock in the session timezone;
    * both the gate and bench sessions pin UTC, so values are preserved
    * exactly. Session timezone must be UTC for oracle parity.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(path(d, "events"))
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long generation
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // micros, isAdjustedToUTC=false
        val ltz = raw.withColumn("ts", col("ts").cast(TimestampType))
        ltz.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case TimestampType => // micros, isAdjustedToUTC=true
        raw.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts has unexpected dataType $other — a fourth testdata " +
            "generation? Extend Tables.events to normalize it.")
    }
  }
}
