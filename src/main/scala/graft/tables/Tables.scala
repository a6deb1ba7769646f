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

  /** `events.parquet` stores TIMESTAMP(NANOS); Spark 4.x refuses the read
    * unless `spark.sql.legacy.parquet.nanosAsLong=true`, under which `ts`
    * surfaces as BIGINT nanoseconds. We set the conf here (the Verify/Bench
    * harness sessions do not set it) and convert to a proper TIMESTAMP at
    * microsecond precision. Session timezone must be UTC for oracle parity.
    */
  /** Rechunk (reference R11, zarr_spark.py::repartition_chunks): with
    * Parquet + AQE this is just an explicit repartition — hash for balanced
    * chunks, range when downstream wants clustered writes. */
  def rechunk(df: DataFrame, n: Int, rangeBy: Option[String] = None): DataFrame =
    rangeBy match {
      case Some(c) => df.repartitionByRange(n, col(c))
      case None    => df.repartition(n)
    }

  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(path(d, "events"))
      // keep the raw nanos (ts_ns) for exact ordering/compare against the
      // oracle's epoch_ns(ts) — the TIMESTAMP column truncates to micros.
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
