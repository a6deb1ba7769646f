package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library's front door: one import gives a correctly-configured
  * session and the full query surface.
  *
  * {{{
  * val spark = graft.Graft.session()             // local dev
  * val docs  = graft.tables.Tables.documents(spark, dataDir)
  * graft.SparkEntry.queries("q_dedup_exact")(spark, dataDir).show()
  * }}}
  *
  * On a real cluster, skip `session()` and add the same settings to an
  * existing builder / spark-submit:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (native cosine_sim + ExactMedian), UTC session timezone (the oracle
  * convention every operator's rounding assumes), and
  * `spark.sql.legacy.parquet.nanosAsLong=true` if the data carries
  * nanosecond timestamps (the Tables loaders set it per-read too).
  * Shuffle partitions are a per-deployment choice — size to cores at
  * small scale, to data volume under AQE at large.
  */
object Graft {

  /** A session with the library's recommended local configuration:
    * extensions installed, UTC, AQE on, shuffle width = default
    * parallelism (not the 200 default that makes laptop runs
    * shuffle-bound). Idempotent via getOrCreate — and because
    * getOrCreate returns any PRE-existing session (whose static confs,
    * including spark.sql.extensions, can no longer change), the native
    * functions are also registered directly on the returned session so
    * the one-call contract holds either way. */
  def session(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    shufflePartitions.foreach(n =>
      b.config("spark.sql.shuffle.partitions", n.toString))
    val s = b.getOrCreate()
    if (shufflePartitions.isEmpty)
      s.conf.set("spark.sql.shuffle.partitions",
        s.sparkContext.defaultParallelism.toString)
    functions.GraftFunctions.register(s)
    s
  }

  /** The full declared query surface (SURVEY §2 contract). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SparkEntry.queries

  /** Run one declared query by id against a testdata-layout directory. */
  def run(name: String, spark: SparkSession, dataDir: String): DataFrame =
    SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query id '$name' — valid ids: " +
          SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))(
      spark, dataDir)
}
