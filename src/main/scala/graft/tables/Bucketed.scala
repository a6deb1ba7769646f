package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-shuffled) tables — the storage-level join optimization
  * this repo's scale notes keep invoking: when two tables are bucketed
  * and sorted on the join key into the same bucket count, the join needs
  * NO exchange at read time; each task zips bucket i of both sides. At
  * 100 TB this converts the biggest shuffle in the workload (fact-to-
  * dimension equi-join) into a co-located merge — this module is the
  * in-repo proof, with the exchange-free plan asserted in BucketedSpec.
  *
  * Scaffolding: the bucketed FILES are a once-per-sfDir Fixtures.cached
  * artifact (bucket ids live in Spark's part-file names, so the layout
  * survives the writing session); each session then registers external
  * CLUSTERED BY tables over the existing files — bucket METADATA is
  * catalog-level, so registration is a metadata-only DDL, not a rewrite.
  * One shared copy across Verify/Bench/test JVMs in a container, exactly
  * like a real deployment writing bucketed tables once at ingest. */
object Bucketed {
  type Q = (SparkSession, String) => DataFrame

  val Buckets = 8

  /** Ensure bucketed twins of orders/customer exist in this session's
    * catalog; returns their table names. */
  def ensure(s: SparkSession, d: String): (String, String) = synchronized {
    val key = d.replaceAll("[^A-Za-z0-9]", "_")
    val (to, tc) = (s"orders_buck_$key", s"customer_buck_$key")
    def writeBucketed(df: DataFrame, bucketKey: String, path: String): Unit = {
      // bucketBy is only reachable through saveAsTable, so write via a
      // scratch catalog name and drop it — DROP on an external table
      // keeps the files. repartition onto the bucket key first so each
      // bucket is ONE file per side — that is what lets the sorted-scan
      // path skip the Sort as well as the Exchange.
      val scratch = s"graft_buck_build_${bucketKey}_$key"
      df.repartition(Buckets, col(bucketKey))
        .write.bucketBy(Buckets, bucketKey).sortBy(bucketKey)
        .option("path", path).mode("overwrite").saveAsTable(scratch)
      s.sql(s"DROP TABLE $scratch")
    }
    // the fixture tag encodes the bucket count: changing Buckets must
    // miss the old cached layout, never register N-bucket metadata over
    // M-bucket files (silent wrong-bucket reads under pruning)
    val base = graft.tables.Fixtures.cached(s"buck$Buckets", "tables", d) { dir =>
      writeBucketed(Tables.orders(s, d), "o_custkey", s"$dir/orders")
      writeBucketed(Tables.customer(s, d), "c_custkey", s"$dir/customer")
    } { dir =>
      // one file per bucket per side (the repartition guarantees it)
      def nFiles(sub: String) = Option(new java.io.File(dir, sub).listFiles())
        .map(_.count(f => f.getName.startsWith("part-"))).getOrElse(0)
      nFiles("orders") == Buckets && nFiles("customer") == Buckets
    }
    def register(name: String, df: DataFrame, bucketKey: String,
                 path: String): Unit =
      if (!s.catalog.tableExists(name))
        s.sql(
          s"""CREATE TABLE $name (${df.schema.toDDL}) USING PARQUET
              CLUSTERED BY ($bucketKey) SORTED BY ($bucketKey)
              INTO $Buckets BUCKETS LOCATION '$path'""")
    register(to, Tables.orders(s, d), "o_custkey", s"$base/orders")
    register(tc, Tables.customer(s, d), "c_custkey", s"$base/customer")
    (to, tc)
  }

  /** Revenue per market segment through the bucketed join — the same
    * answer as the plain-parquet join (bucketing is physical layout, not
    * semantics), which is exactly what the oracle checks. */
  def joinBucketed(s: SparkSession, d: String): DataFrame = {
    val (to, tc) = ensure(s, d)
    s.table(to).join(s.table(tc), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")) + lit(1e-6), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, Q] = Map(
    "q_join_bucketed" -> joinBucketed _,
  )

  val oracle: Map[String, String] = Map(
    "q_join_bucketed" ->
      """SELECT c_mktsegment, CAST(count(1) AS BIGINT) AS n_orders,
                round(sum(o_totalprice) + 1e-6, 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
  )
}
