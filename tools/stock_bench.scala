// Stock-Spark twin of the BASELINE.md headline queries, for scale-up gates.
// Replicates the BASELINE.md methodology (stock Spark 4.1.2 session — NO
// graft extensions, NO tuned codegen cache — median of 3 warm runs after one
// warm-up, collect() timed) at an arbitrary SF dir:
//
//   /opt/spark/bin/spark-shell --master 'local[4]' \
//     --conf spark.sql.shuffle.partitions=4 \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.ui.enabled=false \
//     -I tools/stock_bench.scala  # dir from STOCK_SF_DIR env (default sf0.1)
//
// Queries are the 9 BASELINE.md shapes, written as a user would write them
// on stock Spark (plain DataFrame API, no library code) with semantics
// identical to the graft ids they twin.
{
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  val d = sys.env.getOrElse("STOCK_SF_DIR", "/root/testdata/sf0.1")
  def t(n: String): DataFrame = spark.read.parquet(s"$d/$n.parquet")
  // current testdata generation: ts is TIMESTAMP_NTZ micros; normalize like
  // Tables.events so window()/date arithmetic behaves identically
  def events: DataFrame = {
    val raw = t("events")
    raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  val queries: Seq[(String, () => DataFrame)] = Seq(
    "q_agg_hash" -> (() => t("lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),
    "q_join_shuffle" -> (() => t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("n_name")),
    "q_topk" -> (() => t("orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)),
    "q_window_rank" -> (() => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t("orders").withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
        .orderBy("o_custkey", "rnk", "o_orderkey")
    }),
    "q_agg_distinct" -> (() => t("orders")
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")),
    "q_json_funcs" -> (() => events
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_with_k"))
      .orderBy("event_type")),
    "q_stream_tumbling" -> (() => events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) + lit(1e-6), 4).as("sum_value"))
      .select(unix_micros(col("w.start")).as("win_start_us"), col("event_type"), col("n"), col("sum_value"))),
    "q_dedup_exact" -> (() => t("documents")
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
      .orderBy("rep_id")),
    "q_sc_normalize_log1p" -> (() => {
      val scaled = t("embeddings")
        .select(col("vec_id"), col("embedding").as("vec"))
        .select(col("vec_id"), col("vec"),
          aggregate(col("vec"), lit(0.0), (a, x) => a + abs(x.cast("double"))).as("row_sum"))
        .select(col("vec_id"), col("vec"),
          when(col("row_sum") === 0.0, lit(1.0)).otherwise(lit(100.0) / col("row_sum")).as("sc"))
      scaled.select(col("vec_id"),
          round(aggregate(col("vec"), lit(0.0),
            (a, x) => a + log1p(abs(x.cast("double")) * col("sc"))), 4).as("row_checksum"),
          round(log1p(abs(element_at(col("vec"), 1).cast("double")) * col("sc")), 4).as("first_val"))
        .orderBy("vec_id")
    })
  )

  def timeOnce(f: () => DataFrame): Double = {
    val t0 = System.nanoTime(); f().collect(); (System.nanoTime() - t0) / 1e9
  }
  // warm-up pass, then 3 timed runs each, median
  queries.foreach { case (_, f) => f().collect() }
  val results = queries.map { case (name, f) =>
    val runs = (1 to 3).map(_ => timeOnce(f)).sorted
    name -> runs(1)
  }
  val total = results.map(_._2).sum
  val qs = results.map { case (k, v) => s""""$k":${math.rint(v * 1000) / 1000}""" }.mkString("{", ",", "}")
  println(s"""STOCKBENCH {"metric":"stock_total","value":${math.rint(total * 1000) / 1000},"unit":"sec","queries":$qs,"sf":"$d"}""")
}
