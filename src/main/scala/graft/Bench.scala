package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // BASELINE.md methodology: 1 warm-up execution (JVM/codegen warm-up),
    // then median of 3 timed runs per query.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    // Accumulate incrementally so a FATAL error (OOM in one query) still
    // flushes every completed result to the JSON sinks before rethrowing —
    // NonFatal alone would otherwise lose the whole run's data.
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    try SparkEntry.queries.foreach { case (name, fn) =>
      // noop sink: materializes EVERY output column and keeps the final
      // sort — .count() let Catalyst prune computed projections and
      // eliminate orderBy, timing a cheaper plan than the query under test
      def once(): Double = {
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case NonFatal(e) =>
          val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(300)}"
          System.err.println(s"[bench] $name FAILED: $msg")
          failures.getOrElseUpdate(name, msg)
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
      val warm = once()
      // Any failed run (warm-up OR timed) marks the query failed: a
      // negative timed run must not be masked by the median of the
      // surviving positives.
      val t = if (warm < 0) -1.0
        else {
          val runs = Seq(once(), once(), once())
          if (runs.exists(_ < 0)) -1.0 else runs.sorted.apply(1)
        }
      // queries that persist internally (recipe_zheng17) register a fresh
      // lineage per invocation; without this the cache grows run over run
      // and later queries pay eviction pressure
      spark.sharedState.cacheManager.clearCache()
      results(name) = t
    } catch { case fatal: Throwable =>
      System.err.println(s"[bench] FATAL after ${results.size} queries: $fatal")
      failures.getOrElseUpdate("_fatal",
        s"${fatal.getClass.getSimpleName}: ${Option(fatal.getMessage).getOrElse("").take(300)}")
    }
    val total = if (results.nonEmpty) results.values.filter(_ >= 0).sum else 0.0
    val nFailed = results.values.count(_ < 0)
    // Full-precision per-query detail goes to the file sink.
    // Full JSON string escape — Spark exception messages are multi-line;
    // raw \n/\r/\t in a value breaks the one-line format the driver parses.
    def escJ(p: String): String = p.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qsFull = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failJson = failures.map { case (k, v) =>
      s"\"${escJ(k)}\":\"${escJ(v)}\"" }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","n_failed":$nFailed,"failures":$failJson,"queries":$qsFull,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_OUT.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullJson + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // file write is best-effort
    // The stdout line must survive the driver's parser, which keeps only the
    // LAST 2000 chars of the run's output (observed: BENCH_r01/r02 "tail"
    // fields are exactly 2000 chars and "parsed" was null both rounds — the
    // 2.5 KB all-queries line was truncated at the front). So the stdout line
    // carries the BASELINE.md-common headline queries at 3 dp (the set the
    // judge compares against stock Spark) and the all-queries total; the full
    // map lives in BENCH_OUT.json (committed per round).
    val headline = Seq(
      "q_agg_hash", "q_join_shuffle", "q_topk", "q_window_rank",
      "q_agg_distinct", "q_json_funcs", "q_stream_tumbling", "q_dedup_exact",
      "q_sc_normalize_log1p", "q_similarity_knn")
    val qsHead = headline.flatMap(k => results.get(k).map(v =>
      s"\"" + k + "\":" + (math.rint(v * 1000) / 1000))).mkString("{", ",", "}")
    // JSON-escape interpolated paths: an env-provided path containing a
    // quote or backslash must not break the driver's one-line parser
    val json =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","queries":$qsHead,"n_queries":${results.size},"n_failed":$nFailed,"detail":"${escJ(outPath)}","sf":"${escJ(sfDir)}"}"""
    println(json)
    spark.stop()
  }
}
