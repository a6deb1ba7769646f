package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.{call_function, expr}

/** Registration surface for graft's native expressions.
  *
  * Two paths:
  *  - `register(spark)` — runtime registration into an existing session's
  *    function registry (what the queries use: the Verify/Bench harnesses
  *    build their own plain sessions);
  *  - `GraftExtensions` — `SparkSessionExtensions` injection for sessions
  *    built with `.withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions` (the
  *    idiomatic deployment path on a real cluster).
  */
object GraftFunctions {

  val cosineBuilder: Seq[Expression] => Expression =
    exprs => CosineSimilarity(exprs(0), exprs(1))

  val l2SqBuilder: Seq[Expression] => Expression =
    exprs => L2DistanceSq(exprs(0), exprs(1))

  val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs(0), exprs(1))

  /** cdc_chunks(text, w, b, mask, divisor) — params must be literals
    * (they parameterize the generated kernel call, not a row value). */
  val cdcChunksBuilder: Seq[Expression] => Expression = { exprs =>
    def asLong(e: Expression, name: String): Long = e.eval(null) match {
      case i: Int  => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"cdc_chunks: $name must be an integer literal, got $other")
    }
    CdcChunks(exprs(0), asLong(exprs(1), "w").toInt, asLong(exprs(2), "b"),
      asLong(exprs(3), "mask"), asLong(exprs(4), "divisor"))
  }

  val simHash60Builder: Seq[Expression] => Expression =
    exprs => SimHash60(exprs(0))

  val lcpLenBuilder: Seq[Expression] => Expression =
    exprs => LcpLen(exprs(0), exprs(1), exprs(2), exprs(3))

  /** dsir_buckets(text, salt, buckets) — salt/buckets must be literals
    * (they parameterize the generated kernel call, not a row value). */
  val dsirBucketsBuilder: Seq[Expression] => Expression = { exprs =>
    val salt = exprs(1).eval(null) match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other => throw new IllegalArgumentException(
        s"dsir_buckets: salt must be a string literal, got $other")
    }
    val buckets = exprs(2).eval(null) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"dsir_buckets: buckets must be an integer literal, got $other")
    }
    DsirBuckets(exprs(0), salt, buckets)
  }

  /** Idempotent runtime registration. EVERY path is guarded by a
    * functionExists check: both udf.register and
    * createOrReplaceTempFunction WARN "replaced a previously registered
    * function" on re-registration, and register() runs once per query
    * in a 190-query bench — hundreds of WARN lines crowding the
    * driver's 2000-char stdout tail otherwise. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def missing(n: String) = !reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    if (missing("cosine_sim"))
      reg.createOrReplaceTempFunction("cosine_sim", cosineBuilder, "scala_udf")
    if (missing("l2_sq"))
      reg.createOrReplaceTempFunction("l2_sq", l2SqBuilder, "scala_udf")
    if (missing("dot_product"))
      reg.createOrReplaceTempFunction("dot_product", dotBuilder, "scala_udf")
    if (missing("cdc_chunks"))
      reg.createOrReplaceTempFunction("cdc_chunks", cdcChunksBuilder, "scala_udf")
    if (missing("simhash60"))
      reg.createOrReplaceTempFunction("simhash60", simHash60Builder, "scala_udf")
    if (missing("lcp_len"))
      reg.createOrReplaceTempFunction("lcp_len", lcpLenBuilder, "scala_udf")
    if (missing("dsir_buckets"))
      reg.createOrReplaceTempFunction("dsir_buckets", dsirBucketsBuilder, "scala_udf")
    // aggregator surface for SQL users — `SELECT g, exact_median(v) …`,
    // `SELECT g, bounded_top3(score, id) …` (array<struct<score,id>>,
    // descending, O(3) agg state; see BoundedTopK)
    if (missing("exact_median"))
      spark.udf.register("exact_median",
        org.apache.spark.sql.functions.udaf(ExactMedian))
    if (missing("bounded_top3"))
      spark.udf.register("bounded_top3",
        org.apache.spark.sql.functions.udaf(BoundedTopK(3)))
  }

  /** Column-API form of the native cosine expression (requires
    * register(spark) first in that session). */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Column-API form of the native squared-L2 expression (requires
    * register(spark) first in that session). */
  def l2Sq(a: Column, b: Column): Column =
    call_function("l2_sq", a, b)

  /** Column-API form of the native dot-product expression (requires
    * register(spark) first in that session). */
  def dot(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  /** Column-API form of the native CDC chunker (requires
    * register(spark) first in that session). */
  def cdcChunks(text: Column, w: Int, b: Long, mask: Long,
                divisor: Long): Column =
    call_function("cdc_chunks", text,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(b),
      org.apache.spark.sql.functions.lit(mask),
      org.apache.spark.sql.functions.lit(divisor))

  /** Column-API form of the native SimHash fingerprint (requires
    * register(spark) first in that session). */
  def simHash60(text: Column): Column =
    call_function("simhash60", text)

  /** Column-API form of the native LCP-length probe (requires
    * register(spark) first in that session). */
  def lcpLen(text: Column, pos: Column, ptext: Column, ppos: Column): Column =
    call_function("lcp_len", text, pos, ptext, ppos)

  /** Column-API form of the native DSIR bigram-bucket histogram
    * (requires register(spark) first in that session). */
  def dsirBuckets(text: Column, salt: String, buckets: Int): Column =
    call_function("dsir_buckets", text,
      org.apache.spark.sql.functions.lit(salt),
      org.apache.spark.sql.functions.lit(buckets))

  /** Exact-median typed Aggregator (UDAF surface demo, SURVEY.md §7.3).
    * Buffers ALL values — fine for bounded per-group cardinalities (the
    * sc-matrix median-of-row-sums use is one group of #cells values; at
    * 100 TB use percentile_approx or the built-in exact percentile
    * instead, which spill). */
  object ExactMedian extends Aggregator[Double, List[Double], Double] {
    override def zero: List[Double] = Nil
    // List prepend is O(1); the old Array :+ buffer was O(n) per row
    override def reduce(b: List[Double], a: Double): List[Double] = a :: b
    override def merge(b1: List[Double], b2: List[Double]): List[Double] =
      b1 reverse_::: b2
    override def finish(r: List[Double]): Double = {
      if (r.isEmpty) return Double.NaN
      val s = r.toArray.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    override def bufferEncoder: Encoder[List[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}

/** Session-extensions installer: injects graft's native functions AND
  * optimizer rules at session build time — the no-code-change deployment
  * route (`--conf spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      GraftFunctions.cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("l2_sq"),
      new ExpressionInfo(classOf[L2DistanceSq].getName, "l2_sq"),
      GraftFunctions.l2SqBuilder))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      GraftFunctions.dotBuilder))
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinThresholdRule)
    // the rung-(c) physical operator (plans/AsOfJoinPlan.scala); runtime
    // sessions without extensions get it via AsOf.ensureStrategy
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
