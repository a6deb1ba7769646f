package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-weight direction/closed-form and chi2 contingency
  * goldens. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  test("dsir: in-domain documents score higher than out-of-domain on " +
    "the fixture, and weights are finite") {
    val out = Selection.textDsir(spark, "/root/testdata/sf0.001")
    val src = graft.tables.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source")
    val j = out.join(src, "doc_id")
      .groupBy(col("source") === "src0")
      .agg(avg(col("log_w") / col("n_grams")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the target model is fit ON src0, so src0 docs must look more
    // in-domain on average (per-gram normalized to remove length bias)
    assert(j(true) > j(false),
      s"src0 per-gram weight ${j(true)} should beat ${j(false)}")
    assert(out.filter(col("log_w").isNull).count() === 0)
  }

  test("chi2 closed form on a planted 2x2 contingency") {
    // 8 docs, 2 langs; token "zz" present in 3 of 4 aa-docs and 1 of 4
    // bb-docs → A=3, B=1, C=1, D=3, N=8, df=4, nl=4
    // chi2 = 8*(3*3-1*1)^2 / (4*4*4*4) = 8*64/256 = 2.0
    val docs = Seq(
      (0L, "zz x", "aa"), (1L, "zz y", "aa"), (2L, "zz z", "aa"),
      (3L, "q w", "aa"),
      (4L, "zz k", "bb"), (5L, "p q", "bb"), (6L, "r s", "bb"),
      (7L, "t u", "bb"))
    // drive the same pipeline shape directly (presence → counts → chi2)
    val d = docs.toDF("doc_id", "text", "lang")
    val n = d.count()
    val pres = d.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("t"))
    val a = pres.filter(col("t") === "zz").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === Map("aa" -> 3L, "bb" -> 1L))
    val (bigA, df, nl) = (3.0, 4.0, 4.0)
    val chi2 = n * math.pow(bigA * (n - nl - (df - bigA))
      - (df - bigA) * (nl - bigA), 2) /
      (df * (n - df) * nl * (n - nl))
    assert(math.abs(chi2 - 2.0) < 1e-12)
  }

  test("chi2 query: ranked output and the top row matches a direct " +
    "recomputation from corpus counts") {
    val dir = "/root/testdata/sf0.001"
    val out = Selection.statsChi2(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 30)
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      "descending chi2")
    // independently recompute the top row's statistic from raw counts
    val top = out.head
    val (tok, lang) = (top.getString(0), top.getString(1))
    val docs = graft.tables.Tables.documents(spark, dir)
    val n = docs.count().toDouble
    val nl = docs.filter(col("lang") === lang).count().toDouble
    val pres = docs.select(col("doc_id"), col("lang"),
      explode(array_distinct(split(col("text"), " "))).as("t"))
      .filter(col("t") === tok)
    val dfT = pres.select("doc_id").distinct().count().toDouble
    val a = pres.filter(col("lang") === lang).count().toDouble
    val chi2 = n * math.pow(a * (n - nl - (dfT - a)) - (dfT - a) * (nl - a), 2) /
      (dfT * (n - dfT) * nl * (n - nl))
    assert(math.abs(chi2 - top.getDouble(3)) < 1e-3,
      s"direct $chi2 vs query ${top.getDouble(3)} for ($tok, $lang)")
  }
}
