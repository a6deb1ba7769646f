package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 additions: the Gopher rule battery and the JL projection. */
class GopherProjectSpec extends SparkSpec {
  import spark.implicits._

  test("gopher rules: each rule fires on its designed violation") {
    // build one violator per rule + one clean doc, run the SAME column
    // pipeline textGopher uses by staging a documents-shaped temp dir
    val docs = Seq(
      (0L, ("select join where group from order " * 10).trim),  // clean: 60 words
      (1L, "select join where"),                                // too few words
      (2L, (Seq.fill(60)("a").mkString(" "))),                  // mean len 1 < 3
      (3L, (Seq.fill(60)("###").mkString(" "))),                // no alpha + symbols
      (4L, ("select join where group from order " * 10).trim + " " +
        Seq.fill(30)("#").mkString(" ")),                       // symbol ratio > 0.1
      (5L, (Seq.fill(60)("zebra").mkString(" "))))              // no stopwords
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.textGopher(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    // (word_count, mean_len, alpha, symbol, stopword, keep)
    assert(got(0L) == ((true, true, true, true, true, true)))
    assert(!got(1L)._1 && !got(1L)._6)                    // word count
    assert(!got(2L)._2 && !got(2L)._6)                    // mean length
    assert(!got(3L)._3 && !got(3L)._6)                    // alpha ratio
    assert(got(4L)._1 && !got(4L)._4 && !got(4L)._6)      // symbol ratio
    assert(!got(5L)._5 && !got(5L)._6)                    // stopwords
  }

  test("JL projection preserves norms in expectation (k=16)") {
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val ratios = Sampling.embedProjectVecs(vecs)
      .select(
        (aggregate(col("y"), lit(0.0), (a, x) => a + x * x) /
          aggregate(col("v"), lit(0.0), (a, x) => a + x * x)).as("r"))
      .agg(avg(col("r")).as("mean_r"), min(col("r")).as("min_r"),
        max(col("r")).as("max_r"))
      .head()
    val (meanR, minR, maxR) =
      (ratios.getDouble(0), ratios.getDouble(1), ratios.getDouble(2))
    // E[||y||^2] = ||x||^2; at k=16 per-vector distortion is wide but
    // the mean over 500 vectors concentrates hard
    assert(math.abs(meanR - 1.0) < 0.1, s"mean ratio $meanR")
    assert(minR > 0.1 && maxR < 4.0, s"ratio range [$minR, $maxR]")
  }

  test("unrolled projection is bit-identical to the HOF fold it replaced") {
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 50)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val got = Sampling.embedProjectVecs(vecs).select("vec_id", "y")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // the original nested-HOF formulation, inlined as the reference
    val s = typedLit(Sampling.signMatrixForSpec(64))
    val want = vecs.withColumn("y",
        transform(sequence(lit(0), lit(Sampling.ProjK - 1)), j =>
          aggregate(sequence(lit(0), lit(63)),
            lit(0.0),
            (a, i) => a + element_at(col("v"), i + 1) *
              element_at(element_at(s, j + 1), i + 1))
            / sqrt(lit(Sampling.ProjK.toDouble))))
      .select("vec_id", "y")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got == want)
  }

  test("JL projection is deterministic (hash-derived signs, no RNG)") {
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 20)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val a = Sampling.embedProjectVecs(vecs).select("vec_id", "y")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val b = Sampling.embedProjectVecs(vecs).select("vec_id", "y")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(a == b)
    assert(a.values.forall(_.length == Sampling.ProjK))
  }
}
