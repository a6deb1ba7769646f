package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ hash split --

  test("hash buckets are deterministic, in range, and salt-decorrelated") {
    val ids = Tables.documents(spark, sf).select($"doc_id")
    val b = ids.select($"doc_id",
        Sampling.hashBucket($"doc_id", "split", 100).as("b1"),
        Sampling.hashBucket($"doc_id", "split", 100).as("b2"),
        Sampling.hashBucket($"doc_id", "other", 100).as("b3"))
      .cache()
    try {
      assert(b.filter($"b1" =!= $"b2").count() == 0)          // deterministic
      assert(b.filter($"b1" < 0 || $"b1" >= 100).count() == 0) // in range
      assert(b.filter($"b1" =!= $"b3").count() > 0)            // salted
    } finally b.unpersist()
  }

  test("train fraction lands near the 90% target") {
    val counts = Sampling.sampleHash(spark, sf)
      .groupBy("split").agg(sum($"n_docs").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val frac = counts.getOrElse("train", 0L) / total
    // 500 docs, p=0.9 → sd ≈ 1.3%; ±5 sd bounds
    assert(frac > 0.83 && frac < 0.97, s"train fraction $frac")
  }

  test("split membership is stable under repartitioning") {
    // the property hash splits exist for: bucket assignment must not
    // depend on physical layout (rand() fails this)
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", Sampling.hashBucket($"doc_id", "split", 100)
          .as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
    assert(buckets(docs) == buckets(docs.repartition(7)))
  }

  // ----------------------------------------------------------- quantization --

  test("quantization error is bounded by half a quantization step") {
    val amax = Tables.embeddings(spark, sf)
      .select($"vec_id",
        array_max(transform($"embedding", x => abs(x.cast("double"))))
          .as("amax"))
    val joined = Sampling.embedQuantize(spark, sf)
      .join(amax, Seq("vec_id"))
    // err <= 0.5/s = 0.5 * amax / 127; output is err*1000 (+1e-9 epsilon)
    val bad = joined.filter(
      $"max_err_1e3" > $"amax" * (1000.0 * 0.5 / 127.0) + 1e-3).count()
    assert(bad == 0)
    // |q_i| <= 127 → L1 of a 64-dim vector <= 64*127
    val overflow = Sampling.embedQuantize(spark, sf)
      .filter($"q_l1" > 64L * 127L).count()
    assert(overflow == 0)
  }

  test("weighted sample: valid A-ES keys, no duplicates, descending") {
    val rows = Sampling.sampleWeighted(spark, sf).collect()
    assert(rows.length == 20)
    val keys = rows.map(_.getDouble(3))
    assert(keys.forall(k => k > 0.0 && k <= 1.0))
    assert(keys.sameElements(keys.sorted.reverse))
    assert(rows.map(_.getLong(0)).distinct.length == 20)
  }

  test("stratified sample: exactly 5 ranked docs per language") {
    val rows = Sampling.sampleStratified(spark, sf).collect()
    val perLang = rows.groupBy(_.getString(0))
    perLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5), lang)
    }
  }

  test("centroid spread covers every vector and every label") {
    val rows = Sampling.embedCentroid(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum ==
      graft.tables.Tables.embeddings(spark, sf).count())
    assert(rows.forall(_.getDouble(2) > 0.0)) // classes aren't degenerate
  }

  test("contamination: only test docs, shared bounded by total") {
    val rows = Sampling.contamination(spark, sf).collect()
    assert(rows.nonEmpty)
    val testIds = Sampling.sampleHash(spark, sf) // sanity via the split roll-up
    rows.foreach { r =>
      val (n, shared, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(shared >= 0 && shared <= n)
      assert(ratio >= 0.0 && ratio <= 1.0 + 1e-6)
    }
    // every audited doc is in the test split (10% of corpus, minus <5-token)
    val testCount = testIds.filter($"split" === "test")
      .agg(sum($"n_docs")).head().getLong(0)
    assert(rows.length <= testCount)
  }

  test("repetition ratio: bounded on fixture data, exact on hand docs") {
    val rows = TextOps.textRepetition(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2)) // n_grams >= max_rep
      val ratio = r.getDouble(3)
      assert(ratio > 0.0 && ratio <= 1.0 + 1e-6)
    }
    // drive the PRODUCTION path on hand docs with known ratios:
    // doc 1 is one repeated token → every 3-gram identical → ratio 1.0;
    // doc 2 alternates → "a b a"×3 / 6 grams → 0.5;
    // doc 3 has <3 tokens → excluded entirely
    val hand = TextOps.repetitionOf(Seq(
        (1L, "x x x x x"), (2L, "a b a b a b a b"), (3L, "a b"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(hand == Map(1L -> ((3L, 3L, 1.0)), 2L -> ((6L, 3L, 0.5))))
  }

  // ------------------------------------------------------- epoch shuffle --

  test("epoch shuffle: deterministic, total, and epoch-decorrelated") {
    val a = Sampling.sampleShuffle(spark, sf).collect()
    val b = Sampling.sampleShuffle(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "same epoch must replay identically")
    // total order: the md5 keys are unique (doc_id injective input)
    val keys = a.map(_.getString(0))
    assert(keys.distinct.length == keys.length)
    assert(keys.sorted.toSeq == keys.toSeq)
    // a different epoch seed is a genuinely different permutation, and
    // NOT a global rotation/reversal of the same one: Spearman rank
    // correlation of doc positions should be near zero
    val ids = a.map(_.getLong(1))
    val otherEpoch = graft.tables.Tables.documents(spark, sf)
      .withColumn("k", md5(concat(lit("epoch8:"), col("doc_id").cast("string"))))
      .orderBy("k").select("doc_id").collect().map(_.getLong(0))
    val n = ids.length
    val posA = ids.zipWithIndex.toMap
    val posB = otherEpoch.zipWithIndex.toMap
    val d2 = ids.map(id => { val d = posA(id) - posB(id); d.toDouble * d }).sum
    val rho = 1.0 - 6.0 * d2 / (n.toDouble * (n.toDouble * n - 1))
    assert(math.abs(rho) < 0.2, s"epoch orders correlate: rho=$rho")
  }

  // -------------------------------------------------------------- BPE scan --

  test("BPE subtoken scan: tokens match the pre-tokenizer classes") {
    val rows = TextOps.textBpe(spark, sf).collect()
    assert(rows.length == 20)
    val re = "([a-z]+|[0-9]+|[^a-z0-9 ])".r
    rows.foreach { r =>
      val t = r.getString(0)
      assert(re.matches(t), s"subtoken $t escaped the class")
      assert(r.getLong(1) >= r.getLong(2)) // n_occ >= n_docs
    }
  }
}
