package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class SimilarityPqSpec extends SparkSpec {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("v"))

  test("pq codes are m ints within the codebook range") {
    val fit = Similarity.boundedFitSample(vecs, 0.5, 4000, 42L)
    val books = Similarity.pqCodebooks(fit, m = 8, ksub = 16, iters = 4,
      seed = 42L)
    assert(books.length == 8)
    assert(books.forall(_.length <= 16))
    assert(books.forall(_.forall(_.length == 8))) // 64 / 8 subspaces
    val enc = Similarity.pqEncode(vecs, books)
    val bad = enc.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16))
    assert(bad.count() == 0)
  }

  test("pq ADC top-10 recall vs exact L2 top-10") {
    val out = Similarity.similarityPq(spark, sf)
      .select("id1", "id2").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    // exact L2 top-10 per query by brute force
    val e = vecs
    val q = e.filter(col("id") < 5)
      .select(col("id").as("id1"), col("v").as("v1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id1").orderBy(col("d2"), col("id2"))
    val exact = q.crossJoin(e.select(col("id").as("id2"), col("v").as("v2")))
      .filter(col("id1") =!= col("id2"))
      .withColumn("d2", aggregate(zip_with(col("v1"), col("v2"),
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select("id1", "id2").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    val recalls = exact.keys.toSeq.sorted.map { qid =>
      val hit = out.getOrElse(qid, Set.empty)
      exact(qid).intersect(hit).size.toDouble / exact(qid).size
    }
    val mean = recalls.sum / recalls.length
    info(f"PQ(shortlist-rerank) mean recall@10 = $mean%.2f")
    // m=8×16 codes over 64-d N(0,0.1) noise vectors: ADC ranking is a
    // coarse approximation by construction; the gate is that the PQ
    // candidate list is far better than chance (10/499 ≈ 0.02 expected
    // overlap for a random top-10)
    assert(mean >= 0.3, s"mean recall@10 = $mean (per-query: $recalls)")
  }

  test("pq search is deterministic across runs") {
    val a = Similarity.similarityPq(spark, sf).collect().toSeq
    val b = Similarity.similarityPq(spark, sf).collect().toSeq
    assert(a == b)
  }
}
