package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metric-definition gates for the retrieval evaluation: a corpus small
  * enough to rank by hand, hand-computed nDCG/MRR/P@10 goldens, and the
  * independence property that makes the metric non-tautological. */
class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed golden: ranking by tf, judging by lead position") {
    // term "dup": four docs engineered so the BM25 order (by tf desc —
    // equal lengths make dl irrelevant) disagrees with relevance:
    //  docA tf=4, rel=0 (never in first 10 tokens)
    //  docB tf=3, rel=2 (in first 5)
    //  docC tf=2, rel=1 (in first 10, not first 5)
    //  docD tf=1, rel=0
    // all docs EXACTLY 16 tokens (equal dl ⇒ score monotone in tf, so
    // the ranking is A,B,C,D by construction), unique fillers elsewhere
    def doc(positions: Set[Int]): String =
      (0 until 16).map(i => if (positions(i)) "dup" else s"x$i").mkString(" ")
    val docs = Seq(
      0L -> doc(Set(10, 11, 12, 13)), // A: tf=4, rel=0 (first dup at 11th)
      1L -> doc(Set(1, 12, 13)),      // B: tf=3, rel=2 (in first 5)
      2L -> doc(Set(6, 13)),          // C: tf=2, rel=1 (in first 10 only)
      3L -> doc(Set(13))              // D: tf=1, rel=0
    ).toDF("doc_id", "text")
    // run the SAME plan the query uses, restricted to term "dup", by
    // swapping the documents table via a temp dir parquet
    val dir = java.nio.file.Files.createTempDirectory("rev").toString
    docs.write.mode("overwrite").parquet(dir + "/documents.parquet")
    // the other tables aren't touched by this query
    val out = RetrievalEval.textRetrievalEval(spark, dir)
      .filter(col("term") === "dup").collect()
    assert(out.length == 1)
    val r = out.head
    // ranking: A(4) B(3) C(2) D(1); rel: 0 2 1 0
    // DCG  = 3/ln3 + 1/ln4          (ranks 2 and 3)
    // IDCG = 3/ln2 + 1/ln3          (ideal: B then C)
    val dcg = 3.0 / math.log(3) + 1.0 / math.log(4)
    val idcg = 3.0 / math.log(2) + 1.0 / math.log(3)
    assert(r.getAs[Double]("ndcg10") == math.rint((dcg / idcg + 1e-9) * 1e4) / 1e4)
    assert(r.getAs[Double]("mrr10") == 0.5) // first relevant at rank 2
    assert(r.getAs[Double]("p10") == 0.2)   // 2 relevant of 10 slots
    assert(r.getAs[Long]("n_rel_top") == 2L)
  }

  test("independence property: the metric is NOT a tautology of the " +
    "ranker (some term scores below 1.0 on the corpus)") {
    val out = RetrievalEval.textRetrievalEval(spark, sf).collect()
    assert(out.nonEmpty)
    // if relevance were derived from tf, every nDCG would be exactly 1
    assert(out.exists(r => r.getAs[Double]("ndcg10") < 0.999),
      out.mkString("|"))
    // and the metric still finds real signal somewhere
    assert(out.exists(r => r.getAs[Double]("ndcg10") > 0.3))
  }
}
