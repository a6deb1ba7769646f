package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Plants a KNOWN near-copy across the train/test hash split and asserts
  * the leakage audit finds exactly it — fixture-independent semantics, on
  * top of the all-pairs DuckDB oracle that proves band completeness. */
class SplitLeakageSpec extends SparkSpec {
  import spark.implicits._

  /** Find ids landing on each side of THE shared split definition. */
  private def idsBySplit(n: Int): (Seq[Long], Seq[Long]) = {
    val rows = spark.range(n).toDF("doc_id")
      .withColumn("split", Sampling.splitCol(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    (rows.filter(_._2 == "train").map(_._1).toSeq,
      rows.filter(_._2 == "test").map(_._1).toSeq)
  }

  test("a planted cross-split near-copy is reported; clean docs are not") {
    val (train, test) = idsBySplit(200)
    assert(train.nonEmpty && test.size >= 2, s"split degenerate: ${test.size}")

    // 40 distinct tokens; the near-copy changes ONE token — simhash
    // hamming is small (<= 10), well inside the audit's radius.
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (("tok1x" +: (2 to 40).map(i => s"tok$i"))).mkString(" ")
    val trainLeak = train.head         // holds `base`
    val testLeak = test.head           // holds `near` — the leak
    val testClean = test(1)            // unrelated content
    val others = train.tail.take(3)
    val docs = (
      Seq((trainLeak, base), (testLeak, near),
        (testClean, (1 to 40).map(i => s"zzz$i").mkString(" "))) ++
        others.zipWithIndex.map { case (id, i) =>
          (id, (1 to 40).map(j => s"w${i}_$j").mkString(" ")) }
      ).toDF("doc_id", "text")

    val out = Dedup.splitLeakageOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.map(_._1).toSeq == Seq(testLeak), out.mkString(","))
    val (_, nDups, minHam) = out.head
    assert(nDups == 1L)
    assert(minHam > 0 && minHam <= 10, s"hamming $minHam")
  }

  test("an exact copy across the split reports hamming 0") {
    val (train, test) = idsBySplit(200)
    val txt = (1 to 30).map(i => s"a$i").mkString(" ")
    val docs = Seq((train.head, txt), (test.head, txt)).toDF("doc_id", "text")
    val out = Dedup.splitLeakageOf(docs).collect()
    assert(out.length == 1 && out.head.getInt(2) == 0)
  }
}
