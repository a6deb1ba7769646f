package graft.llm

import graft.SparkSpec
import graft.tables.Tables
import org.apache.spark.sql.functions._

class KnnClassifySpec extends SparkSpec {
  import spark.implicits._

  test("every test vector gets exactly one prediction with 1..K votes") {
    val rows = KnnClassify.knnClassify(spark, sf).collect()
    val nTest = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 5 === 0 && $"vec_id" < KnnClassify.MaxTestId)
      .count()
    assert(rows.length.toLong == nTest && nTest > 0)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      val v = r.getLong(2)
      assert(v >= 1L && v <= KnnClassify.K.toLong)
    }
  }

  test("prediction equals the brute-force vote over exact neighbors") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", $"label", $"embedding")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val train = e.filter(_._1 % 5 != 0)
    val test = e.filter(v => v._1 % 5 == 0 && v._1 < KnnClassify.MaxTestId)
    val want = test.map { case (tid, _, tv) =>
      val nn = train.map { case (nid, lbl, nv) =>
        val d2 = tv.zip(nv).map { case (a, b) => (a - b) * (a - b) }.sum
        // the operator's rounded-distance rank order
        (BigDecimal(math.sqrt(d2) + 1e-9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP), nid, lbl)
      }.sortBy(t => (t._1, t._2)).take(KnnClassify.K)
      // .toSeq BEFORE .map — mapping a Map to (size, label) pairs would
      // collapse labels sharing a vote count (size becomes the key)
      val top = nn.groupBy(_._3).toSeq.map { case (l, g) => (g.size, l) }
        .sortBy(t => (-t._1, t._2)).head
      tid -> (top._2, top._1.toLong)
    }.toMap
    val got = KnnClassify.knnClassify(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got == want)
  }
}
