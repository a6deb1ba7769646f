package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("pca projects to k components and preserves row count") {
    val out = Pca.scPca(spark, sf).collect()
    assert(out.length == 500)
    assert(out.forall(_.getAs[Int]("n_components") == 8))
    assert(out.forall(_.getAs[Double]("pc_norm") >= 0.0))
  }

  test("pca of an exactly low-rank matrix captures all variance in k dims") {
    // rank-2 data: every row = a*u + b*w
    val u = Array(1.0, 0.0, 1.0, 0.0, 1.0, 0.0)
    val w = Array(0.0, 2.0, 0.0, 2.0, 0.0, 2.0)
    val rng = new scala.util.Random(3)
    val raw = (0L until 40L).map { i =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      (i, u.zip(w).map { case (x, y) => a * x + b * y })
    }
    // MLlib PCA derives components from the centered covariance but scores
    // the RAW vectors (no centering) — pre-center so norms are comparable
    val mean = raw.map(_._2).transpose.map(c => c.sum / c.size).toArray
    val rows = raw.map { case (id, v) =>
      (id, v.zip(mean).map { case (x, m) => x - m }.toSeq)
    }
    val df = rows.toDF("id", "vec")
    val pc = Pca.project(df, k = 2)
      .select($"id", $"pc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // centered rank-2 data in 2 PCs is lossless: score norms == input norms
    rows.foreach { case (id, v) =>
      val n2 = v.map(x => x * x).sum
      val p2 = pc(id).map(x => x * x).sum
      assert(math.abs(n2 - p2) < 1e-8 * (1 + n2), s"row $id: $n2 vs $p2")
    }
  }
}
