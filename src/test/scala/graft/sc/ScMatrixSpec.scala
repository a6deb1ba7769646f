package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential-style unit tests on the tiny 4×3 matrix from FIXTURES.md §3
  * (zero row + zero column included), goldens hand-computed — same spirit as
  * the reference's scanpy-vs-spark allclose tests. */
class ScMatrixSpec extends SparkSpec {
  import spark.implicits._

  //        gene:   0    1    2
  // cell 0      [ 0.0, 0.0, 0.0 ]   zero row
  // cell 1      [ 1.0, 2.0, 0.0 ]
  // cell 2      [ 2.0, 4.0, 0.0 ]
  // cell 3      [ 3.0, 0.0, 0.0 ]   gene 2 = zero column
  def tiny: DataFrame = Seq(
    (0L, Seq(0.0, 0.0, 0.0)),
    (1L, Seq(1.0, 2.0, 0.0)),
    (2L, Seq(2.0, 4.0, 0.0)),
    (3L, Seq(3.0, 0.0, 0.0)),
  ).toDF("id", "vec")

  private def vecs(df: DataFrame): Map[Long, Seq[Double]] =
    df.select("id", "vec").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap

  test("filter_cells counts expressed genes and filters") {
    val got = ScMatrix.filterCells(tiny, minGenes = 2, tau = 0.0)
      .select("id", "n_genes").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 2, 2L -> 2))
  }

  test("filter_genes drops the zero column at min 2 cells (frac 0.5)") {
    val got = vecs(ScMatrix.filterGenes(tiny, minCellsFrac = 0.5, tau = 0.0))
    assert(got(1L) == Seq(1.0, 2.0) && got(2L) == Seq(2.0, 4.0)
      && got(0L) == Seq(0.0, 0.0) && got(3L) == Seq(3.0, 0.0))
  }

  test("normalize_per_cell hits the explicit target; zero row unchanged") {
    val got = vecs(ScMatrix.normalizePerCell(tiny, Some(6.0)))
    assert(got(1L) == Seq(2.0, 4.0, 0.0))   // sum 3 → ×2
    assert(got(3L) == Seq(6.0, 0.0, 0.0))   // sum 3 → ×2
    assert(got(0L) == Seq(0.0, 0.0, 0.0))   // zero sum → untouched, no NaN
  }

  test("normalize_per_cell median target = exact median of row sums") {
    // row sums 0,3,6,3 → exact percentile(0.5) = 3
    val got = vecs(ScMatrix.normalizePerCell(tiny, None))
    assert(got(1L) == Seq(1.0, 2.0, 0.0))   // sum already 3
    assert(got(2L) == Seq(1.0, 2.0, 0.0))   // sum 6 → ×0.5
  }

  test("log1p elementwise") {
    val got = vecs(ScMatrix.log1p(tiny))(1L)
    assert(math.abs(got(0) - math.log1p(1.0)) < 1e-12
      && math.abs(got(1) - math.log1p(2.0)) < 1e-12 && got(2) == 0.0)
  }

  test("scale: zero-variance gene → 0, others z-scored and clipped") {
    // gene0 vals (0,1,2,3): μ=1.5 σ=sqrt(1.25); gene2 all-zero → 0
    val got = vecs(ScMatrix.scaleZ(tiny, maxValue = 10.0))
    val sigma0 = math.sqrt(1.25)
    assert(math.abs(got(0L)(0) - (0.0 - 1.5) / sigma0) < 1e-12)
    assert(math.abs(got(3L)(0) - (3.0 - 1.5) / sigma0) < 1e-12)
    assert(got.values.forall(_(2) == 0.0))
    // clipping
    val clipped = vecs(ScMatrix.scaleZ(tiny, maxValue = 0.5))
    assert(clipped.values.flatten.forall(_ <= 0.5))
  }

  test("hvg: top-1 dispersion gene is gene 1; NaN/zero-mean gene never wins") {
    // gene0: μ=1.5 var=1.25 disp=0.833; gene1: μ=1.5 var=2.75 disp=1.833;
    // gene2: μ=0 → NULL disp (guarded)
    val top = ScMatrix.hvgTopK(tiny, 1, tau = 0.0).collect()
    assert(top.length == 1 && top(0).getInt(0) == 1)
    assert(math.abs(top(0).getDouble(1) - 2.75 / 1.5) < 1e-12)
  }

  test("recipe_zheng17 invariants on embeddings sf0.001") {
    val out = ScMatrix.recipeZheng17(ScMatrix.counts(spark, sf), 16)
    val rows = out.select(col("id"), col("vec")).collect()
    assert(rows.nonEmpty)
    // every surviving row has exactly k genes
    assert(rows.forall(_.getSeq[Double](1).length == 16))
    // scaled output: per-gene mean ≈ 0 (population z-score)
    val means = out
      .select(posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg("x").as("m"), stddev_pop("x").as("s"))
      .collect()
    assert(means.forall(r => math.abs(r.getDouble(1)) < 1e-9))
    // σ=1 unless clipping bit (clip at 10 ⇒ barely any): allow slack
    assert(means.forall(r => math.abs(r.getDouble(2) - 1.0) < 0.05))
  }
}
