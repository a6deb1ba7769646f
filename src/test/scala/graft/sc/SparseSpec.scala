package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Differential properties: every sparse op must equal its dense ScMatrix
  * twin on random sparse matrices (counts domain: nonneg values, tau ≥ 0
  * — the contract ScSparse documents). */
class SparseSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)

  /** Random n×d counts matrix, ~sparsity zeros, some all-zero rows. */
  private def randomDense(n: Int, d: Int, sparsity: Double): DataFrame = {
    val rows = (0 until n).map { i =>
      val vec =
        if (i % 7 == 3) Seq.fill(d)(0.0) // planted empty cells
        else Seq.fill(d)(
          if (rng.nextDouble() < sparsity) 0.0
          else math.rint(rng.nextDouble() * 50) / 10.0)
      (i.toLong, vec)
    }
    rows.toDF("id", "vec")
  }

  private val cases = Seq((40, 12, 0.7), (25, 30, 0.9), (60, 5, 0.5))

  test("toSparse -> toDense round-trips exactly") {
    cases.foreach { case (n, d, sp) =>
      val dense = randomDense(n, d, sp)
      val back = ScSparse.toDense(ScSparse.toSparse(dense), d,
        dense.select("id"))
      val diff = back.withColumnRenamed("vec", "vec1")
        .join(dense, Seq("id"))
        .filter(col("vec1") =!= col("vec")).count()
      assert(diff == 0, s"case ($n,$d,$sp)")
    }
  }

  test("filterCells: sparse == dense (ids and n_genes)") {
    cases.foreach { case (n, d, sp) =>
      val dense = randomDense(n, d, sp)
      val dres = ScMatrix.filterCells(dense, minGenes = 2, tau = 0.05)
        .select("id", "n_genes")
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toSet
      val sres = ScSparse.filterCellsSparse(ScSparse.toSparse(dense), 2, 0.05)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sres == dres, s"case ($n,$d,$sp)")
    }
  }

  test("filterGenes: sparse keep-set == dense gene mask") {
    cases.foreach { case (n, d, sp) =>
      val dense = randomDense(n, d, sp)
      val frac = 0.15
      val minCells = math.ceil(n * frac).toLong
      val dres = ScMatrix.geneStats(dense, 0.05)
        .filter(col("n_cells") >= lit(n) * frac)
        .select("pos").as[Int].collect().toSet
      val (_, keep) = ScSparse.filterGenesSparse(
        ScSparse.toSparse(dense), minCells, 0.05)
      val sres = keep.select("pos").as[Int].collect().toSet
      assert(sres == dres, s"case ($n,$d,$sp)")
    }
  }

  test("normalize+log1p: sparse checksums bit-equal the dense fold") {
    cases.foreach { case (n, d, sp) =>
      val dense = randomDense(n, d, sp)
      val dn = ScMatrix.log1p(ScMatrix.normalizePerCell(dense, Some(100.0)))
        .select(col("id"),
          aggregate(col("vec"), lit(0.0), (a, x) => a + x).as("cs"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sn = ScSparse.log1pSparse(
          ScSparse.normalizePerCellSparse(ScSparse.toSparse(dense), 100.0))
        .groupBy("id")
        .agg(sort_array(collect_list(struct(col("pos"), col("val")))).as("pv"))
        .select(col("id"), aggregate(col("pv"), lit(0.0),
          (a, e) => a + e.getField("val")).as("cs"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // sparse has no row for all-zero cells; dense checksum there is 0
      dn.foreach { case (id, cs) =>
        val scs = sn.getOrElse(id, 0.0)
        assert(scs == cs, s"case ($n,$d,$sp) id=$id dense=$cs sparse=$scs")
      }
    }
  }

  test("geneStats: sparse mu/sigma match dense within 1e-9") {
    cases.foreach { case (n, d, sp) =>
      val dense = randomDense(n, d, sp)
      val dres = ScMatrix.geneStats(dense, 0.0)
        .select("pos", "mu", "sigma")
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      val sres = ScSparse.geneStatsSparse(ScSparse.toSparse(dense), n)
        .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
        .toMap
      // genes with NO nonzero entry are absent from the sparse stats:
      // their dense stats are (0, 0)
      dres.foreach { case (pos, (mu, sigma)) =>
        val (smu, ssigma) = sres.getOrElse(pos, (0.0, 0.0))
        assert(math.abs(smu - mu) < 1e-9 && math.abs(ssigma - sigma) < 1e-9,
          s"case ($n,$d,$sp) pos=$pos dense=($mu,$sigma) sparse=($smu,$ssigma)")
      }
    }
  }

  test("sparse queries run and agree with their dense twins on testdata") {
    val sparseFg = ScSparse.scFilterGenesSparse(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val denseFg = ScQueries.queries("q_sc_filter_genes")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(sparseFg == denseFg)
    val sparseNorm = ScSparse.scNormalizeSparse(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val denseNorm = ScQueries.queries("q_sc_normalize_log1p")(spark, sf)
      .select("vec_id", "row_checksum")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sparseNorm == denseNorm)
  }

  test("hvgSparse pads all-zero genes as NULL-dispersion rows like the dense twin") {
    import spark.implicits._
    // 3 cells × 4 genes; gene 2 is all-zero (absent from the COO entirely)
    val dense = Seq(
      (0L, Seq(1.0, 5.0, 0.0, 2.0)),
      (1L, Seq(2.0, 1.0, 0.0, 2.0)),
      (2L, Seq(3.0, 9.0, 0.0, 2.0))).toDF("id", "vec")
    val sp = ScSparse.toSparse(dense)
    val got = ScSparse.hvgSparse(spark, sp, nCells = 3, dim = 4, k = 4)
      .collect().map(r =>
        (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val want = ScMatrix.hvgTopK(dense, k = 4)
      .collect().map(r =>
        (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq, s"got ${got.toSeq}")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      (g, w) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9)
        case (None, None)       => // all-zero gene: NULL on both paths
        case other              => fail(s"disp mismatch: $other")
      }
    }
    // gene 2 (all-zero) and gene 3 (zero variance -> disp 0) sort last;
    // the NULL row is last of all
    assert(got.last._1 == 2 && got.last._2.isEmpty)
  }

  test("scale via sparse densify == dense scale, HVG from COO moments == dense HVG") {
    val sparseScale = ScSparse.scScaleSparse(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val denseScale = ScQueries.queries("q_sc_scale")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(sparseScale == denseScale)
    val sparseHvg = ScSparse.scHvgSparse(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    val denseHvg = ScQueries.queries("q_sc_hvg_topk")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(sparseHvg == denseHvg)
  }
}
