package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the AnnData facade:
  *  - reindexMap is an order-preserving bijection onto 0..n-1 for
  *    sparse, negative, and adversarially-clustered id sets;
  *  - readZarr round-trips the group fixture (X row count, obs columns
  *    incl. the decoded categorical, vars);
  *  - filterCells keeps obs aligned and annotates n_genes;
  *  - writeZarr → readZarr round-trips a filtered AnnData bit-exactly
  *    (vec values, obs columns, contiguous ids);
  *  - the lifecycle query's plan never degenerates to a single global
  *    window partition (the reindex is bucket-keyed). */
class AnnDataSpec extends SparkSpec {
  import spark.implicits._

  test("reindexMap: order-preserving bijection for sparse/negative/clustered ids") {
    for (ids <- Seq(
      Seq(5L, 100L, 7L, -3L, 0L, 999999999L),
      (0L until 500L).map(_ * 17 - 250),
      Seq(1L),
      (0L until 300L).map(i => if (i < 290) i else i * 1000000L))) {
      val df = ids.toDF("id")
      val got = AnnData.reindexMap(df)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val expected = ids.sorted.zipWithIndex
        .map { case (id, i) => id -> i.toLong }.toMap
      assert(got == expected, s"ids=$ids")
    }
    assert(AnnData.reindexMap(Seq.empty[Long].toDF("id")).count() == 0)
  }

  test("readZarr opens the fixture group: X, obs (incl. categorical), vars") {
    val g = graft.zarr.ZarrQueries.fixtureGroup(spark, sf)
    val ad = AnnData.readZarr(spark, g)
    assert(ad.x.count() == 500)
    assert(ad.obs.columns.sorted.toSeq ==
      Seq("cell_type", "id", "label", "label_name"))
    assert(ad.obs.count() == 500)
    assert(ad.vars.count() == 64)
    val row = ad.obs.filter(col("id") === 0).head
    val lab = row.getAs[Long]("label")
    assert(row.getAs[String]("label_name") == s"lab$lab")
    assert(row.getAs[String]("cell_type") == s"ct$lab")
  }

  test("filterCells aligns obs and annotates n_genes; write/read round-trips") {
    val g = graft.zarr.ZarrQueries.fixtureGroup(spark, sf)
    val ad = AnnData.readZarr(spark, g).absX().filterCells(15, 0.15)
    val nKept = ad.x.count()
    assert(nKept > 0 && nKept < 500, s"filter should split cells, kept $nKept")
    assert(ad.obs.count() == nKept)
    assert(ad.obs.columns.contains("n_genes"))
    val out = java.nio.file.Files.createTempDirectory("anndata_rt").toString
    ad.writeZarr(s"$out/store")
    val back = AnnData.readZarr(spark, s"$out/store")
    assert(back.x.count() == nKept)
    // contiguous id domain after reindex
    assert(back.x.agg(min("id"), max("id")).head match {
      case r => r.getLong(0) == 0L && r.getLong(1) == nKept - 1
    })
    // values identical under the order-preserving id mapping
    val origSums = ad.x
      .select(col("id"), aggregate(col("vec"), lit(0.0), (a, b) => a + b))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2).toSeq
    val backSums = back.x
      .select(col("id"), aggregate(col("vec"), lit(0.0), (a, b) => a + b))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(_._1).map(_._2).toSeq
    assert(origSums == backSums)
    // obs columns traveled (n_genes as a member, strings preserved)
    val obsBack = back.obs.orderBy("id").collect()
    val obsOrig = ad.obs.orderBy("id").collect()
    assert(obsBack.map(_.getAs[Long]("n_genes")).toSeq ==
      obsOrig.map(r => r.getAs[Int]("n_genes").toLong).toSeq)
    assert(obsBack.map(_.getAs[String]("cell_type")).toSeq ==
      obsOrig.map(_.getAs[String]("cell_type")).toSeq)
  }

  test("CSR round-trip: write sparse, read COO, exact values incl. empty rows") {
    val out = java.nio.file.Files.createTempDirectory("anndata_csr").toString
    // row 2 keeps nothing (all below threshold) — the empty-row
    // carry-forward case; row 0 keeps head+tail (column order check)
    val vecs = Seq(
      0L -> Seq(5.0, 0.1, 0.1, 7.0),
      1L -> Seq(0.1, 3.0, 0.1, 0.1),
      2L -> Seq(0.1, 0.1, 0.1, 0.1),
      3L -> Seq(1.0, 2.0, 3.0, 4.0))
    val df = vecs.toDF("id", "vec")
    AnnData.writeCsrX(df, s"$out/X", v => v > lit(0.5), chunk = 3)
    graft.zarr.ZarrGroup.writeGroupMarker(out)
    graft.zarr.ZarrGroup.writeGroupMarker(s"$out/X")
    graft.zarr.ZarrGroup.consolidate(out)
    val coo = AnnData.readCsrX(spark, out, cellWidth = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(coo == Seq((0L, 0L, 5.0), (0L, 3L, 7.0), (1L, 1L, 3.0),
      (3L, 0L, 1.0), (3L, 1L, 2.0), (3L, 2L, 3.0), (3L, 3L, 4.0)))
    // indptr member: exclusive row-start ladder with the empty row
    val indptr = graft.zarr.ZarrGroup.readMember1(spark, out, "X/indptr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(indptr.toSeq == Seq(0L, 2L, 3L, 3L, 7L))
    // attrs carried the encoding marker through consolidation
    val attrs = graft.zarr.ZarrGroup.consolidated(out).get("X/.zattrs")
    assert(attrs.get("encoding-type").asText() == "csr_matrix")
  }

  test("layout transparency: sparse writeZarr round-trips identically to dense") {
    val g = graft.zarr.ZarrQueries.fixtureGroup(spark, sf)
    val ad = AnnData.readZarr(spark, g).absX().filterCells(15, 0.15).log1p()
    val base = java.nio.file.Files.createTempDirectory("anndata_sp").toString
    ad.writeZarr(s"$base/dense")
    ad.writeZarr(s"$base/sparse", sparse = true)
    def sums(p: String) = AnnData.readZarr(spark, p).x
      .select(col("id"), aggregate(col("vec"), lit(0.0), (a, b) => a + b))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val (d, sp) = (sums(s"$base/dense"), sums(s"$base/sparse"))
    assert(d.nonEmpty && d == sp)
    // and the sparse store really is the CSR encoding
    val enc = graft.zarr.ZarrGroup.consolidated(s"$base/sparse")
      .get("X/.zattrs")
    assert(enc.get("encoding-type").asText() == "csr_matrix")
  }

  test("CSC member decodes to the identical COO as the CSR member") {
    val g = AnnData.fixtureCsr(spark, sf)
    val csr = AnnData.readCsrX(spark, g)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val csc = AnnData.readCscX(spark, g, "X_csc")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(csr.nonEmpty && csr == csc)
  }

  test("prefixSumContig matches a sequential scan") {
    val vals = Seq(3L, 0L, 5L, 1L, 0L, 0L, 7L, 2L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = AnnData.prefixSumContig(df, vals.length)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(got.toSeq == vals.scanLeft(0L)(_ + _).tail)
  }

  test("recipe gene trail: vars carries the true original positions") {
    val counts = ScMatrix.counts(spark, sf)
    val k = 16
    val (_, genes) = ScMatrix.recipeZheng17WithGenes(counts, k)
    val got = genes.collect().map(_.getInt(0)).sorted.toSeq
    // independent recomposition from the public primitives: the filter
    // survivors in ascending order, indexed by the HVG picks over the
    // SAME normalized matrix
    val keptF = ScMatrix.geneStats(counts, 0.0)
      .filter(col("n_cells") >= 1).select("pos")
      .collect().map(_.getInt(0)).sorted
    val n = ScMatrix.normalizePerCell(
      ScMatrix.filterGenes(counts, 0.0000001, 0.0), None)
    val hvgCompact = ScMatrix.hvgZheng17(n, k)
      .collect().map(_.getInt(0)).toSeq
    val expected = hvgCompact.map(keptF(_)).sorted
    assert(got == expected && got.size == k)
    // the facade threads it into vars (id = compact index, value = original)
    val ad = AnnData(counts, counts.select(col("id")),
      spark.range(64).select(col("id"), col("id").as("value")))
      .recipeZheng17(k)
    val varsGot = ad.vars.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(varsGot.map(_._1) == (0L until k))
    assert(varsGot.map(_._2.toInt) == got)
  }

  test("uns provenance trail round-trips through the root attrs") {
    val g = graft.zarr.ZarrQueries.fixtureGroup(spark, sf)
    val ad = AnnData.readZarr(spark, g).absX().filterCells(15, 0.15)
      .normalizePerCell(Some(100.0)).log1p()
    assert(ad.uns == Seq("abs", "filter_cells(min_genes=15,tau=0.15)",
      "normalize_per_cell(target=100.0)", "log1p"))
    val out = java.nio.file.Files.createTempDirectory("anndata_uns").toString
    ad.writeZarr(s"$out/g")
    assert(AnnData.readZarr(spark, s"$out/g").uns == ad.uns)
    // a store with no trail reads back empty
    assert(AnnData.readZarr(spark, g).uns.isEmpty)
  }

  test("obsm round-trips PCA scores exactly; members() lists the slot") {
    val g = graft.zarr.ZarrQueries.fixtureGroup(spark, sf)
    val pp = AnnData.readZarr(spark, g).absX()
      .normalizePerCell(Some(100.0)).log1p()
    val out = java.nio.file.Files.createTempDirectory("anndata_obsm").toString
    pp.writeZarr(s"$out/g")
    val pc = Pca.project(pp.x, k = 8)
    AnnData.writeObsm(pc.select(col("id"), col("pc").as("vec")),
      s"$out/g", "X_pca")
    assert(graft.zarr.ZarrGroup.members(s"$out/g").contains("obsm/X_pca"))
    val direct = pc.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).sortBy(_._1).toSeq
    val stored = AnnData.readObsm(spark, s"$out/g", "X_pca").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).sortBy(_._1).toSeq
    assert(stored == direct) // <f8 members: bit-exact round-trip
  }

  test("obsp round-trips a sparse pairwise graph exactly, incl. empty rows") {
    val dir = java.nio.file.Files.createTempDirectory("ad_obsp").toString
    // 5 nodes; node 2 has NO out-edges (indptr carry-forward case)
    val edges = Seq((0L, 1L, 0.5), (0L, 3L, 1.25), (1L, 0L, 0.5),
      (3L, 4L, 2.0), (4L, 0L, 0.125), (4L, 3L, 2.0))
      .toDF("id", "nbr", "value")
    graft.zarr.ZarrGroup.writeGroupMarker(dir)
    AnnData.writeObsp(edges, dir, "distances", n = 5)
    val m = graft.zarr.ZarrGroup.consolidated(dir).get
    assert(m.contains("obsp/distances/data/.zarray") &&
      m.contains("obsp/distances/indptr/.zarray"))
    val got = AnnData.readObsp(spark, dir, "distances")
      .as[(Long, Long, Double)].collect().sortBy(e => (e._1, e._2))
    assert(got.toSeq == Seq((0L, 1L, 0.5), (0L, 3L, 1.25), (1L, 0L, 0.5),
      (3L, 4L, 2.0), (4L, 0L, 0.125), (4L, 3L, 2.0)))
  }

  test("varp/varm round-trip on the var axis (gene graph + gene stats)") {
    val dir = java.nio.file.Files.createTempDirectory("ad_varp").toString
    graft.zarr.ZarrGroup.writeGroupMarker(dir)
    // 4 genes; gene 1 has NO out-edges (indptr carry-forward on the var axis)
    val edges = Seq((0L, 2L, 0.75), (0L, 3L, -0.25), (2L, 0L, 0.75),
      (3L, 0L, -0.25), (3L, 2L, 0.5)).toDF("id", "nbr", "value")
    AnnData.writeVarp(edges, dir, "correlations", n = 4)
    val stats = Seq((0L, Seq(1.5, 0.25)), (1L, Seq(-2.0, 0.5)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(3.25, 2.0))).toDF("id", "vec")
    AnnData.writeVarm(stats, dir, "gene_stats")
    val m = graft.zarr.ZarrGroup.consolidated(dir).get
    assert(m.contains("varp/correlations/data/.zarray") &&
      m.contains("varp/correlations/indptr/.zarray") &&
      m.contains("varm/gene_stats/.zarray"))
    val gotP = AnnData.readVarp(spark, dir, "correlations")
      .as[(Long, Long, Double)].collect().sortBy(e => (e._1, e._2))
    assert(gotP.toSeq == Seq((0L, 2L, 0.75), (0L, 3L, -0.25), (2L, 0L, 0.75),
      (3L, 0L, -0.25), (3L, 2L, 0.5)))
    val gotM = AnnData.readVarm(spark, dir, "gene_stats").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toVector)).sortBy(_._1).toSeq
    assert(gotM == Seq((0L, Vector(1.5, 0.25)), (1L, Vector(-2.0, 0.5)),
      (2L, Vector(0.0, 1.0)), (3L, Vector(3.25, 2.0)))) // <f8: bit-exact
  }

  test("layers round-trip through writeZarr/readZarr and follow filterCells") {
    val dir = java.nio.file.Files.createTempDirectory("ad_layers").toString
    val x = Seq((0L, Seq(3.0, 0.0, 2.0)), (1L, Seq(0.0, 0.0, 1.0)),
      (2L, Seq(5.0, 4.0, 3.0))).toDF("id", "vec")
    val raw = Seq((0L, Seq(30.0, 0.0, 20.0)), (1L, Seq(0.0, 0.0, 10.0)),
      (2L, Seq(50.0, 40.0, 30.0))).toDF("id", "vec")
    val obs = Seq((0L, 7L), (1L, 8L), (2L, 9L)).toDF("id", "tag")
    val vars = Seq((0L, 0L), (1L, 1L), (2L, 2L)).toDF("id", "value")
    val ad = AnnData(x, obs, vars, layers = Map("counts" -> raw))
    // filterCells(minGenes=2, tau=0) keeps cells 0 and 2; the layer
    // must follow the cell axis like obs does
    val f = ad.filterCells(minGenes = 2, tau = 0.0)
    f.writeZarr(dir)
    val back = AnnData.readZarr(spark, dir)
    assert(back.layers.keySet == Set("counts"))
    val lay = back.layers("counts").as[(Long, Seq[Double])]
      .collect().sortBy(_._1)
    // reindexed to 0..1, order preserved: original cells 0, 2
    assert(lay.toSeq == Seq(0L -> Seq(30.0, 0.0, 20.0),
      1L -> Seq(50.0, 40.0, 30.0)))
    // layer ids align with the round-tripped X ids
    val xs = back.x.select("id").as[Long].collect().toSet
    assert(lay.map(_._1).toSet == xs)
    // gene-axis ops refuse stale layers loudly
    val e = intercept[IllegalArgumentException] {
      ad.recipeZheng17(2)
    }
    assert(e.getMessage.contains("layers"))
  }

  test("reindexMap rejects id domains beyond ±2^53 loudly") {
    // beyond 2^53 the double bucket function stops being order-
    // preserving — silent row reorder; the contract is a loud failure
    val e = intercept[IllegalArgumentException] {
      AnnData.reindexMap(Seq(0L, (1L << 53) + 3).toDF("id")).collect()
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("reindex never plans a global single-partition window") {
    val plan = planOf(AnnData.reindexMap(spark.range(100).toDF("id")))
    // the only Window in the reindex is partitioned by bucket
    assert(!plan.contains("Window [") ||
      !plan.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      s"global window found:\n$plan")
  }
}
