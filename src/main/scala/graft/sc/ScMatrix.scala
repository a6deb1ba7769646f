package graft.sc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Single-cell matrix preprocessing — the reference's core semantics
  * (lasersonlab/single-cell-experiments `scanpy_spark.py`: filter_cells,
  * filter_genes, normalize_per_cell, log1p, scale, HVG selection,
  * recipe_zheng17; mount empty at build time, semantics double-anchored on
  * the published scanpy.pp API — SURVEY.md §2A).
  *
  * Data model: DataFrame(id BIGINT, vec ARRAY<DOUBLE>) — one row per cell,
  * one array slot per gene (the reference holds Zarr row-chunks of the same
  * matrix as RDD partitions). The testbed's `embeddings` table stands in for
  * cells×genes; `abs(x)` is taken as the count value so log1p/normalize stay
  * in-domain.
  *
  * Scale design (the part the reference did with driver round-trips):
  * per-GENE statistics (filter_genes, scale, HVG) are global aggregates.
  * The reference computed per-block partials and `reduce`d them onto the
  * Python driver, then re-broadcast closures. Here each stats pass is ONE
  * declarative plan: posexplode → partial+final hash agg (gene-count-sized
  * output, i.e. tiny) → collapsed to a single-row array via sorted
  * collect_list → broadcast cross-join back onto the matrix. No driver
  * action in the data path; the broadcast payload is O(#genes), never
  * O(#cells). Per-CELL ops (filter_cells, normalize, log1p) are pure
  * higher-order array expressions inside WholeStageCodegen — they run at
  * scan speed and never shuffle.
  */
object ScMatrix {

  /** embeddings → (id, vec) counts view: vec = abs(embedding) as doubles. */
  def counts(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id").as("id"),
      transform(col("embedding"), x => abs(x.cast("double"))).as("vec"))

  /** Per-cell expressed-gene count: #{ x > tau }. (`filter_cells`'s n_genes,
    * scanpy_spark.py::filter_cells.) */
  def nGenes(vec: Column, tau: Double): Column =
    size(filter(vec, x => x > lit(tau)))

  /** Keep cells with ≥ minGenes expressed genes; annotates n_genes. */
  def filterCells(df: DataFrame, minGenes: Int, tau: Double): DataFrame =
    df.withColumn("n_genes", nGenes(col("vec"), tau))
      .filter(col("n_genes") >= minGenes)

  /** Per-gene global stats in one pass: expressed-cell count, mean,
    * population std-dev, dispersion (var/mean). Output has #genes rows. */
  def geneStats(df: DataFrame, tau: Double): DataFrame =
    df.select(posexplode(col("vec")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(
        count(when(col("x") > tau, 1)).as("n_cells"),
        avg(col("x")).as("mu"),
        stddev_pop(col("x")).as("sigma"),
        // zero-mean genes get NULL dispersion (not NaN — Spark sorts NaN as
        // the LARGEST double, which would win every top-k by mistake)
        when(avg(col("x")) === 0.0, lit(null))
          .otherwise(var_pop(col("x")) / avg(col("x"))).as("disp"))

  /** Collapse a (pos, flag) frame into a single-row broadcastable boolean
    * mask array ordered by pos. */
  private def maskOf(flags: DataFrame): DataFrame =
    flags.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("keep")))),
        s => s.getField("keep")).as("mask"))

  /** Project every cell's vec to the positions where mask is true. */
  def projectGenes(df: DataFrame, mask: DataFrame): DataFrame = {
    val masked = df.crossJoin(broadcast(mask))
    masked.withColumn("vec",
        filter(col("vec"), (_, i) => element_at(col("mask"), i + 1)))
      .drop("mask")
  }

  /** `filter_genes`: drop genes expressed in fewer than minCells cells.
    * minCells may be a fraction of total cells (relative) — resolved
    * declaratively via a broadcast scalar, no driver action. */
  def filterGenes(df: DataFrame, minCellsFrac: Double, tau: Double): DataFrame =
    filterGenesWithMask(df, minCellsFrac, tau)._1

  /** [[filterGenes]] plus the kept INPUT gene positions (the identity
    * trail a var-carrying caller needs) — same single stats pass, same
    * projection plan; the second frame is the gene-count-bounded flags
    * filtered to keep=true. */
  def filterGenesWithMask(df: DataFrame, minCellsFrac: Double,
                          tau: Double): (DataFrame, DataFrame) = {
    val total = df.agg(count(lit(1)).as("total"))
    val flags = geneStats(df, tau)
      .crossJoin(broadcast(total))
      .select(col("pos"),
        (col("n_cells") >= col("total") * minCellsFrac).as("keep"))
    (projectGenes(df, maskOf(flags)),
      flags.filter(col("keep")).select(col("pos")))
  }

  /** `normalize_per_cell`: scale each row so its sum equals `target`
    * (or the median row sum when target is None — exact percentile, a
    * single broadcast scalar). */
  def normalizePerCell(df: DataFrame, target: Option[Double]): DataFrame = {
    val withSum = df.withColumn("row_sum",
      aggregate(col("vec"), lit(0.0), (a, x) => a + x))
    val withTarget = target match {
      case Some(t) => withSum.withColumn("target", lit(t))
      case None =>
        withTarget0(withSum)
    }
    withTarget
      // zero-sum rows pass through unscaled (0/0 would poison them to NaN;
      // scanpy expects such cells to be filtered beforehand)
      .withColumn("__scale",
        when(col("row_sum") === 0.0, lit(1.0))
          .otherwise(col("target") / col("row_sum")))
      .withColumn("vec", transform(col("vec"), x => x * col("__scale")))
      .drop("row_sum", "target", "__scale")
  }

  private def withTarget0(withSum: DataFrame): DataFrame = {
    val med = withSum.agg(
      expr("percentile(row_sum, 0.5)").as("target"))
    withSum.crossJoin(broadcast(med))
  }

  /** `log1p`: elementwise ln(1+x) — codegen'd map, no shuffle. */
  def log1p(df: DataFrame): DataFrame =
    df.withColumn("vec",
      transform(col("vec"), x => org.apache.spark.sql.functions.log1p(x)))

  /** `scale`: per-gene z-score with clipping at maxValue; zero-variance
    * genes map to 0 (scanpy guards sigma=0 the same way). */
  def scaleZ(df: DataFrame, maxValue: Double, tau: Double = 0.0): DataFrame = {
    val stats = geneStats(df, tau).agg(
      transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
        s => s.getField("mu")).as("mus"),
      transform(array_sort(collect_list(struct(col("pos"), col("sigma")))),
        s => s.getField("sigma")).as("sigmas"))
    df.crossJoin(broadcast(stats))
      .withColumn("vec", zip_with(
        col("vec"),
        zip_with(col("mus"), col("sigmas"), (m, s) => struct(m.as("m"), s.as("s"))),
        (x, ms) => when(ms.getField("s") === 0.0, lit(0.0))
          .otherwise(least((x - ms.getField("m")) / ms.getField("s"), lit(maxValue)))))
      .drop("mus", "sigmas")
  }

  /** Highly-variable-gene selection: top-k genes by dispersion (var/mean),
    * the Zheng17 HVG core. Returns (pos, disp) of the selected genes. */
  def hvgTopK(df: DataFrame, k: Int, tau: Double = 0.0): DataFrame =
    geneStats(df, tau)
      .select(col("pos"), col("disp"))
      .orderBy(col("disp").desc, col("pos"))
      .limit(k)

  /** Zheng17-faithful HVG: z-score each gene's dispersion WITHIN its
    * mean-expression bin (ntile binning), then take top-k by normalized
    * dispersion — scanpy's filter_genes_dispersion(flavor='cell_ranger')
    * semantics, where raw dispersion ranking would be confounded by the
    * mean-dispersion trend. Returns (pos, disp_norm) of selected genes. */
  def hvgZheng17(df: DataFrame, k: Int, nBins: Int = 20,
                 tau: Double = 0.0): DataFrame =
    hvgZheng17FromStats(geneStats(df, tau), k, nBins)

  /** Same ranking over an already-computed geneStats frame (lets callers
    * reuse one stats pass for ranking AND projection). */
  def hvgZheng17FromStats(stats: DataFrame, k: Int,
                          nBins: Int = 20): DataFrame = {
    // unpartitioned window, bounded by construction: the stats frame is
    // one row per gene (≤~30k at any matrix width) — the benign
    // single-partition class. (A constant partitionBy(lit(0)) does NOT
    // silence WindowExec's WARN: Catalyst folds the constant key away;
    // Bench/Verify drop that logger to ERROR instead.)
    val binned = stats
      .withColumn("bin", ntile(nBins).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("mu"), col("pos"))))
    val binW = org.apache.spark.sql.expressions.Window.partitionBy("bin")
    binned
      .withColumn("bin_mu", avg(col("disp")).over(binW))
      .withColumn("bin_sd", stddev_pop(col("disp")).over(binW))
      // single-gene or zero-variance bins: fall back to raw dispersion
      .withColumn("disp_norm",
        when(col("bin_sd").isNull || col("bin_sd") === 0.0, col("disp"))
          .otherwise((col("disp") - col("bin_mu")) / col("bin_sd")))
      .select(col("pos"), col("disp_norm"))
      .orderBy(col("disp_norm").desc_nulls_last, col("pos"))
      .limit(k)
  }

  /** Keep only the top-k dispersed genes in the matrix. ONE stats pass:
    * rank by dispersion within the stats frame itself (64–30k rows — a
    * single-partition window is fine at any matrix width). `binned=true`
    * uses the Zheng17 normalized-dispersion ranking (hvgZheng17). */
  def projectHvg(df: DataFrame, k: Int, tau: Double = 0.0,
                 binned: Boolean = false): DataFrame =
    projectHvgWithMask(df, k, tau, binned)._1

  /** [[projectHvg]] plus the kept INPUT gene positions — same flags,
    * same plan. */
  def projectHvgWithMask(df: DataFrame, k: Int, tau: Double = 0.0,
                         binned: Boolean = false): (DataFrame, DataFrame) = {
    val flags = if (binned) {
      // ONE stats pass shared by the ranking and the full pos list
      val stats = geneStats(df, tau)
      val keep = hvgZheng17FromStats(stats, k)
        .select(col("pos"), lit(true).as("hit"))
      stats.select(col("pos"))
        .join(keep, Seq("pos"), "left")
        .select(col("pos"), coalesce(col("hit"), lit(false)).as("keep"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("disp").desc_nulls_last, col("pos"))
      geneStats(df, tau)
        .withColumn("rk", row_number().over(w))
        .select(col("pos"), (col("rk") <= k).as("keep"))
    }
    (projectGenes(df, maskOf(flags)),
      flags.filter(col("keep")).select(col("pos")))
  }

  /** `recipe_zheng17` (scanpy_spark.py::recipe_zheng17 [recalled], semantics
    * = sc.pp.recipe_zheng17): filter_genes(min 1 cell) → normalize to median
    * → HVG top-k subset → re-normalize → log1p → scale(clip 10). One fused
    * Catalyst plan end-to-end — the reference needed a driver collect per
    * global stat. */
  def recipeZheng17(df: DataFrame, nTopGenes: Int): DataFrame =
    recipeZheng17WithGenes(df, nTopGenes)._1

  /** [[recipeZheng17]] plus the ORIGINAL input positions of the genes
    * that survived (filter_genes ∘ HVG), ascending — the var identity
    * trail scanpy keeps on `adata.var` through a recipe. Composition:
    * the HVG mask addresses the filtered matrix's compact gene space,
    * so its positions are looked up in the rank-ordered filter
    * survivors (both frames gene-count-bounded; the window is the
    * benign bounded-stats single-partition class). The matrix plan is
    * IDENTICAL to the mask-less recipe — the trail is an extra bounded
    * output, not a rewrite (q_sc_recipe's oracle re-proves that every
    * gate). */
  def recipeZheng17WithGenes(df: DataFrame,
                             nTopGenes: Int): (DataFrame, DataFrame) = {
    val (g, keptF) = filterGenesWithMask(df, minCellsFrac = 0.0000001, tau = 0.0)
    // persist the normalized matrix: it feeds BOTH the HVG stats pass and
    // the projection — without this the whole upstream recipe re-runs per
    // consumer (at cluster scale: MEMORY_AND_DISK, spills instead of OOM).
    // Lifecycle: the cache lives until the session drops it; callers doing
    // many recipes in one session should unpersist via
    // spark.sharedState.cacheManager.clearCache() between runs
    val n = normalizePerCell(g, None)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (h, keptH) = projectHvgWithMask(n, nTopGenes, binned = true)
    val n2 = normalizePerCell(h, None)
    val l = log1p(n2)
    // compact-space HVG positions → original positions via the filter
    // survivors in ascending-pos order (compact index = rank)
    val ranked = keptF.withColumn("cidx",
      row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("pos"))) - 1)
    val genes = keptH.select(col("pos").as("cidx"))
      .join(ranked, "cidx")
      .select(col("pos"))
    (scaleZ(l, maxValue = 10.0), genes)
  }
}
