package graft.sc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt

/** Oracle-checked query surface over ScMatrix (SURVEY.md §2B sc-matrix
  * rows). vec = abs(embedding) as doubles throughout (counts view). */
object ScQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TAU = 0.05
  private val MIN_GENES = 40
  private val MIN_CELLS_FRAC = 0.617
  private val NORM_TARGET = 100.0
  private val CLIP = 3.0
  private val HVG_K = 16

  /** R4 filter_cells: cells expressing ≥ MIN_GENES genes at |x| > TAU. */
  def scFilterCells(s: SparkSession, d: String): DataFrame =
    ScMatrix.filterCells(ScMatrix.counts(s, d), MIN_GENES, TAU)
      .select(col("id").as("vec_id"), col("n_genes"))
      .orderBy("vec_id")

  /** R5 filter_genes: per-gene expressed-cell counts, genes kept at a
    * relative min-cells threshold. */
  def scFilterGenes(s: SparkSession, d: String): DataFrame = {
    val df = ScMatrix.counts(s, d)
    val total = df.agg(count(lit(1)).as("total"))
    ScMatrix.geneStats(df, TAU)
      .crossJoin(broadcast(total))
      .filter(col("n_cells") >= col("total") * MIN_CELLS_FRAC)
      .select((col("pos") + 1).cast("int").as("pos1"), col("n_cells"))
      .orderBy("pos1")
  }

  /** R6+R7 normalize_per_cell(target) → log1p; rounded row checksums.
    *
    * Deliberately FUSED formulation of the composed
    * ScMatrix.normalizePerCell∘log1p pipeline (same semantics, same
    * left-fold order, bit-identical doubles): the checksum folds
    * `log1p(abs(x)·scale)` directly inside `aggregate`, so NO intermediate
    * array is ever materialized — the composed chain builds three
    * per-row arrays (abs-counts, scaled, log1p'd) that a checksum consumer
    * immediately throws away. Round-1 bench: composed 0.39 s / fused
    * 0.22 s at sf0.1 vs 0.16 s stock (this query straddled the 2× gate).
    * The composed operators remain the API (q_sc_recipe, ScMatrixSpec);
    * this is what a perf-conscious caller should write for a reduction
    * over a transformed matrix. */
  def scNormalizeLog1p(s: SparkSession, d: String): DataFrame =
    fusedNormalizeLog1p(
      graft.tables.Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").as("vec")),
      absX = x => abs(x.cast("double")), firstVal = true)

  /** The fused normalize_per_cell→log1p checksum pipeline over a
    * (vec_id, vec) frame — SHARED by the parquet route above and the zarr
    * route (ZarrQueries.zarrPipeline), so "preprocessing results are
    * source-format-independent" is enforced by one implementation, not
    * two copies. `absX` adapts the element type (float embedding vs
    * already-double zarr vec); both folds apply it in place, never
    * materializing an intermediate array. */
  def fusedNormalizeLog1p(df: DataFrame, absX: Column => Column,
                          firstVal: Boolean): DataFrame = {
    val scaled = df
      .select(col("vec_id"), col("vec"),
        aggregate(col("vec"), lit(0.0), (a, x) => a + absX(x))
          .as("row_sum"))
      .select(col("vec_id"), col("vec"),
        when(col("row_sum") === 0.0, lit(1.0))
          .otherwise(lit(NORM_TARGET) / col("row_sum")).as("sc"))
    val checksum = round(aggregate(col("vec"), lit(0.0),
      (a, x) => a + log1p(absX(x) * col("sc"))), 4).as("row_checksum")
    val out =
      if (firstVal) scaled.select(col("vec_id"), checksum,
        round(log1p(absX(element_at(col("vec"), 1)) * col("sc")), 4)
          .as("first_val"))
      else scaled.select(col("vec_id"), checksum)
    out.orderBy("vec_id")
  }

  /** R8 scale: per-gene z-score clipped at CLIP; row checksum + row max. */
  def scScale(s: SparkSession, d: String): DataFrame =
    ScMatrix.scaleZ(ScMatrix.counts(s, d), CLIP)
      .select(col("id").as("vec_id"),
        NumFmt.roundSigned(aggregate(col("vec"), lit(0.0), (a, x) => a + x), 3)
          .as("row_checksum"),
        NumFmt.roundSigned(array_max(col("vec")), 4).as("max_z"))
      .orderBy("vec_id")

  /** R9 HVG: top-k genes by dispersion (var/mean) — Zheng17 core. */
  def scHvgTopK(s: SparkSession, d: String): DataFrame =
    ScMatrix.hvgTopK(ScMatrix.counts(s, d), HVG_K)
      .select((col("pos") + 1).cast("int").as("pos1"),
        round(col("disp"), 6).as("disp"))
      .orderBy(col("disp").desc, col("pos1"))

  /** R9 full Zheng17 flavor: binned normalized dispersion (ntile over mean,
    * z-score within bin, top-k). */
  def scHvgBinned(s: SparkSession, d: String): DataFrame =
    ScMatrix.hvgZheng17(ScMatrix.counts(s, d), HVG_K, nBins = 8)
      .select((col("pos") + 1).cast("int").as("pos1"),
        round(col("disp_norm"), 6).as("disp_norm"))
      .orderBy(col("disp_norm").desc, col("pos1"))

  /** R10 recipe_zheng17 end-to-end. Oracle'd since r8: the recipe is a
    * deterministic composition of six already-oracle'd stages, so its
    * DuckDB twin composes their CTEs — filter_genes(≥1 cell) →
    * normalize(median) → Zheng17-binned HVG top-16 → re-normalize →
    * log1p → scale(clip 10) — and hash equality proves the COMPOSITION
    * (stage wiring, median targets, projection reindex), which the
    * per-stage oracles alone could not. */
  def scRecipe(s: SparkSession, d: String): DataFrame =
    ScMatrix.recipeZheng17(ScMatrix.counts(s, d), HVG_K)
      .select(col("id").as("vec_id"),
        round(aggregate(col("vec"), lit(0.0), (a, x) => a + x), 3)
          .as("row_checksum"),
        size(col("vec")).as("n_genes"))
      .orderBy("vec_id")

  /** AnnData obs/var alignment through projection (reference
    * `anndata_spark.py` carries per-gene `var` metadata through every
    * filter [recalled:high]): a `var` table keyed by gene position must
    * survive HVG projection even though projection REINDEXES positions.
    * The query computes column checksums FROM THE PROJECTED MATRIX (new
    * positions) and joins them back to gene metadata via the
    * old→new position mapping; the oracle computes the same checksums
    * from the ORIGINAL matrix at the original positions — they can only
    * hash-match if the mapping is exactly right. The var table itself is
    * derived deterministically (the testbed ships no gene metadata file;
    * in AnnData `var` is any per-gene frame keyed by position). */
  def scVarAlignment(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = ScMatrix.counts(s, d)
    // gene count DERIVED from the matrix (one-row limit scan), not
    // hardcoded — a fixed 64 would silently misalign the var table the
    // day the matrix width changes (VERDICT r3 "What's wrong" #4)
    val nGenes = counts.select(size(col("vec"))).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val varTable = s.range(0, nGenes).select(
      col("id").cast("int").as("pos"),
      concat(lit("g"), lpad(col("id").cast("string"), 3, "0")).as("gene_name"))
    val keep = ScMatrix.hvgTopK(counts, HVG_K) // (pos, disp)
    // post-projection index of a kept gene = its rank among kept positions
    // (array `filter` preserves order — exactly projectGenes' reindexing);
    // k-row frame, the single-partition window is bounded by construction
    val mapping = keep.withColumn("new_pos",
      row_number().over(Window.orderBy("pos")))
    val projected = ScMatrix.projectHvg(counts, HVG_K)
    val projStats = projected
      .select(posexplode(col("vec")).as(Seq("p", "x")))
      .groupBy("p").agg(round(sum(col("x")), 3).as("col_checksum"))
      .select((col("p") + 1).cast("int").as("new_pos"), col("col_checksum"))
    mapping.join(broadcast(varTable), Seq("pos"))
      .join(projStats, Seq("new_pos"))
      .select(col("new_pos"), (col("pos") + 1).cast("int").as("pos1"),
        col("gene_name"), col("col_checksum"),
        round(col("disp"), 6).as("disp"))
      .orderBy("new_pos")
  }

  val queries: Map[String, Q] = Map(
    "q_sc_var_alignment"   -> scVarAlignment _,
    "q_sc_filter_cells"    -> scFilterCells _,
    "q_sc_filter_genes"    -> scFilterGenes _,
    "q_sc_normalize_log1p" -> scNormalizeLog1p _,
    "q_sc_scale"           -> scScale _,
    "q_sc_hvg_topk"        -> scHvgTopK _,
    "q_sc_hvg_binned"      -> scHvgBinned _,
    "q_sc_recipe"          -> scRecipe _,
  )

  private val COUNTS_CTE =
    """WITH c AS (SELECT vec_id,
                         list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE))) AS v
                  FROM embeddings)"""

  val oracle: Map[String, String] = Map(
    // checksums here come from the ORIGINAL matrix at the original gene
    // positions; the Spark side computes them from the PROJECTED matrix
    // at the new positions — hash equality proves the alignment mapping
    "q_sc_var_alignment" -> s"""$COUNTS_CTE,
      x AS (SELECT vec_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM c),
      st AS (SELECT pos, var_pop(val) / avg(val) AS disp0,
                    round(sum(val), 3) AS col_checksum
             FROM x GROUP BY pos),
      top AS (SELECT pos, disp0, col_checksum FROM st
              ORDER BY disp0 DESC, pos LIMIT 16),
      m AS (SELECT pos, disp0, col_checksum,
                   CAST(row_number() OVER (ORDER BY pos) AS INT) AS new_pos
            FROM top)
      SELECT new_pos, CAST(pos AS INT) AS pos1,
             'g' || lpad(CAST(pos - 1 AS VARCHAR), 3, '0') AS gene_name,
             col_checksum, round(disp0, 6) AS disp
      FROM m ORDER BY new_pos""",
    "q_sc_filter_cells" -> s"""$COUNTS_CTE
      SELECT vec_id, n_genes FROM (
        SELECT vec_id,
               CAST(len(list_filter(v, x -> x > 0.05)) AS INT) AS n_genes
        FROM c)
      WHERE n_genes >= 40 ORDER BY vec_id""",
    "q_sc_filter_genes" -> s"""$COUNTS_CTE,
      x AS (SELECT vec_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM c),
      st AS (SELECT pos,
                    count(*) FILTER (WHERE val > 0.05) AS n_cells
             FROM x GROUP BY pos)
      SELECT CAST(pos AS INT) AS pos1, CAST(n_cells AS BIGINT) AS n_cells
      FROM st
      WHERE n_cells >= 0.617 * (SELECT count(*) FROM embeddings)
      ORDER BY pos1""",
    "q_sc_normalize_log1p" -> s"""$COUNTS_CTE,
      sc AS (SELECT vec_id, v,
                    CASE WHEN list_sum(v) = 0 THEN 1.0
                         ELSE 100.0 / list_sum(v) END AS s FROM c),
      n AS (SELECT vec_id,
                   list_transform(v, x -> ln(1.0 + x * s)) AS y FROM sc)
      SELECT vec_id, round(list_sum(y), 4) AS row_checksum,
             round(y[1], 4) AS first_val
      FROM n ORDER BY vec_id""",
    "q_sc_scale" -> s"""$COUNTS_CTE,
      x AS (SELECT vec_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM c),
      st AS (SELECT pos, avg(val) AS mu, stddev_pop(val) AS sigma
             FROM x GROUP BY pos),
      z AS (SELECT vec_id,
                   CASE WHEN sigma = 0 THEN 0.0
                        ELSE least((val - mu) / sigma, 3.0) END AS zz
            FROM x JOIN st USING (pos))
      SELECT vec_id, round(sum(zz), 3) + 0.0 AS row_checksum,
             round(max(zz), 4) + 0.0 AS max_z
      FROM z GROUP BY vec_id ORDER BY vec_id""",
    "q_sc_hvg_binned" -> s"""$COUNTS_CTE,
      x AS (SELECT vec_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM c),
      st AS (SELECT pos, avg(val) AS mu,
                    var_pop(val) / avg(val) AS disp
             FROM x GROUP BY pos),
      b AS (SELECT pos, disp, ntile(8) OVER (ORDER BY mu, pos) AS bin
            FROM st),
      z AS (SELECT pos,
                   CASE WHEN stddev_pop(disp) OVER w IS NULL
                          OR stddev_pop(disp) OVER w = 0 THEN disp
                        ELSE (disp - avg(disp) OVER w)
                             / stddev_pop(disp) OVER w END AS disp_norm
            FROM b WINDOW w AS (PARTITION BY bin))
      SELECT pos1, disp_norm FROM (
        SELECT CAST(pos AS INT) AS pos1, round(disp_norm, 6) AS disp_norm,
               disp_norm AS dn0
        FROM z ORDER BY dn0 DESC, pos LIMIT 16)
      ORDER BY disp_norm DESC, pos1""",
    // recipe_zheng17 composed end-to-end. Mirrors ScMatrix.recipeZheng17
    // stage by stage; every constant (1e-7 min-cells frac, 20 HVG bins,
    // top-16, clip 10) matches the Scala call chain. Median row-sum
    // targets use quantile_cont — the same linear-interpolation formula
    // as Spark's exact percentile(., 0.5).
    "q_sc_recipe" -> s"""$COUNTS_CTE,
      x0 AS (SELECT vec_id, unnest(v) AS val,
                    generate_subscripts(v, 1) AS pos FROM c),
      st0 AS (SELECT pos, count(*) FILTER (WHERE val > 0.0) AS n_cells
              FROM x0 GROUP BY pos),
      keep0 AS (SELECT pos FROM st0
                WHERE n_cells >= 1e-7 * (SELECT count(*) FROM embeddings)),
      g AS (SELECT vec_id, x0.pos, val FROM x0 JOIN keep0 USING (pos)),
      rs1 AS (SELECT vec_id, sum(val) AS rs FROM g GROUP BY vec_id),
      med1 AS (SELECT quantile_cont(rs, 0.5) AS t FROM rs1),
      n1 AS (SELECT vec_id, pos,
                    val * (CASE WHEN rs = 0 THEN 1.0 ELSE t / rs END) AS val
             FROM g JOIN rs1 USING (vec_id), med1),
      st1 AS (SELECT pos, avg(val) AS mu,
                     CASE WHEN avg(val) = 0 THEN NULL
                          ELSE var_pop(val) / avg(val) END AS disp
              FROM n1 GROUP BY pos),
      b AS (SELECT pos, disp, ntile(20) OVER (ORDER BY mu, pos) AS bin
            FROM st1),
      z AS (SELECT pos,
                   CASE WHEN stddev_pop(disp) OVER w IS NULL
                          OR stddev_pop(disp) OVER w = 0 THEN disp
                        ELSE (disp - avg(disp) OVER w)
                             / stddev_pop(disp) OVER w END AS disp_norm
            FROM b WINDOW w AS (PARTITION BY bin)),
      hvg AS (SELECT pos FROM z
              ORDER BY disp_norm DESC NULLS LAST, pos LIMIT 16),
      h AS (SELECT vec_id, n1.pos, val FROM n1 JOIN hvg USING (pos)),
      rs2 AS (SELECT vec_id, sum(val) AS rs FROM h GROUP BY vec_id),
      med2 AS (SELECT quantile_cont(rs, 0.5) AS t FROM rs2),
      l AS (SELECT vec_id, pos,
                   ln(1.0 + val * (CASE WHEN rs = 0 THEN 1.0
                                        ELSE t / rs END)) AS val
            FROM h JOIN rs2 USING (vec_id), med2),
      st2 AS (SELECT pos, avg(val) AS mu, stddev_pop(val) AS sigma
              FROM l GROUP BY pos),
      zz AS (SELECT vec_id,
                    CASE WHEN sigma = 0 THEN 0.0
                         ELSE least((val - mu) / sigma, 10.0) END AS zval
             FROM l JOIN st2 USING (pos))
      SELECT vec_id, round(sum(zval), 3) + 0.0 AS row_checksum,
             CAST(count(1) AS INT) AS n_genes
      FROM zz GROUP BY vec_id ORDER BY vec_id""",
    "q_sc_hvg_topk" -> s"""$COUNTS_CTE,
      x AS (SELECT vec_id, unnest(v) AS val,
                   generate_subscripts(v, 1) AS pos FROM c),
      st AS (SELECT pos, var_pop(val) / avg(val) AS disp0
             FROM x GROUP BY pos)
      SELECT pos1, disp FROM (
        SELECT CAST(pos AS INT) AS pos1, round(disp0, 6) AS disp, disp0
        FROM st ORDER BY disp0 DESC, pos LIMIT 16)
      ORDER BY disp DESC, pos1""",
  )
}
