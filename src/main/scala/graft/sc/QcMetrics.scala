package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt

/** scanpy `pp.calculate_qc_metrics` — the per-cell QC triple every
  * single-cell pipeline computes before filtering (scanpy's obs-axis
  * metrics; reference repo mirrors the scanpy preprocessing surface,
  * SURVEY §2A):
  *
  *   total_counts        — sum of the cell's counts row
  *   n_genes_by_counts   — #{genes expressed above the noise floor τ}
  *   pct_counts_top5     — share of the 5 highest-count genes in the
  *                         total (library-complexity / ambient-RNA flag)
  *
  * All three are PER-ROW array folds over the counts matrix — one
  * narrow scan, no shuffle at all until the final presentation sort, so
  * the operator is embarrassingly parallel at any scale: each cell row
  * is independent, and codegen keeps the whole thing in one
  * WholeStageCodegen span. The top-5 share uses a per-row array_sort on
  * a GENE-dimensional array (bounded: |genes|, 64 here / ~28k at
  * reference scale) — per-partition work, never a shuffle. */
object QcMetrics {
  type Q = (SparkSession, String) => DataFrame

  private val TAU = 0.05

  /** The operator proper over ANY (id, vec) counts frame — public so
    * specs drive hand-computed matrices through the same folds. */
  def qcOnCounts(df: DataFrame, tau: Double = TAU): DataFrame = {
    val total = aggregate(col("vec"), lit(0.0), (a, x) => a + x)
    val top5 = aggregate(
      slice(sort_array(col("vec"), asc = false), 1, 5),
      lit(0.0), (a, x) => a + x)
    df.select(col("id").as("vec_id"),
        NumFmt.roundSigned(total + lit(1e-9), 4).as("total_counts"),
        ScMatrix.nGenes(col("vec"), tau).as("n_genes_by_counts"),
        NumFmt.roundSigned(top5 * lit(100.0) / total + lit(1e-9), 4)
          .as("pct_counts_top5"))
      .orderBy("vec_id")
  }

  def qcMetrics(s: SparkSession, d: String): DataFrame =
    qcOnCounts(ScMatrix.counts(s, d))

  val queries: Map[String, Q] = Map("q_sc_qc_metrics" -> qcMetrics _)

  val oracle: Map[String, String] = Map(
    // list_sum left-folds like Spark's aggregate; reverse-sorted slice
    // [1:5] mirrors slice(sort_array desc). The percentage divides the
    // UNROUNDED total, exactly like the Spark column.
    "q_sc_qc_metrics" ->
      """WITH c AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         m AS (SELECT vec_id,
                      list_sum(v) AS total,
                      CAST(len(list_filter(v, x -> x > 0.05)) AS INT)
                        AS n_genes_by_counts,
                      list_sum(list_reverse_sort(v)[1:5]) AS top5
               FROM c)
         SELECT vec_id,
                round(total + 1e-9, 4) + 0.0 AS total_counts,
                n_genes_by_counts,
                round(top5 * 100.0 / total + 1e-9, 4) + 0.0
                  AS pct_counts_top5
         FROM m ORDER BY vec_id""",
  )
}
