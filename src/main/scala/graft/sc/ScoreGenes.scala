package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NumFmt

/** scanpy `tl.score_genes` (Satija et al. cell-cycle scoring form) —
  * per-cell signature score: mean expression of a gene SET minus mean
  * expression of a CONTROL pool drawn from expression-matched genes.
  * scanpy samples `ctrl_size` random genes per expression bin; this is
  * the deterministic complete-pool variant (control = ALL non-set genes
  * in every bin the set touches — the limit of scanpy's sampler, and
  * replayable by the oracle). Signature = every 8th gene, n_bins = 4.
  *
  * Scale shape: gene means are one keyed agg over the exploded matrix
  * (nnz-linear, map-side combine); the bin assignment is a window over
  * the GENE-dimensional frame (64 here / ~28k at reference scale —
  * bounded, the documented bounded-window class); the per-cell score is
  * a second nnz-linear keyed agg after a BROADCAST join of the
  * gene-class table (gene-dimensional) onto the exploded matrix. Two
  * shuffles total, both keyed, nothing quadratic. */
object ScoreGenes {
  type Q = (SparkSession, String) => DataFrame

  private val NBins = 4

  /** The operator proper over ANY (id, vec) counts frame — public so
    * specs drive hand-computed matrices through the same plan. The
    * signature predicate (every 8th gene) and bin count stay fixed so
    * the oracle replays them. */
  def scoreOnCounts(cells: DataFrame): DataFrame = {
    val x = cells.select(col("id"), posexplode(col("vec")).as(Seq("pos", "x")))
    // gene means, rounded before the bin ordering so cross-engine avg
    // ulps can't reorder the ntile input; pos breaks exact ties
    val mu = x.groupBy("pos")
      .agg(round(avg(col("x")) + lit(1e-9), 6).as("mu"))
    val binned = mu.withColumn("bin",
      ntile(NBins).over(Window.orderBy(col("mu"), col("pos"))))
      .withColumn("in_set", col("pos") % 8 === 0)
    val setBins = binned.filter(col("in_set"))
      .select(col("bin")).distinct()
    val cls = binned.join(broadcast(setBins), Seq("bin"), "left_semi")
      .select(col("pos"),
        when(col("in_set"), lit("set")).otherwise(lit("ctrl")).as("cls"))
    x.join(broadcast(cls), Seq("pos"))
      .groupBy(col("id"))
      .agg(NumFmt.roundSigned(
        avg(when(col("cls") === "set", col("x"))) -
          avg(when(col("cls") === "ctrl", col("x"))) + lit(1e-9), 4).as("score"))
      .select(col("id").as("vec_id"), col("score"))
      .orderBy("vec_id")
  }

  def scoreGenes(s: SparkSession, d: String): DataFrame =
    scoreOnCounts(ScMatrix.counts(s, d))

  val queries: Map[String, Q] = Map("q_sc_score_genes" -> scoreGenes _)

  val oracle: Map[String, String] = Map(
    // generate_subscripts is 1-based where posexplode is 0-based: the
    // signature predicate (pos-1) % 8 = 0 matches Spark's pos % 8 == 0.
    "q_sc_score_genes" ->
      """WITH c AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT vec_id, unnest(v) AS x,
                      generate_subscripts(v, 1) - 1 AS pos FROM c),
         mu AS (SELECT pos, round(avg(x) + 1e-9, 6) AS mu
                FROM x GROUP BY pos),
         binned AS (SELECT pos, mu,
                           ntile(4) OVER (ORDER BY mu, pos) AS bin,
                           pos % 8 = 0 AS in_set
                    FROM mu),
         sb AS (SELECT DISTINCT bin FROM binned WHERE in_set),
         cls AS (SELECT pos,
                        CASE WHEN in_set THEN 'set' ELSE 'ctrl' END AS cls
                 FROM binned WHERE bin IN (SELECT bin FROM sb))
         SELECT x.vec_id,
                round(avg(x) FILTER (WHERE cls = 'set') -
                      avg(x) FILTER (WHERE cls = 'ctrl') + 1e-9, 4) + 0.0
                  AS score
         FROM x JOIN cls ON x.pos = cls.pos
         GROUP BY x.vec_id
         ORDER BY x.vec_id""",
  )
}
