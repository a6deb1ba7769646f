package graft.sc

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.NumFmt
import graft.tables.Tables

/** Downstream-analysis operators on the cell×gene matrix: marker-gene
  * ranking per group (the scanpy `tl.rank_genes_groups` t-test method
  * [recalled:high] — the step after clustering that names each cluster)
  * and covariate regression (`pp.regress_out` — remove a per-cell
  * nuisance covariate, e.g. total counts, from every gene before
  * downstream analysis).
  *
  * Scale shape, both operators: ONE pass over the exploded cell×gene
  * frame into a keyed hash aggregation on (group, gene) / (gene) —
  * partial aggregation (map-side combine) reduces each partition to at
  * most |groups|×|genes| (resp. |genes|) rows before the exchange, so
  * the shuffle volume is bounded by the statistics frame, not the
  * matrix. Per-group-vs-rest statistics come from joining the per-group
  * frame to the broadcast per-gene totals (rest = total − group): the
  * matrix is NOT re-scanned per group, which is what makes
  * rank_genes_groups one job instead of |groups| jobs. Regression
  * residual variance uses the closed form
  * var(resid) = var(x) − cov(x,c)²/var(c), so no second pass over the
  * matrix with fitted coefficients is needed.
  */
object Markers {
  type Q = (SparkSession, String) => DataFrame

  private val TOP_K = 5

  /** Matrix with group labels: (vec_id, label, vec). Same abs-double
    * counts view as ScMatrix.counts; `label` plays the role of the
    * cluster/obs key scanpy groups by. */
  private def labeled(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"), col("label"),
      transform(col("embedding"), x => abs(x.cast("double"))).as("vec"))

  /** rank_genes_groups (t-test flavor): for each label, rank genes by
    * Welch's t of in-group vs rest-of-matrix expression; emit the top
    * TOP_K markers per group with in/rest means.
    *
    * Cross-engine float discipline: the t statistic is computed from raw
    * double sums with an identical op sequence on both engines, rounded
    * at 4 dp (+1e-9 boundary epsilon, +0.0 to normalize a -0.0 — t is
    * signed), and the per-group ranking orders by the ROUNDED t with the
    * gene position as tiebreak so last-ulp accumulation differences
    * cannot reorder rows. The ranking window is |labels|×|genes| rows —
    * bounded by construction, never by cell count. */
  def scMarkers(s: SparkSession, d: String): DataFrame =
    markersFor(labeled(s, d), TOP_K)

  /** The ranking core over any (label, vec) frame — split out so specs
    * can drive it with planted differential-expression fixtures. */
  def markersFor(m: DataFrame, topK: Int): DataFrame = {
    val x = m
      .select(col("label"), posexplode(col("vec")).as(Seq("pos", "val")))
    // the matrix is exploded and aggregated ONCE; the per-gene overall
    // totals are the per-group frame re-summed (a |groups|×|genes| frame
    // — persisting it costs nothing and stops Spark re-scanning the
    // matrix for the second aggregation; column pruning would otherwise
    // specialize the two subtrees past ReuseExchange's identical-plan
    // test). The oracle mirrors the two-level summation so both engines
    // accumulate in the same grouping structure.
    val perGroup = x.groupBy("label", "pos").agg(
        count(lit(1)).cast("double").as("n_g"),
        sum(col("val")).as("s_g"),
        sum(col("val") * col("val")).as("q_g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val overall = perGroup.groupBy("pos").agg(
      sum(col("n_g")).as("n"),
      sum(col("s_g")).as("s"),
      sum(col("q_g")).as("q"))
    val nR = col("n") - col("n_g")
    val meanG = col("s_g") / col("n_g")
    val meanR = (col("s") - col("s_g")) / nR
    // sample variances (ddof=1) from sums of squares; greatest(0, ·)
    // guards the tiny negative a cancellation can leave near var == 0
    val varG = greatest(lit(0.0),
      (col("q_g") - col("s_g") * col("s_g") / col("n_g")) / (col("n_g") - 1))
    val varR = greatest(lit(0.0),
      (col("q") - col("q_g") - (col("s") - col("s_g")) * (col("s") - col("s_g")) / nR)
        / (nR - 1))
    val den2 = varG / col("n_g") + varR / nR
    val scored = perGroup.join(broadcast(overall), Seq("pos"))
      .filter(col("n_g") >= 2 && nR >= 2)
      .select(col("label"), col("pos"),
        NumFmt.roundSigned(when(den2 > 0.0, (meanG - meanR) / sqrt(den2)).otherwise(0.0)
          + lit(1e-9), 4).as("t"),
        round(meanG + lit(1e-9), 6).as("mean_in"),
        round(meanR + lit(1e-9), 6).as("mean_rest"))
    val w = Window.partitionBy("label").orderBy(col("t").desc, col("pos"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("label"), col("rnk"), (col("pos") + 1).cast("int").as("pos1"),
        col("t"), col("mean_in"), col("mean_rest"))
      .orderBy("label", "rnk")
  }

  /** rank_genes_groups, WILCOXON flavor — the rank-sum test scanpy
    * users reach for when expression is non-normal (method='wilcoxon'
    * [recalled:high]). Tie-corrected normal approximation:
    * z = (R₁ − n₁(N+1)/2) / σ with
    * σ² = n₁n₂/12 · ((N+1) − Σ(t³−t)/(N(N−1))).
    *
    * The scale trick: per-gene average ranks are computed on the
    * DISTINCT-VALUE frame ((pos, val) counts + a cumulative-count
    * window partitioned by gene), NEVER by ranking cell-level rows — at
    * 1.3M×28k the cell-level window is a 36-billion-row sort per gene,
    * the distinct-value frame is bounded by distinct values. Ranks join
    * back keyed on (pos, val), and the rank-sum agg is the same
    * |groups|×|genes| frame as the t-test flavor. Average ranks are
    * exact .0/.5 doubles and their sums stay exact (< 2⁵³), so the only
    * float-discipline point is the final z (rounded 4 dp, ordered with
    * pos tiebreak). */
  def scMarkersWilcoxon(s: SparkSession, d: String): DataFrame =
    wilcoxonFor(labeled(s, d), TOP_K)

  /** The rank-sum core over any (label, vec) frame. Both persists feed
    * multiple consumers referenced by the RESULT plan, so they cannot
    * unpersist in-function; lifecycle is harness-released (Bench/Verify
    * clearCache between queries — the Selection.textDsir contract).
    * Looping library callers should clearCache themselves. */
  def wilcoxonFor(m: DataFrame, topK: Int): DataFrame = {
    val x = m
      .select(col("label"), posexplode(col("vec")).as(Seq("pos", "val")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vc = x.groupBy("pos", "val").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // average rank of a tied value group = (cum-exclusive) + (c+1)/2
    val wv = Window.partitionBy("pos").orderBy("val")
    val ranked = vc.withColumn("cum", sum(col("c")).over(wv))
      .select(col("pos"), col("val"),
        ((col("cum") - col("c")).cast("double") +
          (col("c") + 1).cast("double") / 2.0).as("avg_rank"))
    val ties = vc.groupBy("pos")
      .agg(sum(col("c") * col("c") * col("c") - col("c")).as("tsum"))
    val grp = x.join(ranked, Seq("pos", "val"))
      .groupBy("label", "pos")
      .agg(count(lit(1)).as("n1"), sum(col("avg_rank")).as("r1"))
    val totals = x.groupBy("pos").agg(count(lit(1)).as("nn"))
    val n2 = col("nn") - col("n1")
    val mu = col("n1").cast("double") * (col("nn") + 1).cast("double") / 2.0
    val sig2 = col("n1").cast("double") * n2.cast("double") / 12.0 *
      ((col("nn") + 1).cast("double") -
        col("tsum").cast("double") /
          (col("nn").cast("double") * (col("nn") - 1).cast("double")))
    val scored = grp
      .join(broadcast(totals), Seq("pos"))
      .join(broadcast(ties), Seq("pos"))
      .select(col("label"), col("pos"),
        NumFmt.roundSigned(when(sig2 > 0.0, (col("r1") - mu) / sqrt(sig2))
          .otherwise(0.0) + lit(1e-9), 4).as("z"),
        round(col("r1") + lit(1e-9), 2).as("rank_sum"))
    val w = Window.partitionBy("label").orderBy(col("z").desc, col("pos"))
    val out = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topK)
      .select(col("label"), col("rnk"),
        (col("pos") + 1).cast("int").as("pos1"), col("z"), col("rank_sum"))
      .orderBy("label", "rnk")
    out
  }

  /** regress_out: per-gene simple linear regression of expression on the
    * per-cell total-count covariate (the scanpy default nuisance
    * regressor); emits slope, intercept, and residual RMS per gene.
    *
    * The residual variance is closed-form
    * (var(x) − cov(x,c)²/var(c)), so the whole fit is one keyed
    * aggregation — no second fitted-coefficients pass. covar_pop /
    * var_pop are native partial-aggregable Catalyst aggregates. */
  def scRegressOut(s: SparkSession, d: String): DataFrame =
    regressOutFor(ScMatrix.counts(s, d))

  /** The regression core over any (vec) frame of per-cell double arrays
    * — split out for closed-form spec fixtures (exactly-linear data must
    * recover the slope with zero residual). */
  def regressOutFor(m: DataFrame): DataFrame = {
    val withTot = m
      .select(col("vec"),
        aggregate(col("vec"), lit(0.0), (a, v) => a + v).as("tot"))
    val x = withTot.select(col("tot"),
      posexplode(col("vec")).as(Seq("pos", "val")))
    val st = x.groupBy("pos").agg(
      covar_pop(col("val"), col("tot")).as("cxy"),
      var_pop(col("tot")).as("vc"),
      var_pop(col("val")).as("vx"),
      avg(col("val")).as("mx"),
      avg(col("tot")).as("mc"))
    val slope = when(col("vc") > 0.0, col("cxy") / col("vc")).otherwise(0.0)
    st.select((col("pos") + 1).cast("int").as("pos1"),
        NumFmt.roundSigned(slope + lit(1e-9), 6).as("slope"),
        NumFmt.roundSigned(col("mx") - slope * col("mc") + lit(1e-9), 6)
          .as("intercept"),
        round(sqrt(greatest(lit(0.0),
          col("vx") - when(col("vc") > 0.0, col("cxy") * col("cxy") / col("vc"))
            .otherwise(0.0))) + lit(1e-9), 6).as("resid_rms"))
      .orderBy("pos1")
  }

  /** downsample_counts (scanpy pp.downsample_counts [recalled:med]):
    * reduce each cell's integerized counts to a fixed target total,
    * deterministically. scanpy samples without replacement (random);
    * this is the largest-remainder (Hamilton) apportionment instead —
    * the unique deterministic allocation closest to proportional, so
    * both engines and every retry produce the identical matrix.
    *
    * Per cell: base_i = ⌊c_i·T/tot⌋, then the T−Σbase leftover units go
    * to the largest remainders (c_i·T mod tot), position ascending on
    * ties. ALL-INTEGER arithmetic — no doubles, no rounding epsilons,
    * the oracle matches exactly. Cells already at or under target pass
    * through. Purely per-row (one projection, no shuffle at all until
    * the output sort); the O(d²) tie-rank inside the row is d=|genes|
    * wide — bounded, codegen'd, and embarrassingly parallel at 100 TB. */
  def scDownsample(s: SparkSession, d: String): DataFrame =
    downsampleFor(Tables.embeddings(s, d).select(
      col("vec_id"),
      transform(col("embedding"),
        x => floor(abs(x.cast("double")) * 4).cast("long")).as("c")),
      target = 40L)

  /** The apportionment core over any (vec_id, c: array<long>) frame. */
  def downsampleFor(m: DataFrame, target: Long): DataFrame = {
    val tot = aggregate(col("c"), lit(0L), (a, x) => a + x)
    val t = m.select(col("vec_id"), col("c"), tot.as("tot"))
    // integer division via subtract-remainder (Column has no `div`;
    // the double quotient of an exactly-divisible pair is exact)
    val base = transform(col("c"), x =>
      (((x * lit(target)) - ((x * lit(target)) % col("tot")))
        / col("tot")).cast("long"))
    val rem = transform(col("c"), x => (x * lit(target)) % col("tot"))
    val withParts = t.filter(col("tot") > 0)
      .select(col("vec_id"), col("c"), col("tot"),
        base.as("base"), rem.as("rem"))
    val deficit = lit(target) - aggregate(col("base"), lit(0L), (a, x) => a + x)
    // element i receives a leftover unit iff fewer than `deficit`
    // elements beat it by (remainder desc, position asc)
    val idx = sequence(lit(0), size(col("c")) - 1)
    val out = transform(idx, i =>
      element_at(col("base"), i + 1) +
        when(size(filter(idx, j =>
          element_at(col("rem"), j + 1) > element_at(col("rem"), i + 1) ||
            (element_at(col("rem"), j + 1) === element_at(col("rem"), i + 1)
              && j < i))) < deficit, 1L).otherwise(0L))
    withParts
      .select(col("vec_id"), col("tot").as("tot_before"),
        when(col("tot") <= target, col("c")).otherwise(out).as("ds"))
      .select(col("vec_id"), col("tot_before"),
        aggregate(col("ds"), lit(0L), (a, x) => a + x).as("tot_after"),
        aggregate(zip_with(col("ds"),
            sequence(lit(1), size(col("ds"))), (x, i) => x * i),
          lit(0L), (a, x) => a + x).as("wsum"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map(
    "q_sc_markers"     -> scMarkers _,
    "q_sc_markers_wilcoxon" -> scMarkersWilcoxon _,
    "q_sc_regress_out" -> scRegressOut _,
    "q_sc_downsample"  -> scDownsample _,
  )

  val oracle: Map[String, String] = Map(
    // distinct-value average ranks (exact .0/.5 doubles), tie-corrected
    // σ², identical op sequence for μ/σ²/z, rank on ROUNDED z + pos
    "q_sc_markers_wilcoxon" ->
      """WITH c AS (SELECT vec_id, label,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT label, unnest(v) AS val,
                      generate_subscripts(v, 1) AS pos FROM c),
         vc AS (SELECT pos, val, CAST(count(*) AS BIGINT) AS cnt
                FROM x GROUP BY pos, val),
         rk AS (SELECT pos, val,
                       CAST(sum(cnt) OVER (PARTITION BY pos ORDER BY val)
                            - cnt AS DOUBLE)
                       + CAST(cnt + 1 AS DOUBLE) / 2.0 AS avg_rank
                FROM vc),
         tt AS (SELECT pos, sum(cnt * cnt * cnt - cnt) AS tsum
                FROM vc GROUP BY pos),
         g AS (SELECT label, pos, CAST(count(*) AS BIGINT) AS n1,
                      sum(avg_rank) AS r1
               FROM x JOIN rk USING (pos, val) GROUP BY label, pos),
         tot AS (SELECT pos, CAST(count(*) AS BIGINT) AS nn
                 FROM x GROUP BY pos),
         j AS (SELECT label, pos, r1,
                      CAST(n1 AS DOUBLE) * CAST(nn + 1 AS DOUBLE) / 2.0
                        AS mu,
                      CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE) / 12.0 *
                        (CAST(nn + 1 AS DOUBLE) - CAST(tsum AS DOUBLE) /
                          (CAST(nn AS DOUBLE) * CAST(nn - 1 AS DOUBLE)))
                        AS sig2
               FROM g JOIN tot USING (pos) JOIN tt USING (pos)),
         sc AS (SELECT label, pos,
                       round(CASE WHEN sig2 > CAST(0 AS DOUBLE)
                                  THEN (r1 - mu) / sqrt(sig2)
                                  ELSE CAST(0 AS DOUBLE) END + 1e-9, 4)
                         + 0.0 AS z,
                       round(r1 + 1e-9, 2) AS rank_sum
                FROM j),
         r AS (SELECT label, pos, z, rank_sum,
                      row_number() OVER (PARTITION BY label
                        ORDER BY z DESC, pos) AS rnk
               FROM sc)
         SELECT label, CAST(rnk AS INT) AS rnk, CAST(pos AS INT) AS pos1,
                z, rank_sum
         FROM r WHERE rnk <= 5 ORDER BY label, rnk""",
    // identical op sequence: sums of doubles → Welch t → round(·,4) →
    // rank on the ROUNDED t with pos tiebreak
    "q_sc_markers" ->
      """WITH c AS (SELECT vec_id, label,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT label, unnest(v) AS val,
                      generate_subscripts(v, 1) AS pos FROM c),
         g AS (SELECT label, pos, CAST(count(*) AS DOUBLE) AS n_g,
                      sum(val) AS s_g, sum(val * val) AS q_g
               FROM x GROUP BY label, pos),
         o AS (SELECT pos, sum(n_g) AS n, sum(s_g) AS s, sum(q_g) AS q
               FROM g GROUP BY pos),
         j AS (SELECT label, pos,
                      s_g / n_g AS mean_g,
                      (s - s_g) / (n - n_g) AS mean_r,
                      greatest(CAST(0 AS DOUBLE),
                        (q_g - s_g * s_g / n_g) / (n_g - 1)) / n_g
                      + greatest(CAST(0 AS DOUBLE),
                          (q - q_g - (s - s_g) * (s - s_g) / (n - n_g))
                          / (n - n_g - 1)) / (n - n_g) AS den2
               FROM g JOIN o USING (pos)
               WHERE n_g >= 2 AND n - n_g >= 2),
         sc AS (SELECT label, pos,
                       round(CASE WHEN den2 > CAST(0 AS DOUBLE)
                                  THEN (mean_g - mean_r) / sqrt(den2)
                                  ELSE CAST(0 AS DOUBLE) END + 1e-9, 4)
                         + 0.0 AS t,
                       round(mean_g + 1e-9, 6) AS mean_in,
                       round(mean_r + 1e-9, 6) AS mean_rest
                FROM j),
         r AS (SELECT label, pos, t, mean_in, mean_rest,
                      row_number() OVER (PARTITION BY label
                                         ORDER BY t DESC, pos) AS rnk
               FROM sc)
         SELECT label, CAST(rnk AS INT) AS rnk, CAST(pos AS INT) AS pos1,
                t, mean_in, mean_rest
         FROM r WHERE rnk <= 5 ORDER BY label, rnk""",
    // ALL-INTEGER apportionment: // and % on BIGINTs, no rounding —
    // the one sc oracle with exact equality by construction
    "q_sc_downsample" ->
      """WITH m AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> CAST(floor(abs(CAST(x AS DOUBLE)) * 4)
                                       AS BIGINT)) AS c
                    FROM embeddings),
         t AS (SELECT vec_id, c, list_sum(c) AS tot FROM m
               WHERE list_sum(c) > 0),
         p AS (SELECT vec_id, c, tot,
                      list_transform(c, x -> (x * 40) // tot) AS base,
                      list_transform(c, x -> (x * 40) % tot) AS rem
               FROM t),
         q AS (SELECT vec_id, c, tot, base, rem,
                      40 - list_sum(base) AS deficit,
                      range(0, len(c)) AS idx
               FROM p),
         o AS (SELECT vec_id, tot AS tot_before,
                      CASE WHEN tot <= 40 THEN c
                           ELSE list_transform(idx, i -> base[i + 1] +
                             CASE WHEN len(list_filter(idx, j ->
                                    rem[j + 1] > rem[i + 1] OR
                                    (rem[j + 1] = rem[i + 1] AND j < i)))
                                  < deficit
                                  THEN 1 ELSE 0 END)
                      END AS ds
               FROM q)
         SELECT vec_id, CAST(tot_before AS BIGINT) AS tot_before,
                CAST(list_sum(ds) AS BIGINT) AS tot_after,
                CAST(list_sum(list_transform(range(0, len(ds)),
                       i -> ds[i + 1] * (i + 1))) AS BIGINT) AS wsum
         FROM o ORDER BY vec_id""",
    "q_sc_regress_out" ->
      """WITH c AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT list_sum(v) AS tot, unnest(v) AS val,
                      generate_subscripts(v, 1) AS pos FROM c),
         st AS (SELECT pos, covar_pop(val, tot) AS cxy,
                       var_pop(tot) AS vc, var_pop(val) AS vx,
                       avg(val) AS mx, avg(tot) AS mc
                FROM x GROUP BY pos),
         f AS (SELECT pos,
                      CASE WHEN vc > CAST(0 AS DOUBLE) THEN cxy / vc
                           ELSE CAST(0 AS DOUBLE) END AS slope,
                      vx, vc, cxy, mx, mc
               FROM st)
         SELECT CAST(pos AS INT) AS pos1,
                round(slope + 1e-9, 6) + 0.0 AS slope,
                round(mx - slope * mc + 1e-9, 6) + 0.0 AS intercept,
                round(sqrt(greatest(CAST(0 AS DOUBLE),
                  vx - CASE WHEN vc > CAST(0 AS DOUBLE)
                            THEN cxy * cxy / vc
                            ELSE CAST(0 AS DOUBLE) END)) + 1e-9, 6)
                  AS resid_rms
         FROM f ORDER BY pos1""",
  )
}
