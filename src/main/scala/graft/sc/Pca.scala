package graft.sc

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PCA over the preprocessed matrix — reference R14 (SURVEY.md §2A): the
  * repo's experiments ran 50-component PCA on the recipe output via
  * single-node sklearn/dask; here it's MLlib's distributed PCA on a Vector
  * column (north-star surface "DataFrame ops + MLlib").
  *
  * Scale: MLlib PCA computes the Gramian via one tree-aggregated pass
  * (O(d²) driver memory, d = #genes post-HVG — small by construction after
  * recipe selection) then local SVD; scores are a broadcast matrix multiply
  * on executors. For d beyond ~10k, switch to randomized SVD — out of scope
  * for the testbed's d≤64.
  */
object Pca {
  type Q = (SparkSession, String) => DataFrame

  /** (id, vec ARRAY<DOUBLE>) → (id, pc ARRAY<DOUBLE>) with k components.
    * Array↔Vector conversion uses MLlib's built-in `array_to_vector` /
    * `vector_to_array` expressions (no boxing Scala UDF — the hand-rolled
    * udf boxed every element of every row). */
  def project(df: DataFrame, k: Int): DataFrame = {
    // persist: BOTH the Gramian fit and the score transform consume this
    // frame — without the cache the entire upstream pipeline (recipe:
    // 6 stages) executes twice per run. Lifecycle follows the session
    // cache (Bench clears it between queries).
    val withFeatures = df.withColumn("features", array_to_vector(col("vec")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = new PCA().setInputCol("features").setOutputCol("pc_vec")
      .setK(k).fit(withFeatures)
    model.transform(withFeatures)
      .withColumn("pc", vector_to_array(col("pc_vec")))
      .select(col("id"), col("pc"))
  }

  /** recipe_zheng17 → PCA scores, summarized per cell (rows-only query:
    * eigenvector sign is implementation-defined, so the oracle-able outputs
    * are sign-invariant norms, checked in PcaSpec). */
  def scPca(s: SparkSession, d: String): DataFrame = {
    val recipe = ScMatrix.recipeZheng17(ScMatrix.counts(s, d), 16)
    project(recipe, k = 8)
      .select(col("id").as("vec_id"),
        round(sqrt(aggregate(transform(col("pc"), x => x * x),
          lit(0.0), _ + _)), 3).as("pc_norm"),
        size(col("pc")).as("n_components"))
      .orderBy("vec_id")
  }

  val queries: Map[String, Q] = Map("q_sc_pca" -> scPca _)
  val oracle: Map[String, String] = Map.empty
}
