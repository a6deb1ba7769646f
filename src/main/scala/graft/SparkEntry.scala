package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's query map. Each module owns its
  * queries AND their DuckDB oracle SQL side-by-side so the two cannot
  * drift (driver hash-compares column-sorted results at sf0.01).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped scan→filter→hash-agg→sort (SURVEY.md §7.2). */
  def entry(spark: SparkSession): DataFrame =
    rel.Relational.aggHash(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rel.Relational.queries ++ rel.WindowSetSort.queries ++
      rel.ScalarFuncs.queries ++ rel.AsOf.queries ++ sc.ScQueries.queries ++
      llm.TextOps.queries ++ llm.Dedup.queries ++ llm.Similarity.queries ++
      llm.Multimodal.queries ++ stream.Events.queries ++ sc.Pca.queries ++
      zarr.ZarrQueries.queries ++ sc.ScSparse.queries ++ sc.MtxQueries.queries ++
      rel.Skew.queries ++ rel.TypedOps.queries ++ tables.Partitioned.queries ++
      rel.Temporal.queries ++ llm.Sampling.queries ++
      rel.Subqueries.queries ++ stream.Funnel.queries ++
      rel.Merge.queries ++ llm.Privacy.queries ++
      llm.Chunking.queries ++ llm.Packing.queries ++
      sc.Neighbors.queries ++ tables.Bucketed.queries ++
      sources.JsonLines.queries ++ stream.TimeSeries.queries ++
      sc.PageRank.queries ++ sources.Evolution.queries ++
      sc.Communities.queries ++ sources.OtherFormats.queries ++
      tables.Profile.queries ++ sc.Markers.queries ++ rel.Linkage.queries ++
      sc.H5Ingest.queries ++ sc.H5adIngest.queries ++
      llm.HeavyHitters.queries ++
      tables.Sorted.queries ++ tables.ZOrder.queries ++
      rel.TpchDeep.queries ++ stream.TopKStream.queries ++
      stream.StateMetrics.queries ++ rel.MoreJoins.queries ++
      llm.LmScore.queries ++ sc.Bfs.queries ++
      sc.QcMetrics.queries ++ sc.ScoreGenes.queries ++
      llm.PrefixJoin.queries ++ llm.ImageHash.queries ++
      llm.Selection.queries ++ llm.AudioFp.queries ++
      rel.SpatialGrid.queries ++ rel.IntervalJoin.queries ++
      sc.Sssp.queries ++ stream.Acf.queries ++ stream.Sessionize.queries ++
      llm.KnnClassify.queries ++ llm.ParagraphDedup.queries ++
      rel.BitmapAgg.queries ++ sc.LinkPredict.queries ++
      sc.KCore.queries ++ rel.Incremental.queries ++
      llm.RetrievalEval.queries ++ llm.UnigramLm.queries ++ llm.Cdc.queries ++
      llm.Suffix.queries ++ llm.NearDedupStream.queries ++
      sc.AnnData.queries ++ zarr.ForeignZarr.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate/impl-defined results) → driver records rows-only check. */
  def oracleSql: Map[String, String] =
    rel.Relational.oracle ++ rel.WindowSetSort.oracle ++
      rel.ScalarFuncs.oracle ++ rel.AsOf.oracle ++ sc.ScQueries.oracle ++
      llm.TextOps.oracle ++ llm.Dedup.oracle ++ llm.Similarity.oracle ++
      llm.Multimodal.oracle ++ stream.Events.oracle ++ sc.Pca.oracle ++
      zarr.ZarrQueries.oracle ++ sc.ScSparse.oracle ++ sc.MtxQueries.oracle ++
      rel.Skew.oracle ++ rel.TypedOps.oracle ++ tables.Partitioned.oracle ++
      rel.Temporal.oracle ++ llm.Sampling.oracle ++
      rel.Subqueries.oracle ++ stream.Funnel.oracle ++
      rel.Merge.oracle ++ llm.Privacy.oracle ++
      llm.Chunking.oracle ++ llm.Packing.oracle ++
      sc.Neighbors.oracle ++ tables.Bucketed.oracle ++
      sources.JsonLines.oracle ++ stream.TimeSeries.oracle ++
      sc.PageRank.oracle ++ sources.Evolution.oracle ++
      sc.Communities.oracle ++ sources.OtherFormats.oracle ++
      tables.Profile.oracle ++ sc.Markers.oracle ++ rel.Linkage.oracle ++
      sc.H5Ingest.oracle ++ sc.H5adIngest.oracle ++
      llm.HeavyHitters.oracle ++
      tables.Sorted.oracle ++ tables.ZOrder.oracle ++
      rel.TpchDeep.oracle ++ stream.TopKStream.oracle ++
      stream.StateMetrics.oracle ++ rel.MoreJoins.oracle ++
      llm.LmScore.oracle ++ sc.Bfs.oracle ++
      sc.QcMetrics.oracle ++ sc.ScoreGenes.oracle ++
      llm.PrefixJoin.oracle ++ llm.ImageHash.oracle ++
      llm.Selection.oracle ++ llm.AudioFp.oracle ++
      rel.SpatialGrid.oracle ++ rel.IntervalJoin.oracle ++
      sc.Sssp.oracle ++ stream.Acf.oracle ++ stream.Sessionize.oracle ++
      llm.KnnClassify.oracle ++ llm.ParagraphDedup.oracle ++
      rel.BitmapAgg.oracle ++ sc.LinkPredict.oracle ++
      sc.KCore.oracle ++ rel.Incremental.oracle ++
      llm.RetrievalEval.oracle ++ llm.UnigramLm.oracle ++ llm.Cdc.oracle ++
      llm.Suffix.oracle ++ llm.NearDedupStream.oracle ++
      sc.AnnData.oracle ++ zarr.ForeignZarr.oracle
}
