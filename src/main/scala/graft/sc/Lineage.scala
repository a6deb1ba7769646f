package graft.sc

import org.apache.spark.sql.DataFrame

/** The shared lineage-cut used by every iterative operator (PageRank,
  * BFS, SSSP, k-core, label propagation, dedup connected components).
  *
  * Iterative DataFrame plans double in analysis cost per round if only
  * persisted (persist caches data, not the logical plan); an EAGER
  * checkpoint resets the plan to a scan of the materialized blocks.
  * Two durability tiers:
  *
  *  - `dir = None` → `localCheckpoint`: blocks live on executors.
  *    Fastest (no DFS round-trip) but NON-RESILIENT — losing one
  *    executor mid-job discards blocks that, with lineage cut, cannot
  *    be recomputed: the whole multi-round job dies. Acceptable on
  *    local/ephemeral runs; at 1000-executor scale a 10-round job's
  *    survival probability drops with every round.
  *  - `dir = Some(d)` → reliable `checkpoint` into `d` (HDFS/object
  *    store): each cut writes the frame to durable storage, so a lost
  *    executor re-reads instead of killing the job. Costs one DFS
  *    write + read per cut — the price of restartability, paid only by
  *    callers that opt in.
  *
  * Result equality under both modes is pinned by CheckpointModeSpec:
  * the cut is pure materialization, never a semantic change.
  */
object Lineage {
  /** Cut `df`'s lineage eagerly with the durability tier `dir` selects.
    * Sets the session's checkpoint dir on first reliable use (Spark
    * requires it session-wide; re-setting to the same value is a no-op,
    * and distinct concurrent dirs per session are not a supported
    * pattern anyway). */
  def cut(df: DataFrame, dir: Option[String]): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(d)) sc.setCheckpointDir(d)
      df.checkpoint()
    case None => df.localCheckpoint()
  }
}
