package graft.rel

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Memory-pressure gate (round-8 advisory: every number so far came off
  * a 128 GiB box that never spills). Rather than a child JVM with a tiny
  * heap — which would fork the whole harness — this drives the SAME
  * queries through a sibling session whose SQL spill thresholds force
  * the spill code paths after a few dozen rows:
  *
  *  - `windowExec.buffer.spill.threshold` → every WindowExec buffers
  *    through ExternalAppendOnlyUnsafeRowArray's spill-to-disk path;
  *  - `sortMergeJoinExec.buffer.spill.threshold` + broadcast joins
  *    disabled → every equi-join becomes a sort-merge join whose
  *    buffered side spills;
  *  - `objectHashAggregate.sortBased.fallbackThreshold` → typed
  *    aggregates fall back to the sort-based path.
  *
  * These are the identical operator implementations that spill under
  * genuine executor-memory pressure at 100 TB — the threshold knobs
  * only move the trigger, not the code path. The spec pins (a) bytes
  * actually spilled (listener-observed, so the gate fails if a Spark
  * upgrade silently stops exercising the path) and (b) bit-identical
  * results vs the never-spilling default session. */
class SpillSpec extends SparkSpec {

  // batch queries with window/join/agg shapes heavy enough to buffer
  private val QueryNames = Seq(
    "q_window_rank", "q_window_running_sum", "q_window_lag",
    "q_join_shuffle", "q_join_left", "q_agg_distinct", "q_topk",
    "q_dedup_exact", "q_agg_hash")

  // the suffix rank refinement (two keyed windows per doubling round,
  // lead/offset frames) gets a MILDER forced threshold: at 32 rows each
  // ~300-row doc partition fragments into ~10 spill files and every
  // offset frame holds a 1 MB reader per file across three lead frames
  // × rounds — hundreds of MB of reader buffers from the TEST harness's
  // pathological knob, not from the operator (a genuine memory-pressure
  // spill produces a handful of large files, the 256-row shape). 256
  // still spills every doc partition and drives the same
  // ExternalAppendOnlyUnsafeRowArray path.
  private val SuffixQueryNames = Seq("q_dedup_suffix_window")

  private def forcedSpillSession(threshold: Int) = {
    val spilly = spark.newSession()
    spilly.conf.set("spark.sql.windowExec.buffer.spill.threshold", threshold.toString)
    spilly.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", threshold.toString)
    spilly.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", threshold.toString)
    spilly.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", threshold.toString)
    spilly.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (threshold / 2).toString)
    spilly.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spilly.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spilly
  }

  test("forced-spill session: spills observed, results bit-identical") {
    val plain = spark

    @volatile var spilledBytes = 0L
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          spilledBytes += t.taskMetrics.memoryBytesSpilled +
            t.taskMetrics.diskBytesSpilled
    }

    def run(s: org.apache.spark.sql.SparkSession, name: String): Seq[String] =
      SparkEntry.queries(name)(s, sf).collect()
        .map(_.toString).sorted.toSeq

    def gate(names: Seq[String], spilly: org.apache.spark.sql.SparkSession): Unit =
      names.foreach { name =>
        val expect = run(plain, name)
        spark.sparkContext.addSparkListener(listener)
        val got =
          try run(spilly, name)
          finally spark.sparkContext.removeSparkListener(listener)
        assert(got == expect, s"$name: spill path changed the result")
      }

    gate(QueryNames, forcedSpillSession(32))
    gate(SuffixQueryNames, forcedSpillSession(256))
    // the whole point: the spill code path actually ran
    assert(spilledBytes > 0L,
      "no task reported spilled bytes — thresholds no longer force the path")
    info(s"observed spill across ${QueryNames.size + SuffixQueryNames.size} " +
      s"queries: $spilledBytes bytes")
  }
}
