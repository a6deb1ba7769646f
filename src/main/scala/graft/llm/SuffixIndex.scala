package graft.llm

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.{Fixtures, Tables}

/** The corpus SUFFIX INDEX: the prefix-doubling class ladder of
  * [[Suffix.ranksWithLevels]], built ONCE per corpus and persisted as a
  * reusable columnar artifact — the batch-pipeline shape of suffix-array
  * corpus dedup, where the expensive global suffix ordering is
  * constructed in one pass and then MANY analyses (census, window dedup,
  * coverage clipping, longest-repeat) consume it.
  *
  * Why an index and not per-query recomputation: the ladder is
  * O(N·log L) shuffle rounds over one row per corpus POSITION — at
  * 100 TB it is by far the most expensive artifact in the suffix-dedup
  * family, while every consumer is a handful of cheap keyed
  * aggregations over its fixed-width (doc_id, pos, rank) rows. The
  * published suffix-dedup pipelines build the suffix array once per
  * corpus snapshot for exactly this reason. Locally the index lives
  * under java.io.tmpdir via [[graft.tables.Fixtures.cached]], keyed on
  * a FINGERPRINT of the corpus parquet listing (a regenerated corpus
  * rebuilds the index, never serves stale ranks); on a cluster the same
  * artifact would be parquet on the shared store beside the corpus.
  *
  * Layout: `<cache>/levels/w<width>/` — one parquet dataset of
  * (doc_id, pos, rank) per ladder level, widths ascending, the last
  * level ranked at `cap` = the smallest power of two >= the longest
  * document (or earlier if the ladder saturated — all classes
  * singleton, every further level identical by construction). A
  * `_WIDTHS` manifest pins the level list so readers never glob blind.
  *
  * Equality with direct computation is spec-pinned
  * (SuffixIndexSpec: every persisted level == the in-memory ladder
  * frame, row-exact), so consumers inherit the [[Suffix]] proofs.
  */
object SuffixIndex {

  /** Hadoop FileSystem for `path` under this session's conf — the level
    * data already goes through Spark's FS-agnostic parquet writer, so the
    * MANIFEST must too: on the shared-store deployment the scaladoc
    * promises (the artifact beside the corpus on `hdfs://`/`gs://`), a
    * `java.nio.file` manifest would fail at the last step of the build. */
  private def fsFor(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Build the index for `docs` at an EXPLICIT path — the cluster-store
    * entry point (parquet beside the corpus; the local fixture route
    * below delegates here, so every gate run exercises this writer).
    * The `_WIDTHS` manifest is written LAST: a killed build leaves no
    * manifest and readers refuse, never half-read. A manifest already
    * present means the artifact is complete — buildAt is an idempotent
    * no-op then (delete the directory to force a rebuild; the fingerprint
    * route below gets a FRESH path per corpus generation, so staleness
    * is the explicit-path caller's contract, as with any shared-store
    * artifact).
    *
    * Concurrent builders at the same explicit path (two pipeline runs
    * racing on a shared store — the local fixture route is already
    * serialized by [[Fixtures.cached]]'s FileLock) are serialized by an
    * exclusive-create `_BUILD_LOCK`: `FileSystem.create(overwrite=false)`
    * is atomic on HDFS-semantics stores, so exactly one builder wins;
    * the loser polls for the winner's manifest instead of interleaving
    * parquet overwrites into the same level dirs. A builder that DIES
    * holding the lock leaves no manifest, so readers still refuse
    * loudly; the stale lock is operator-removable (documented contract,
    * same as Spark's own output-committer temp dirs). */
  def buildAt(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    val (fs, root) = fsFor(spark, path)
    val manifest = new org.apache.hadoop.fs.Path(root, "_WIDTHS")
    if (fs.exists(manifest)) return // already built (manifest-last ⇒ complete)
    fs.mkdirs(root)
    val lock = new org.apache.hadoop.fs.Path(root, "_BUILD_LOCK")
    val won =
      try { fs.create(lock, /* overwrite = */ false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!won) {
      // another builder holds the lock: wait for its manifest-last commit
      val deadlineNs = System.nanoTime() + 30L * 60 * 1000000000L
      while (!fs.exists(manifest)) {
        require(System.nanoTime() < deadlineNs,
          s"suffix index build at $path: lock held but no manifest after " +
            "30 min — a builder died mid-build; remove _BUILD_LOCK and retry")
        Thread.sleep(500)
      }
      return
    }
    try {
      val maxLen = docs.agg(coalesce(max(length(col("text"))), lit(2)))
        .head.getInt(0)
      var cap = 2
      while (cap < maxLen) cap *= 2
      val (_, lvls) = Suffix.ranksWithLevels(docs, cap)
      lvls.foreach { case (w, t) =>
        t.write.mode("overwrite").parquet(s"$path/" + f"w$w%08d")
      }
      val out = fs.create(manifest, /* overwrite = */ true)
      try out.write(lvls.map(_._1).mkString(",").getBytes("UTF-8"))
      finally out.close()
    } finally fs.delete(lock, false)
  }

  /** Open an index previously written by [[buildAt]]: the ascending
    * (width, frame) ladder, manifest-driven (no blind globbing). */
  def openAt(s: SparkSession, path: String): Seq[(Int, DataFrame)] = {
    val (fs, root) = fsFor(s, path)
    val manifest = new org.apache.hadoop.fs.Path(root, "_WIDTHS")
    require(fs.exists(manifest) && fs.getFileStatus(manifest).isFile,
      s"no suffix index at $path (missing _WIDTHS manifest — incomplete build?)")
    val in = fs.open(manifest)
    val widths =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    widths.split(",").map(_.toInt).toSeq
      .map(w => w -> s.read.parquet(s"$path/" + f"w$w%08d"))
  }

  /** Opened-ladder handles per (session, index dir): METADATA caching
    * only — the values are lazy parquet-scan plans (no rows, no results;
    * every consumer still computes from the parquet index at action
    * time), saved because [[openAt]] pays file listing + footer schema
    * reads per level per call, ~0.3 s × five suffix consumers × every
    * run (r12 measured). Safe by construction: the fixture route hands
    * out a FRESH fingerprint-keyed dir per corpus generation (a memo
    * entry can never alias a regenerated corpus), and entries die with
    * their session (WeakHashMap key). Explicit-path [[openAt]] callers
    * are NOT memoized — their delete-and-rebuild contract allows the
    * artifact at a fixed path to change. */
  private val openedLadders =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, DataFrame)]]]()

  /** Build (first call per corpus fingerprint) or open the index; returns
    * the ascending (width, frame) ladder. */
  def levels(s: SparkSession, sfDir: String): Seq[(Int, DataFrame)] = {
    val dir = Fixtures.cached("suffixidx", "levels", sfDir) { out =>
      buildAt(Tables.documents(s, sfDir), out.toString)
    } { out => new File(out, "_WIDTHS").isFile }
    val perSession = openedLadders.synchronized {
      var m = openedLadders.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[
          String, Seq[(Int, DataFrame)]]()
        openedLadders.put(s, m)
      }
      m
    }
    perSession.computeIfAbsent(dir, d => openAt(s, d))
  }

  /** The full suffix ranking (ties = identical whole suffixes): the
    * ladder's last level. */
  def full(s: SparkSession, sfDir: String): DataFrame =
    levels(s, sfDir).last._2

  /** The level whose classes witness `w`-char prefix equality: the
    * ladder lands on every radix step exactly (1, 4, 64, …, cap), so a
    * `w` on the ladder is returned directly; a ladder that SATURATED
    * below `w` (all classes singleton) returns its last level — further
    * refinement is the identity, so its classes (and head-ordinal
    * ranks) already equal the width-`w` ones. A `w` that is neither on
    * the ladder nor past saturation is a contract error, not a silent
    * approximation. */
  def levelFor(s: SparkSession, sfDir: String, w: Int): DataFrame = {
    val lvls = levels(s, sfDir)
    lvls.find(_._1 == w) match {
      case Some((_, t)) => t
      case None =>
        val (lastW, lastT) = lvls.last
        require(lastW < w,
          s"suffix index ladder skipped width $w (ladder: ${lvls.map(_._1)})")
        lastT // saturated (or capped) below w: provably identical classes
    }
  }
}
