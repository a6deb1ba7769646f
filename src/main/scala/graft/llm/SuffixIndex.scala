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

  /** Build the index for `docs` at an EXPLICIT path — the cluster-store
    * entry point (parquet beside the corpus; the local fixture route
    * below delegates here, so every gate run exercises this writer).
    * The `_WIDTHS` manifest is written LAST: a killed build leaves no
    * manifest and readers refuse, never half-read. */
  def buildAt(docs: DataFrame, path: String): Unit = {
    val maxLen = docs.agg(coalesce(max(length(col("text"))), lit(2)))
      .head.getInt(0)
    var cap = 2
    while (cap < maxLen) cap *= 2
    val (_, lvls) = Suffix.ranksWithLevels(docs, cap)
    lvls.foreach { case (w, t) =>
      t.write.mode("overwrite").parquet(s"$path/" + f"w$w%08d")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_WIDTHS"), lvls.map(_._1).mkString(","))
  }

  /** Open an index previously written by [[buildAt]]: the ascending
    * (width, frame) ladder, manifest-driven (no blind globbing). */
  def openAt(s: SparkSession, path: String): Seq[(Int, DataFrame)] = {
    val manifest = java.nio.file.Paths.get(path, "_WIDTHS")
    require(java.nio.file.Files.isRegularFile(manifest),
      s"no suffix index at $path (missing _WIDTHS manifest — incomplete build?)")
    java.nio.file.Files.readString(manifest).split(",").map(_.toInt).toSeq
      .map(w => w -> s.read.parquet(s"$path/" + f"w$w%08d"))
  }

  /** Build (first call per corpus fingerprint) or open the index; returns
    * the ascending (width, frame) ladder. */
  def levels(s: SparkSession, sfDir: String): Seq[(Int, DataFrame)] = {
    val dir = Fixtures.cached("suffixidx", "levels", sfDir) { out =>
      buildAt(Tables.documents(s, sfDir), out.toString)
    } { out => new File(out, "_WIDTHS").isFile }
    openAt(s, dir)
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
