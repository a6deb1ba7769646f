package graft.zarr

import org.apache.spark.sql.DataFrame

/** EXACTLY-ONCE streaming sink into a versioned zarr store — Structured
  * Streaming's `foreachBatch` recipe composed with the versioned commit
  * protocol, so each micro-batch publishes an atomic, object-store-safe
  * SNAPSHOT of the stream's state (the natural zarr streaming shape:
  * the store is a dense matrix, so a batch replaces the whole picture —
  * complete-mode aggregations, periodically re-materialized embeddings,
  * model checkpoints).
  *
  * Structured Streaming guarantees `foreachBatch` AT-LEAST-once: after a
  * crash between sink commit and checkpoint advance, the SAME (df,
  * batchId) is replayed. Exactly-once therefore needs the sink to be
  * IDEMPOTENT per batchId, and the versioned store gives that almost
  * for free:
  *
  *  - the version name is a pure function of the batch id
  *    (`v<batchId+1>-<hex batchId>`), NOT of the query id or the
  *    pointer — a replay targets the same directory;
  *  - replay after a crash MID-BUILD: the partial version dir is
  *    deleted and rebuilt (the writer clears its work dir), the pointer
  *    never moved, readers never saw anything;
  *  - replay after the pointer PUT but before the streaming checkpoint
  *    advanced: the pointer already names this batch's version — the
  *    sink SKIPS the write entirely (the one case that separates
  *    exactly-once from at-least-once);
  *  - concurrent readers: each query resolves the pointer once at
  *    table-resolution time and reads an immutable version dir —
  *    a batch landing mid-query cannot tear it.
  *
  * `retainHistory=true` writes with `gc=false`: every batch's snapshot
  * stays readable via `spark.read.format("zarr").option("version",
  * "v<k>-…")` — a full time-travelable history of the stream, with
  * [[ZarrVersioned.vacuum]] as the retention knob.
  *
  * Usage:
  * {{{
  *   stream.writeStream
  *     .foreachBatch(ZarrStreamSink.foreachBatch(path))
  *     .outputMode("complete") ...
  * }}}
  */
object ZarrStreamSink {

  /** The deterministic version name for a batch: replays converge on it. */
  def versionNameFor(batchId: Long): String =
    s"v${batchId + 1}-${java.lang.Long.toHexString(batchId)}"

  /** The inverse: which batch (if any) the committed pointer names. */
  def committedBatch(path: String): Option[Long] =
    ZarrVersioned.readPointer(path, ZarrIO.hadoopConf()).flatMap { v =>
      scala.util.Try(java.lang.Long.parseLong(
        v.substring(v.indexOf('-') + 1), 16)).toOption
        .filter(b => versionNameFor(b) == v)
    }

  /** The `(df, batchId) => Unit` to hand to `writeStream.foreachBatch`.
    * `df` must carry the zarr write schema (row_id BIGINT, vec
    * ARRAY<DOUBLE|FLOAT>). Returns silently (skip) when the pointer
    * already names this batch's version — the replay-after-commit case. */
  def foreachBatch(path: String, chunkRows: Int = 128,
                   retainHistory: Boolean = false)
      : (DataFrame, Long) => Unit = { (df, batchId) =>
    val name = versionNameFor(batchId)
    if (!ZarrVersioned.readPointer(path, ZarrIO.hadoopConf()).contains(name)) {
      df.write.format("zarr")
        .option(ZarrWrite.ChunkRowsOption, chunkRows)
        .option(ZarrWrite.VersionNameOption, name)
        .option(ZarrWrite.GcOption, (!retainHistory).toString)
        .mode("overwrite")
        .save(path)
    }
  }
}
