package graft.tables

import java.io.File

/** Once-per-(tag, sfDir-content) cached local fixtures under
  * java.io.tmpdir — derived datasets (zarr twin, media lake, partitioned
  * rewrite) built from the driver's testdata on first use and reused
  * across suites, Verify and Bench runs in one container.
  *
  * Local-mode scaffolding by design: build callbacks may write from
  * executor tasks because local[*] shares the driver filesystem; on a
  * real cluster fixtures would live on a shared store (the production
  * read paths these fixtures feed — DSv2 zarr, parquet, binaryFile —
  * already assume exactly that). The `_DONE` marker is written only
  * after `verify` passes, so a crashed or half-built fixture is rebuilt
  * on the next call instead of being cached broken.
  *
  * The cache key mixes a FINGERPRINT of the source directory's parquet
  * listing (names, sizes, mtimes) into the path: regenerating the
  * tables under an unchanged sfDir path invalidates every derived
  * fixture automatically. Without this, a regenerated corpus silently
  * serves STALE fixtures to the engine while the oracle reads the new
  * parquet — the exact failure mode the r11 sf1 gate hit (13 ids
  * mismatching by a few chars each). Over-invalidation on identical
  * bytes with fresh mtimes costs a rebuild; staleness costs a wrong
  * answer — the trade is one-sided.
  */
object Fixtures {

  /** Stable fingerprint of the source dir's parquet listing. Empty-dir
    * or missing-dir hashes to a constant, so non-table sfDirs (tests
    * passing scratch paths) still cache consistently. `<table>.parquet`
    * can be a plain file (the driver/GenData layout) or a Spark-written
    * DIRECTORY of part files (spec scratch corpora) — the fingerprint
    * walks one level into directories so a rewritten directory corpus
    * invalidates exactly like a rewritten file. */
  private def sourceFingerprint(sfDir: String): String = {
    val entries = Option(new File(sfDir).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    // Full recursive walk: a partitioned Spark write nests part files
    // under partition SUBDIRECTORIES, and a one-level walk would hash
    // them as empty — a regenerated partitioned corpus would then serve
    // stale derived fixtures, the exact staleness this fingerprint exists
    // to prevent. Directory names participate so a renamed partition
    // changes the signature even when its files do not.
    def walk(f: File): String =
      if (f.isFile) s"${f.getName}:${f.length}:${f.lastModified}"
      else {
        val parts = Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName).map(walk).mkString(",")
        s"${f.getName}/[$parts]"
      }
    val sig = entries.map(walk).mkString("|")
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig).toLong & 0xffffffffL)
  }

  def cached(tag: String, sub: String, sfDir: String)
            (build: File => Unit)
            (verify: File => Boolean = _ => true): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_") +
      "_" + sourceFingerprint(sfDir)
    val root = new File(System.getProperty("java.io.tmpdir"), s"graft_$tag$key")
    val dir = new File(root, sub)
    val marker = new File(root, "_DONE")
    if (marker.exists()) return dir.toString
    root.mkdirs()
    // Cross-process guard: Verify and Bench can run concurrently in one
    // container; both missing the marker would interleave writes into the
    // same fixture dir. `synchronized` covers this JVM (and keeps the same
    // JVM from hitting OverlappingFileLockException); the OS FileLock
    // serializes across processes — the loser blocks, then sees the marker
    // under the lock and skips its own build.
    val raf = new java.io.RandomAccessFile(new File(root, "_LOCK"), "rw")
    try {
      val lock = raf.getChannel.lock()
      try {
        if (!marker.exists()) {
          build(dir)
          require(verify(dir), s"fixture $tag/$sub failed its post-build check")
          new java.io.FileOutputStream(marker).close()
        }
      } finally lock.release()
    } finally raf.close()
    dir.toString
  }
}
