package graft.tables

import java.io.File

/** Once-per-(tag, sfDir) cached local fixtures under java.io.tmpdir —
  * derived datasets (zarr twin, media lake, partitioned rewrite) built
  * from the driver's testdata on first use and reused across suites,
  * Verify and Bench runs in one container.
  *
  * Local-mode scaffolding by design: build callbacks may write from
  * executor tasks because local[*] shares the driver filesystem; on a
  * real cluster fixtures would live on a shared store (the production
  * read paths these fixtures feed — DSv2 zarr, parquet, binaryFile —
  * already assume exactly that). The `_DONE` marker is written only
  * after `verify` passes, so a crashed or half-built fixture is rebuilt
  * on the next call instead of being cached broken.
  */
object Fixtures {

  def cached(tag: String, sub: String, sfDir: String)
            (build: File => Unit)
            (verify: File => Boolean = _ => true): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
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
