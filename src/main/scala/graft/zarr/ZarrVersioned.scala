package graft.zarr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Versioned-store commit protocol for zarr writes — object-store-safe
  * atomicity without relying on `rename`.
  *
  * The reference's flagship deployment was Zarr **on GCS**
  * (`zarr_spark.py` GCS chunk writers [recalled:med, SURVEY.md §1.1]);
  * GCS/S3-style stores have no atomic directory rename, so the
  * rename-aside swap the writer used through round 8 (live → live.old,
  * tmp → live) only *narrowed* the unreadable window there. This module
  * replaces the swap with the protocol object stores actually support
  * atomically — a single small-object PUT:
  *
  * ```
  * <store>/
  *   current            # the commit marker: one line, the live version dir
  *   v1-3f2ab9c0/       # a complete, immutable zarr store (.zarray + chunks)
  *   v2-90ddf512/       # ditto — the one `current` names is the live one
  * ```
  *
  *  - Writers build the ENTIRE new store (chunks, then metadata last)
  *    under a fresh query-unique version directory. Nothing under the
  *    previously committed version is touched.
  *  - THE commit point is one `create(overwrite=true)` of the tiny
  *    `current` pointer naming the new version. Object-store PUT is
  *    atomic per object: readers see either the old pointer or the new
  *    one, never a torn store. A crash at ANY earlier step leaves the
  *    old pointer — and therefore the old, fully intact store — live.
  *  - Readers resolve the pointer ONCE at table-resolution time and then
  *    read only inside that version dir: a scan planned before a commit
  *    finishes against the version it started on (snapshot isolation),
  *    modulo GC of that version (see below).
  *
  * GC on commit is deliberately conservative: it removes only (a) the
  * version directory the OLD pointer named and (b) legacy flat-layout
  * store files at the root (a pre-versioned store being overwritten
  * in-place). It never touches other `v*` directories — those may be a
  * concurrent writer's in-flight build (their own abort cleans them) —
  * so a crashed driver can orphan a version dir. `vacuum()` is the
  * explicit admin pass that removes every version the pointer does not
  * name.
  */
object ZarrVersioned {
  val PointerFile = "current"
  private val VersionRe = "^v(\\d+)-[0-9a-fA-F-]+$".r

  /** Does `name` have the `v<N>-<hex>` shape readers/vacuum recognize?
    * (Callers pinning an explicit version_name must stay in-shape.) */
  def isVersionName(name: String): Boolean =
    VersionRe.findFirstIn(name).isDefined
  private val FlatChunkRe = "^\\d+\\.\\d+$".r

  /** Test-only failure injection: invoked with a step label at each
    * stage of the versioned commit so a spec can prove crash-at-every-
    * step recovery. Production value is a no-op. */
  @volatile var failpoint: String => Unit = _ => ()

  /** The committed version dir name, if this is a versioned store. */
  def readPointer(root: String, conf: Configuration): Option[String] = {
    val p = new HPath(root, PointerFile)
    val fs = p.getFileSystem(conf)
    try {
      val in = fs.open(p)
      val name =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(name.nonEmpty && !name.contains("/") && !name.contains(".."),
        s"zarr: malformed version pointer at $p: '$name'")
      Some(name)
    } catch { case _: java.io.FileNotFoundException => None }
  }

  /** Where the store's data actually lives: `<root>/<version>` when a
    * pointer exists, else the root itself (legacy flat layout). */
  def resolve(root: String, conf: Configuration): String =
    readPointer(root, conf)
      .map(v => new HPath(root, v).toString)
      .getOrElse(root)

  /** TIME TRAVEL: resolve to a caller-pinned version dir instead of the
    * pointer (`spark.read.format("zarr").option("version", "v1-…")`).
    * Retained versions are immutable, so a pinned read is a consistent
    * snapshot by construction; versions exist to travel to only when
    * the superseding write ran with `option("gc", "false")` (or the
    * default GC failed benignly) — `versions()` lists what is actually
    * there. A nonexistent pin fails loudly WITH that listing. */
  def resolveAt(root: String, version: Option[String],
                conf: Configuration): String = version match {
    case None => resolve(root, conf)
    case Some(v) =>
      require(v.nonEmpty && !v.contains("/") && !v.contains(".."),
        s"zarr: malformed version pin '$v'")
      val p = new HPath(root, v)
      if (!p.getFileSystem(conf).exists(p))
        throw new java.io.FileNotFoundException(
          s"zarr: version '$v' does not exist under $root — available: " +
            s"${versions(root, conf).mkString("[", ", ", "]")}" +
            s"${readPointer(root, conf).fold("")(c => s", current: $c")}")
      p.toString
  }

  /** All version directories present under the store root (committed,
    * retained, or in-flight), name-sorted by version counter. */
  def versions(root: String, conf: Configuration): Seq[String] = {
    val rp = new HPath(root)
    val fs = rp.getFileSystem(conf)
    try fs.listStatus(rp).toSeq
      .filter(st => st.isDirectory &&
        VersionRe.findFirstIn(st.getPath.getName).isDefined)
      .map(_.getPath.getName)
      .sortBy { case VersionRe(k) => k.toLong }
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  /** Monotone query-unique version name: bump the pointed version's
    * counter (humans see ordering at a glance), suffix with the query id
    * so two concurrent writers can never collide on a directory. Takes
    * the ALREADY-READ pointer value so the caller reads the pointer
    * exactly once per write (see ZarrBatchWrite.resolvedDirs). */
  def nextVersionNameFrom(current: Option[String], queryId: String): String = {
    val n = current match {
      case Some(VersionRe(k)) => k.toLong + 1
      case _ => 1L
    }
    s"v$n-${queryId.toLowerCase.filter(c => c.isLetterOrDigit || c == '-').take(16)}"
  }

  /** THE commit point: one atomic small-object PUT of the pointer. */
  def writePointer(root: String, version: String, conf: Configuration): Unit = {
    val p = new HPath(root, PointerFile)
    val fs = p.getFileSystem(conf)
    val out = fs.create(p, true)
    try out.write((version + "\n").getBytes("UTF-8")) finally out.close()
  }

  /** Post-commit cleanup (best-effort — a GC failure must never fail a
    * committed write): drop the superseded version dir and, when a
    * legacy flat store is being converted in place, its root-level
    * `.zarray`/`zarr.json`/chunk objects (now shadowed by the pointer). */
  def gcAfterCommit(root: String, oldVersion: Option[String],
                    conf: Configuration): Unit = {
    val rp = new HPath(root)
    val fs = rp.getFileSystem(conf)
    // defense in depth: never delete the version the pointer CURRENTLY
    // names, whatever the caller believes the old version is
    val live = readPointer(root, conf)
    oldVersion.filterNot(live.contains)
      .foreach(v => fs.delete(new HPath(rp, v), true))
    try {
      fs.listStatus(rp).foreach { st =>
        val n = st.getPath.getName
        val legacyFlat = n == ".zarray" || n == "zarr.json" ||
          FlatChunkRe.findFirstIn(n).isDefined ||
          (n == "c" && st.isDirectory) // v3 flat chunk tree
        if (legacyFlat) fs.delete(st.getPath, st.isDirectory)
      }
    } catch { case _: java.io.FileNotFoundException => () }
  }

  /** Explicit admin GC: remove every version directory the pointer does
    * not name (orphans from crashed drivers). Returns removed names.
    * NOT run automatically — an in-flight writer's build dir is
    * indistinguishable from an orphan without external coordination. */
  def vacuum(root: String, conf: Configuration): Seq[String] = {
    val rp = new HPath(root)
    val fs = rp.getFileSystem(conf)
    val live = readPointer(root, conf)
    fs.listStatus(rp).toSeq
      .filter(st => st.isDirectory &&
        VersionRe.findFirstIn(st.getPath.getName).isDefined &&
        !live.contains(st.getPath.getName))
      .map { st => fs.delete(st.getPath, true); st.getPath.getName }
  }
}
