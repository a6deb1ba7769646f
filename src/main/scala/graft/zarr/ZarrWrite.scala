package graft.zarr

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StructType}

/** DSv2 BATCH WRITE for the zarr source — `df.write.format("zarr")
  * .mode("append"|"overwrite").save(dir)` over the same (row_id BIGINT,
  * vec ARRAY<DOUBLE|FLOAT>) schema the read path produces. What the ad-hoc
  * `ZarrSink.writeMatrix` (groupByKey(band).mapGroups) does imperatively,
  * this does through Spark's writer contract, which buys three things the
  * ad-hoc path can't express:
  *
  *  - **Declared distribution** (`RequiresDistributionAndOrdering`): the
  *    write demands a GLOBAL RANGE partitioning + in-partition sort on
  *    row_id, so Spark itself arranges each task to own a contiguous row
  *    range — every writer streams whole chunk row-bands with O(band)
  *    memory, and the planner (not user code) owns the exchange.
  *  - **Two-phase commit with a swap**: the whole new store is built in
  *    a query-unique temp sibling (`<path>.tmp-<queryId>`) — tasks write
  *    full bands as final chunk objects there (band content is a pure
  *    function of the rows, so speculative duplicates overwrite with
  *    identical bytes) and the ≤2 boundary bands as staging partials
  *    named by (band, partition, TASK-ATTEMPT) so a denied attempt can
  *    neither clobber nor delete the winner's files; the driver's
  *    commit merges partials, writes `.zarray` into the temp store, and
  *    only then swaps it into place (delete-old + rename). The LIVE
  *    store is untouched until that swap, so a failed overwrite loses
  *    nothing, and `abort` just drops the temp sibling.
  *  - **Commit-time validation**: rows is discovered (max row_id + 1) and
  *    the dense-ids invariant (exactly rows 0..n-1, no dupes, no holes —
  *    the AnnData X row convention the read path assumes) is enforced by
  *    counting, not trusted.
  *
  * Layout matches the read path: one column chunk per band
  * (chunkCols = dim), dtype from the vec element type (float → `<f4`,
  * double → `<f8`), zlib level 5 unless `option("zlib", "false")`.
  * Chunk height via `option("chunk_rows", n)`, default 128.
  */
object ZarrWrite {
  val ChunkRowsOption = "chunk_rows"
  val ChunkColsOption = "chunk_cols" // 0/absent = one column chunk (= dim)
  val ZlibOption = "zlib"
  // 2 (default) writes a .zarray store; 3 writes a zarr.json v3 store
  // (c/i/j keys, bytes+gzip codecs). Same two-phase band commit either
  // way — only metadata, key layout, and codec naming change.
  val FormatOption = "format"
  // Commit protocol (round-8 advisory — the reference's deployment target
  // was Zarr on GCS, where directory rename is not atomic):
  //   "versioned" (default) — build the store under <path>/v<N>-<qid>/;
  //     THE commit is one atomic PUT of the tiny <path>/current pointer
  //     (ZarrVersioned). Object-store safe; readable via this DSv2 (the
  //     read path resolves the pointer transparently).
  //   "rename" — the flat spec-standard layout (.zarray at the store
  //     root) committed by rename-aside swap. Atomic on HDFS/local FS;
  //     use when external zarr tools must read the store directly.
  val CommitOption = "commit"
  // Versioned mode only: `option("gc", "false")` RETAINS the superseded
  // version at commit instead of deleting it — retained versions stay
  // readable via the read-side time-travel pin `option("version", …)`
  // (ZarrVersioned.resolveAt); ZarrVersioned.vacuum() is the explicit
  // admin cleanup. Default true: commit GCs the superseded version.
  val GcOption = "gc"
  // Versioned mode only: pin the version DIRECTORY NAME instead of
  // deriving it from (pointer counter, queryId). The point is
  // DETERMINISM across retries of the same logical write — the
  // exactly-once lever ZarrStreamSink builds on: a replayed micro-batch
  // rebuilds the SAME dir and re-PUTs the SAME pointer value, so
  // duplicate delivery converges instead of forking versions. Must
  // match the `v<N>-<hex>` shape so readers/vacuum recognize it.
  val VersionNameOption = "version_name"
  // v3 only: `option("shard_rows", n)` emits a SHARDED store — the band
  // becomes one `sharding_indexed` shard object of n rows containing
  // n/chunk_rows independently-gzipped inner chunks + a crc32c-sealed
  // index. Object-count drops by n/chunk_rows× (the reason the codec
  // exists: fewer PUTs/GETs on object stores) while the read path's
  // random access stays chunk-granular. Must be a multiple of
  // chunk_rows; the shard spans the full vec width.
  val ShardRowsOption = "shard_rows"

  /** Slice a full row-band buffer (chunkRows × dim, row-major) into the
    * j-th column chunk, padded to the full chunkRows × chunkCols shape
    * (zarr edge chunks are full-size with fill padding). Shared by the
    * task writers (whole bands) and the driver commit (merged bands). */
  def colChunkSlice(buf: Array[Double], chunkRows: Int, dim: Int,
                    chunkCols: Int, j: Int): Array[Double] = {
    val out = new Array[Double](chunkRows * chunkCols)
    val c0 = j * chunkCols
    val width = math.min(chunkCols, dim - c0)
    var r = 0
    while (r < chunkRows) {
      System.arraycopy(buf, r * dim + c0, out, r * chunkCols, width)
      r += 1
    }
    out
  }

  def validateSchema(schema: StructType): Unit = {
    require(schema.length == 2 &&
      schema(0).name == "row_id" && schema(0).dataType == LongType &&
      schema(1).name == "vec" && (schema(1).dataType match {
        case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
        case _ => false
      }),
      s"zarr write schema must be (row_id BIGINT, vec ARRAY<DOUBLE|FLOAT>), " +
        s"got ${schema.simpleString}")
  }

  def dtypeFor(schema: StructType): String = schema(1).dataType match {
    case ArrayType(FloatType, _) => "<f4"
    case _ => "<f8"
  }

  /** rename mode only: the whole new store is built in a query-unique
    * TEMP SIBLING and swapped in at commit (rename-aside) — the
    * previously committed store stays readable until the new one is
    * complete, so a failed overwrite can never destroy data. (In
    * versioned mode the work dir is a version dir INSIDE the store and
    * the swap is a pointer PUT — see ZarrVersioned.) Staging partials
    * live inside the work dir and vanish with it either way. */
  def tmpDir(path: String, queryId: String) =
    new HPath(path + s".tmp-$queryId")
}

class ZarrWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = {
    ZarrWrite.validateSchema(info.schema())
    val chunkRows = Option(info.options.get(ZarrWrite.ChunkRowsOption))
      .map(_.toInt).getOrElse(128)
    require(chunkRows > 0, s"chunk_rows must be positive, got $chunkRows")
    val zlib = Option(info.options.get(ZarrWrite.ZlibOption))
      .forall(_.toBoolean)
    val chunkCols = Option(info.options.get(ZarrWrite.ChunkColsOption))
      .map(_.toInt).getOrElse(0)
    require(chunkCols >= 0, s"chunk_cols must be >= 0, got $chunkCols")
    val format = Option(info.options.get(ZarrWrite.FormatOption))
      .map(_.toInt).getOrElse(2)
    require(format == 2 || format == 3, s"format must be 2 or 3, got $format")
    val commitMode = Option(info.options.get(ZarrWrite.CommitOption))
      .getOrElse("versioned")
    require(commitMode == "versioned" || commitMode == "rename",
      s"commit must be 'versioned' or 'rename', got $commitMode")
    val gcOnCommit = Option(info.options.get(ZarrWrite.GcOption))
      .forall(_.toBoolean)
    val versionName = Option(info.options.get(ZarrWrite.VersionNameOption))
    versionName.foreach { v =>
      require(commitMode == "versioned",
        "version_name applies only to the versioned commit mode")
      require(ZarrVersioned.isVersionName(v),
        s"version_name '$v' must match v<N>-<hex> so readers and vacuum " +
          "recognize it")
    }
    val shardRows = Option(info.options.get(ZarrWrite.ShardRowsOption))
      .map(_.toInt).getOrElse(0)
    if (shardRows > 0) {
      require(format == 3, "shard_rows requires format=3 (sharding_indexed)")
      require(shardRows % chunkRows == 0,
        s"shard_rows=$shardRows must be a multiple of chunk_rows=$chunkRows")
    } else require(shardRows == 0, s"shard_rows must be >= 0, got $shardRows")
    new ZarrWriteImpl(path, info.queryId(), ZarrWrite.dtypeFor(info.schema()),
      chunkRows, chunkCols, zlib, truncateFirst, format, commitMode,
      gcOnCommit, versionName, shardRows)
  }
}

class ZarrWriteImpl(path: String, queryId: String, dtype: String,
                    chunkRows: Int, chunkCols: Int, zlib: Boolean,
                    truncateFirst: Boolean, format: Int = 2,
                    commitMode: String = "versioned",
                    gcOnCommit: Boolean = true,
                    versionName: Option[String] = None,
                    shardRows: Int = 0)
    extends Write with RequiresDistributionAndOrdering {
  private def sortOrder: Array[SortOrder] = Array(
    Expressions.sort(Expressions.column("row_id"), SortDirection.ASCENDING))
  override def requiredDistribution(): Distribution =
    Distributions.ordered(sortOrder)
  override def requiredOrdering(): Array[SortOrder] = sortOrder
  override def description(): String = s"zarr:`$path`"
  override def toBatch: BatchWrite =
    new ZarrBatchWrite(path, queryId, dtype, chunkRows, chunkCols, zlib,
      truncateFirst, format, commitMode, gcOnCommit, versionName, shardRows)
}

/** One task's outcome: rows written, the id range seen, the vec width,
  * bands finalized directly, and boundary partials left in staging. */
case class ZarrTaskCommit(partitionId: Int, rowCount: Long, maxId: Long,
                          dim: Int, finalBands: Seq[Long],
                          partials: Seq[(Long, String)])
    extends WriterCommitMessage

class ZarrBatchWrite(path: String, queryId: String, dtype: String,
                     chunkRows: Int, chunkColsOpt: Int, zlib: Boolean,
                     truncateFirst: Boolean, format: Int = 2,
                     commitMode: String = "versioned",
                     gcOnCommit: Boolean = true,
                     versionName: Option[String] = None,
                     shardRows: Int = 0)
    extends BatchWrite {

  // the BAND (the unit tasks buffer, stage, and finalize) is the shard
  // when sharding, else the chunk — all banding math keys off this
  private def bandRows = if (shardRows > 0) shardRows else chunkRows

  /** store-generation knobs shared by task chunk writes + commit meta */
  private def sep = if (format == 3) "/" else "."
  private def comp: Option[String] =
    if (!zlib) None else Some(if (format == 3) "gzip" else "zlib")

  // resolved ONCE, together, on the driver (createBatchWriterFactory and
  // commit run on the same instance): the version the pointer named when
  // this write began, and the dir this write builds into. A single lazy
  // pair, because reading the pointer lazily at two separate times is
  // exactly the bug class this protocol exists to kill — an oldVersion
  // first forced AFTER the commit-point PUT would read the NEW pointer
  // and GC the just-committed store. Versioned mode builds INSIDE the
  // store under a query-unique version dir; rename mode a temp sibling.
  private lazy val resolvedDirs: (Option[String], String) =
    if (commitMode == "versioned") {
      val old = ZarrVersioned.readPointer(path, ZarrIO.hadoopConf())
      // an explicit version_name (the exactly-once retry lever —
      // ZarrStreamSink) wins over the derived (counter, queryId) name
      val next = versionName.getOrElse(
        ZarrVersioned.nextVersionNameFrom(old, queryId))
      require(!old.contains(next),
        s"zarr: version_name '$next' is the CURRENTLY COMMITTED version " +
          "— a replayed already-committed write must be skipped by the " +
          "caller (ZarrStreamSink does), not rebuilt over the live data")
      (old, new HPath(path, next).toString)
    } else (None, ZarrWrite.tmpDir(path, queryId).toString)
  private def oldVersion: Option[String] = resolvedDirs._1
  private def workDir: String = resolvedDirs._2
  private def stagingDir = new HPath(workDir, ".staging")

  private def fs(): (FileSystem, HPath) = {
    val conf = ZarrIO.hadoopConf()
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val (f, p) = fs()
    // the LIVE store is never touched here — overwrite only commits at
    // the end, so a failed job cannot destroy previously committed data.
    // "committed" = flat-layout metadata at the root OR a version pointer.
    if (!truncateFirst) require(!f.exists(new HPath(p, ".zarray")) &&
      !f.exists(new HPath(p, "zarr.json")) && oldVersion.isEmpty,
      s"zarr store already committed at $path — use mode(\"overwrite\")")
    f.delete(new HPath(workDir), true) // stale same-query remnant
    f.mkdirs(stagingDir)
    new ZarrWriterFactory(workDir, dtype, chunkRows, chunkColsOpt,
      zlib, new SerializableHadoopConf(ZarrIO.hadoopConf()), format,
      shardRows)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.map(_.asInstanceOf[ZarrTaskCommit])
    val total = msgs.map(_.rowCount).sum
    val rows = msgs.foldLeft(-1L)((m, c) => math.max(m, c.maxId)) + 1
    require(total == rows,
      s"zarr write: $total rows for id range [0, $rows) — row_id must be " +
        "dense 0..n-1 (duplicate or missing ids)")
    val dims = msgs.filter(_.rowCount > 0).map(_.dim).distinct
    require(dims.length <= 1, s"zarr write: mixed vec widths $dims")
    val dim = dims.headOption.getOrElse(0)
    val innerCols = if (chunkColsOpt > 0) math.min(chunkColsOpt, math.max(dim, 1))
                    else math.max(dim, 1)
    // sharded: the outer chunk (= band = one stored object) spans the
    // full width; inner chunks are the user-facing chunk shape
    val cc = if (shardRows > 0) math.max(dim, 1) else innerCols
    if (shardRows > 0)
      require(math.max(dim, 1) % innerCols == 0,
        s"sharding: chunk_cols=$innerCols must divide the vec width $dim")
    val meta = ZarrMeta(rows = rows, cols = dim, chunkRows = bandRows,
      chunkCols = cc, dtype = dtype,
      compressor = comp, fillValue = 0.0, format = format, sep = sep,
      inner = if (shardRows > 0) Some(ShardSpec(chunkRows, innerCols))
              else None)
    val conf = ZarrIO.hadoopConf()
    val (f, _) = fs()
    // a band is EITHER finalized by the one task that saw all its rows,
    // OR split into staging partials — never both (ids are unique, so a
    // full band leaves no rows for another task)
    val finals = msgs.flatMap(_.finalBands).toSet
    val byBand = msgs.flatMap(_.partials).groupBy(_._1)
    val overlap = byBand.keySet intersect finals
    require(overlap.isEmpty, s"zarr write: bands $overlap both final and partial")
    ZarrVersioned.failpoint("after-tasks")
    byBand.foreach { case (band, parts) =>
      val buf = Array.fill(bandRows * dim)(0.0)
      var seen = 0
      parts.foreach { case (_, name) =>
        val in = new DataInputStream(f.open(new HPath(stagingDir, name)))
        try {
          val pdim = in.readInt(); val count = in.readInt()
          require(pdim == dim, s"partial $name: dim $pdim != $dim")
          var k = 0
          while (k < count) {
            val r = in.readInt()
            var c = 0
            while (c < dim) { buf(r * dim + c) = in.readDouble(); c += 1 }
            k += 1; seen += 1
          }
        } finally in.close()
      }
      require(seen <= bandRows, s"band $band: $seen rows overflow the band")
      var j = 0
      while (j * cc < math.max(dim, 1)) {
        ZarrIO.writeChunk(workDir, meta, band, j,
          ZarrWrite.colChunkSlice(buf, bandRows, dim, cc, j), conf)
        j += 1
      }
    }
    ZarrVersioned.failpoint("after-merge")
    ZarrIO.writeMeta(workDir, meta, conf)
    f.delete(stagingDir, true)
    ZarrVersioned.failpoint("before-commit-point")
    if (commitMode == "versioned") {
      // THE commit point: one atomic small-object PUT of the version
      // pointer (ZarrVersioned scaladoc). No rename anywhere in the
      // protocol — safe on GCS/S3-style stores, the reference's actual
      // deployment target. A crash at ANY failpoint above leaves the
      // old pointer, and therefore the old store, fully live.
      val version = new HPath(workDir).getName
      ZarrVersioned.writePointer(path, version, conf)
      ZarrVersioned.failpoint("after-commit-point")
      // best-effort: a GC failure must never fail a committed write.
      // gc=false retains the superseded version as a time-travel
      // snapshot (read it back via option("version", <name>)).
      if (gcOnCommit)
        try ZarrVersioned.gcAfterCommit(path, oldVersion, conf)
        catch { case scala.util.control.NonFatal(_) => () }
    } else {
      // rename mode: swap the finished store into place via rename-ASIDE
      // (round-7 advisory): live -> live.old first, tmp -> live second,
      // delete live.old last. A crash between the renames leaves the
      // prior store intact under live.old (recoverable by a single
      // rename back). rename is atomic on HDFS/local FS; on a
      // rename-less object store use the default versioned mode instead.
      val (f2, live) = fs()
      val old = new org.apache.hadoop.fs.Path(live.toString + s".old-$queryId")
      f2.delete(old, true) // stale remnant of an identically-named past query
      val hadLive = f2.exists(live)
      if (hadLive) require(f2.rename(live, old),
        s"zarr commit: rename-aside $live -> $old failed; store untouched")
      if (!f2.rename(new HPath(workDir), live)) {
        // restore the prior store before surfacing: a failed overwrite
        // must lose nothing
        if (hadLive) f2.rename(old, live)
        throw new IllegalStateException(
          s"zarr commit: rename $workDir -> $live " +
            s"failed${if (hadLive) "; prior store restored" else ""}")
      }
      if (hadLive) f2.delete(old, true)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // drop the whole in-flight work dir (temp sibling or uncommitted
    // version dir); the live store was never touched and the pointer
    // never moved, so a failed overwrite loses NOTHING. One exception:
    // if commit() already moved the pointer and THEN threw (e.g. during
    // post-commit GC), the write IS committed — Spark still calls abort
    // on any commit exception, and deleting the now-live version dir
    // here would corrupt a committed store.
    val (f, _) = fs()
    val committed = commitMode == "versioned" &&
      ZarrVersioned.readPointer(path, ZarrIO.hadoopConf())
        .contains(new HPath(workDir).getName)
    if (!committed) f.delete(new HPath(workDir), true)
  }
}

class ZarrWriterFactory(workDir: String, dtype: String,
                        chunkRows: Int, chunkColsOpt: Int, zlib: Boolean,
                        sconf: SerializableHadoopConf, format: Int = 2,
                        shardRows: Int = 0)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ZarrDataWriter(workDir, dtype, chunkRows, chunkColsOpt, zlib,
      partitionId, taskId, sconf, format, shardRows)
}

/** Streams its (range-partitioned, sorted) slice band by band: whole
  * bands become final chunk objects immediately; the ≤2 boundary bands
  * go to staging as sparse (rowInBand, vec) runs. Memory = ONE band. */
class ZarrDataWriter(workDir: String, dtype: String,
                     chunkRows: Int, chunkColsOpt: Int, zlib: Boolean,
                     partitionId: Int, taskId: Long,
                     sconf: SerializableHadoopConf, format: Int = 2,
                     shardRows: Int = 0)
    extends DataWriter[InternalRow] {

  // sharded: the band (buffered, staged, finalized as ONE object) is
  // the shard; inner chunks are cut inside ZarrIO.writeChunk's
  // writeShard dispatch. Unsharded: band = chunk, as before.
  private def bandRows = if (shardRows > 0) shardRows else chunkRows

  // everything this writer produces lands in the query's WORK dir (temp
  // sibling or uncommitted version dir) — the live store is only
  // touched by the driver's commit point
  private val stagingDir = new HPath(workDir, ".staging")

  private val floats = dtype == "<f4"
  private var dim = -1
  private var buf: Array[Double] = _
  private var present: Array[Boolean] = _
  private var band = -1L
  private var bandCount = 0
  private var lastId = -1L
  private var rowCount = 0L
  private val finalBands = Seq.newBuilder[Long]
  private val partials = Seq.newBuilder[(Long, String)]
  private def chunkCols =
    if (chunkColsOpt > 0) math.min(chunkColsOpt, dim) else dim
  // the per-object width: a shard spans the full vec width
  private def outerCols = if (shardRows > 0) dim else chunkCols
  // provisional meta for chunk writes (ZarrIO.writeChunk reads only the
  // chunk geometry / dtype / compressor from it, never rows)
  private def chunkMeta = ZarrMeta(rows = 0L, cols = dim,
    chunkRows = bandRows, chunkCols = outerCols, dtype = dtype,
    compressor =
      if (!zlib) None else Some(if (format == 3) "gzip" else "zlib"),
    fillValue = 0.0, format = format,
    sep = if (format == 3) "/" else ".",
    inner = if (shardRows > 0) Some(ShardSpec(chunkRows, chunkCols))
            else None)

  override def write(row: InternalRow): Unit = {
    val id = row.getLong(0)
    require(id >= 0, s"zarr write: negative row_id $id")
    require(id > lastId,
      s"zarr write: row_id $id after $lastId — input not sorted/unique " +
        "(the declared write ordering was not honored)")
    lastId = id
    val arr = row.getArray(1)
    val vec = if (floats) arr.toFloatArray().map(_.toDouble)
              else arr.toDoubleArray()
    if (dim < 0) {
      dim = vec.length
      require(dim > 0, "zarr write: empty vec")
      if (shardRows > 0) require(dim % chunkCols == 0,
        s"sharding: chunk_cols=$chunkCols must divide the vec width $dim")
      buf = new Array[Double](bandRows * dim)
      present = new Array[Boolean](bandRows)
    }
    require(vec.length == dim,
      s"zarr write: vec width ${vec.length} != $dim at row_id $id")
    val b = id / bandRows
    if (b != band) { flush(); band = b }
    val r = (id - b * bandRows).toInt
    System.arraycopy(vec, 0, buf, r * dim, dim)
    present(r) = true
    bandCount += 1
    rowCount += 1
  }

  private def flush(): Unit = {
    if (band >= 0 && bandCount > 0) {
      if (bandCount == bandRows) {
        // band content is a pure function of the input rows, so a
        // speculative duplicate attempt overwrites with identical bytes;
        // one object per COLUMN chunk of the band (chunk_cols option)
        var j = 0
        while (j * outerCols < dim) {
          ZarrIO.writeChunk(workDir, chunkMeta, band, j,
            ZarrWrite.colChunkSlice(buf, bandRows, dim, outerCols, j),
            sconf.value)
          j += 1
        }
        finalBands += band
      } else {
        // taskId makes the name ATTEMPT-unique: a denied/zombie attempt
        // can neither overwrite the winner's partial nor (see abort)
        // delete it — the driver merges exactly the names the winning
        // attempt reported in its commit message
        val name = s"band-$band-p$partitionId-t$taskId"
        val out = new DataOutputStream(stagingDir
          .getFileSystem(sconf.value)
          .create(new HPath(stagingDir, name), true))
        try {
          out.writeInt(dim); out.writeInt(bandCount)
          var r = 0
          while (r < bandRows) {
            if (present(r)) {
              out.writeInt(r)
              var c = 0
              while (c < dim) { out.writeDouble(buf(r * dim + c)); c += 1 }
            }
            r += 1
          }
        } finally out.close()
        partials += band -> name
      }
      java.util.Arrays.fill(buf, 0.0)
      java.util.Arrays.fill(present, false)
    }
    bandCount = 0
  }

  override def commit(): WriterCommitMessage = {
    flush()
    ZarrTaskCommit(partitionId, rowCount, lastId, dim, finalBands.result(),
      partials.result())
  }

  override def abort(): Unit = {
    // attempt-unique partial names mean this attempt's files can never
    // be mistaken for the winner's; remove only our own (best-effort —
    // the driver's job-level abort drops the whole temp store anyway)
    val sd = stagingDir
    val f = sd.getFileSystem(sconf.value)
    partials.result().foreach { case (_, name) =>
      f.delete(new HPath(sd, name), false)
    }
  }

  override def close(): Unit = ()
}
