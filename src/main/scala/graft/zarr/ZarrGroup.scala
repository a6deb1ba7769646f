package graft.zarr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.{ByteBuffer, ByteOrder}

/** Zarr v2 GROUPS — the AnnData-on-zarr layout the reference actually
  * deployed (an `.zgroup` directory whose members are arrays: `X` the
  * cell×gene matrix, `obs/…` and `var/…` the 1-D annotation columns) —
  * plus CONSOLIDATED METADATA (`.zmetadata`), the object-store
  * optimization that matters exactly here: a group with m member arrays
  * costs m+1 metadata GETs to open (each `.zarray` + the `.zgroup`);
  * consolidation folds every metadata object into ONE key, so opening
  * the store is one GET no matter how many members — on GCS/S3 the
  * difference between one round-trip and a listing storm per query.
  *
  * Member 2-D arrays are ordinary zarr arrays: the existing DSv2 source
  * reads `group/X` unchanged (chunk pruning, aggregate pushdown and all).
  * What this module adds is the 1-D annotation-column layer the group
  * layout needs — numeric (`<i4`/`<i8`/`<f8`) and fixed-width bytes
  * (`|S{w}`) dtypes, chunked, zlib-optional, missing-chunk = fill —
  * with a distributed band writer and a distributed chunk reader
  * (one Spark partition per chunk band; never a driver materialization).
  *
  * Consolidation contract: `.zmetadata` is written LAST (after every
  * member's metadata is final) and readers PREFER it — `memberMeta1`
  * never touches a member `.zarray` when the consolidated key exists
  * (ZarrGroupSpec proves it by deleting the member `.zarray` files and
  * re-reading). Writers that mutate a consolidated store must
  * re-consolidate or delete `.zmetadata`; the versioned-store commit
  * protocol (ZarrVersioned) makes that atomic at the `current` pointer.
  */
object ZarrGroup extends Serializable {

  /** 1-D member-array metadata. `sWidth` > 0 iff dtype is `|S{sWidth}`.
    * `fill` is the store's declared fill_value as text ("0" written by
    * this layer; external stores may declare anything — honored when
    * synthesizing missing chunks, never silently zeroed). */
  case class Zarr1Meta(n: Long, chunk: Int, dtype: String,
                       compressor: Option[String], fill: String = "0") {
    require(chunk > 0, "chunk must be positive")
    val sWidth: Int =
      if (dtype.startsWith("|S")) dtype.drop(2).toInt else 0
    def bytesPerElem: Int = dtype match {
      case "<i4" => 4
      case "<i8" => 8
      case "<f8" => 8
      case s if s.startsWith("|S") => sWidth
      case other => throw new IllegalArgumentException(
        s"unsupported 1-D zarr dtype $other (supported: <i4 <i8 <f8 |S{w})")
    }
    def numChunks: Long = (n + chunk - 1) / chunk
    /** int dtype (long-typed write/read path), vs <f8 (double) / |S. */
    def isInt: Boolean = dtype == "<i4" || dtype == "<i8"
    /** A decompressed chunk's bytes when the chunk object is absent —
      * legal sparse zarr, every element = fill_value. The external-store
      * case the zero-byte shortcut used to get wrong for fill != 0. */
    def fillChunkBytes: Array[Byte] = {
      val raw = new Array[Byte](chunk * bytesPerElem)
      if (sWidth == 0 && fill != "0" && fill != "0.0") {
        val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
        var k = 0
        dtype match {
          case "<i4" =>
            val v = fill.toDouble.toInt
            while (k < chunk) { buf.putInt(k * 4, v); k += 1 }
          case "<i8" =>
            val v = fill.toDouble.toLong
            while (k < chunk) { buf.putLong(k * 8, v); k += 1 }
          case _ =>
            val v = fill.toDouble
            while (k < chunk) { buf.putDouble(k * 8, v); k += 1 }
        }
      }
      raw
    }
    def metaJson: String = {
      val comp = compressor match {
        case Some("zlib") => """{"id":"zlib","level":5}"""
        case _ => "null"
      }
      val fillJson = if (sWidth > 0) "\"\"" else fill
      s"""{"zarr_format":2,"shape":[$n],"chunks":[$chunk],""" +
        s""""dtype":"$dtype","compressor":$comp,""" +
        s""""fill_value":$fillJson,"order":"C","filters":null}"""
    }
  }

  private def fsOf(path: String, conf: Configuration): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  private def writeUtf8(fs: FileSystem, p: HPath, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readUtf8(fs: FileSystem, p: HPath): String = {
    val st = fs.getFileStatus(p)
    val raw = new Array[Byte](st.getLen.toInt)
    val in = fs.open(p)
    try in.readFully(0, raw) finally in.close()
    new String(raw, "UTF-8")
  }

  /** `{"zarr_format":2}` group marker — one per group level. */
  def writeGroupMarker(path: String,
                       conf: Configuration = ZarrIO.hadoopConf()): Unit = {
    val (fs, p) = fsOf(path, conf)
    fs.mkdirs(p)
    writeUtf8(fs, new HPath(p, ".zgroup"), """{"zarr_format":2}""")
  }

  private def parse1Meta(node: JsonNode): Zarr1Meta = {
    require(node.get("zarr_format").asInt() == 2, "only zarr v2 supported")
    require(node.get("shape").size() == 1, "not a 1-D zarr array")
    require(node.get("order").asText() == "C", "only C-order zarr supported")
    require(node.get("filters") == null || node.get("filters").isNull,
      "zarr filters not supported")
    val comp = node.get("compressor")
    val compId =
      if (comp == null || comp.isNull) None
      else comp.get("id").asText() match {
        case "zlib" => Some("zlib")
        case other => throw new IllegalArgumentException(
          s"unsupported zarr compressor $other (supported: zlib, null)")
      }
    // fill_value: honored for numeric dtypes (fillChunkBytes); a
    // non-empty STRING fill has no sane |S synthesis — fail loudly
    // instead of decoding an external store wrong (ADVICE r9). null
    // fill (zarr's "undefined") keeps the 0/"" convention.
    val fillNode = node.get("fill_value")
    val dtype = node.get("dtype").asText()
    val fill =
      if (fillNode == null || fillNode.isNull) "0"
      else {
        val t = fillNode.asText()
        if (dtype.startsWith("|S"))
          require(t.isEmpty, s"non-empty |S fill_value '$t' unsupported")
        t
      }
    Zarr1Meta(node.get("shape").get(0).asLong(),
      node.get("chunks").get(0).asInt(),
      dtype, compId, if (dtype.startsWith("|S")) "0" else fill)
  }

  def read1Meta(path: String,
                conf: Configuration = ZarrIO.hadoopConf()): Zarr1Meta = {
    val (fs, p) = fsOf(path, conf)
    val mapper = new ObjectMapper()
    parse1Meta(mapper.readTree(readUtf8(fs, new HPath(p, ".zarray"))))
  }

  // ------------------------------------------------------------- write --

  private def encodeChunk(meta: Zarr1Meta, vals: Array[Any]): Array[Byte] = {
    val raw = new Array[Byte](meta.chunk * meta.bytesPerElem)
    val buf = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var k = 0
    while (k < vals.length) {
      meta.dtype match {
        case "<i4" => buf.putInt(k * 4, vals(k).asInstanceOf[Number].intValue())
        case "<i8" => buf.putLong(k * 8, vals(k).asInstanceOf[Number].longValue())
        case "<f8" => buf.putDouble(k * 8, vals(k).asInstanceOf[Number].doubleValue())
        case _ =>
          // UTF-8 both ways (AnnData.writeZarr sizes |S with UTF-8
          // octet_length; ASCII encode would map non-ASCII to '?' and
          // round-trip silently corrupted — ADVICE r9)
          val b = vals(k).asInstanceOf[String].getBytes("UTF-8")
          require(b.length <= meta.sWidth,
            s"string '${vals(k)}' exceeds |S${meta.sWidth}")
          System.arraycopy(b, 0, raw, k * meta.sWidth, b.length)
      }
      k += 1
    }
    meta.compressor match {
      case Some("zlib") => ZarrIO.deflate(raw)
      case Some("gzip") => ZarrIO.gzip(raw) // the v3 codec name/format
      case _ => raw
    }
  }

  /** Distributed 1-D array write: `df` must be (id BIGINT 0..n-1, value)
    * — the annotation-column shape. One shuffle on id div chunk forms
    * the chunk bands; each executor writes its own chunk objects.
    * Metadata (with the observed n) lands AFTER the chunks — final
    * visibility is the caller's consolidate/commit step either way, and
    * deriving n from the write pass itself keeps the whole write ONE
    * Spark job (the separate df.count() used to re-execute the entire
    * upstream plan — a full extra pp-chain/join execution per member
    * write; r13, guide §1.2/§2.4). */
  def write1(df: DataFrame, path: String, chunk: Int, dtype: String,
             zlib: Boolean = true): Zarr1Meta =
    write1Impl(df, path,
      Zarr1Meta(0, chunk, dtype, if (zlib) Some("zlib") else None),
      metaName = ".zarray", metaText = _.metaJson, keyOf = _.toString)

  /** Per-write-pass band accounting: (bands seen, rows seen, max band
    * id, max band's length, every NON-max band full). Folding these
    * across bands/partitions lets the driver validate the 0..n-1
    * contiguity contract — every band but the last full, no band
    * missing — without knowing n up front. */
  private type BandSummary = (Long, Long, Long, Int, Boolean)
  private val emptySummary: BandSummary = (0L, 0L, -1L, 0, true)
  private def mergeSummaries(chunk: Int)(a: BandSummary, b: BandSummary)
      : BandSummary = {
    if (a._1 == 0L) return b
    if (b._1 == 0L) return a
    require(a._3 != b._3, s"band ${a._3} written twice")
    val (hi, lo) = if (a._3 > b._3) (a, b) else (b, a)
    (a._1 + b._1, a._2 + b._2, hi._3, hi._4,
      a._5 && b._5 && lo._4 == chunk)
  }
  /** Validate a folded [[BandSummary]] against the contiguous 0..n-1
    * id contract and return n (0 for an empty write — a legal member,
    * e.g. writeZarr after filterCells kept nothing; ADVICE r9). */
  private def validatedN(s: BandSummary, chunk: Int): Long = {
    val (nBands, total, maxBand, maxLen, othersFull) = s
    if (nBands == 0L) return 0L
    require(othersFull,
      "zarr write: a non-final band is short — ids are not contiguous 0..n-1")
    require(nBands == maxBand + 1,
      s"zarr write: $nBands bands for max band $maxBand — missing bands")
    val n = maxBand * chunk + maxLen
    require(total == n, s"zarr write: $total of $n values written")
    n
  }

  /** Shared distributed 1-D writer behind the v2 layer and
    * [[Zarr3Group]] — only the metadata object and chunk-key naming
    * differ between the formats. `meta.n` is set from the write pass. */
  private[zarr] def write1Impl(df: DataFrame, path: String, meta0: Zarr1Meta,
                               metaName: String, metaText: Zarr1Meta => String,
                               keyOf: Long => String): Zarr1Meta = {
    val spark = df.sparkSession
    import spark.implicits._
    val chunk = meta0.chunk
    val (fs, p) = fsOf(path, ZarrIO.hadoopConf())
    fs.mkdirs(p)
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    def writeBand(band: Long, items: Array[(Long, Any)]): BandSummary = {
      val lo = band * chunk
      val vals = new Array[Any](chunk)
      var maxOff = -1
      items.foreach { case (i, v) =>
        val off = (i - lo).toInt
        require(off >= 0 && off < chunk, s"id $i outside band $band")
        vals(off) = v
        if (off > maxOff) maxOff = off
      }
      val len = maxOff + 1
      require(items.length == len,
        s"band $band: ${items.length} rows for band length $len (duplicate ids)")
      val trimmed =
        if (len == chunk) vals
        else java.util.Arrays.copyOf(vals.asInstanceOf[Array[AnyRef]], len)
          .asInstanceOf[Array[Any]]
      require(!trimmed.contains(null), s"band $band has missing ids")
      val bytes = encodeChunk(meta0, trimmed)
      val (bfs, bp) = fsOf(path, sconf.value)
      val out = bfs.create(new HPath(bp, keyOf(band)), true)
      try out.write(bytes) finally out.close()
      (1L, len.toLong, band, len, true)
    }
    // the same equi-shuffle-on-band shape as ZarrSink.writeMatrix: each
    // executor writes its own chunk objects; typed per dtype family so
    // the shuffle rows stay primitive-encoded — int dtypes shuffle as
    // (Long, Long), NOT through double, so int64 ids beyond 2^53
    // (hashes, snowflake ids) write exactly (ADVICE r9)
    val summaries =
      if (meta0.sWidth > 0)
        df.select(col("id").cast("long"), col("value").cast("string"))
          .as[(Long, String)]
          .groupByKey(_._1 / chunk)
          .mapGroups((band: Long, rows: Iterator[(Long, String)]) =>
            writeBand(band, rows.map { case (i, v) =>
              (i, (if (v == null) "" else v): Any) }.toArray))
      else if (meta0.isInt)
        df.select(col("id").cast("long"), col("value").cast("long"))
          .as[(Long, Long)]
          .groupByKey(_._1 / chunk)
          .mapGroups((band: Long, rows: Iterator[(Long, Long)]) =>
            writeBand(band, rows.map { case (i, v) => (i, v: Any) }.toArray))
      else
        df.select(col("id").cast("long"), col("value").cast("double"))
          .as[(Long, Double)]
          .groupByKey(_._1 / chunk)
          .mapGroups((band: Long, rows: Iterator[(Long, Double)]) =>
            writeBand(band, rows.map { case (i, v) => (i, v: Any) }.toArray))
    // rdd.fold (not Dataset.reduce) so an EMPTY input folds to the zero
    // summary instead of throwing; this is the write's ONE action
    val n = validatedN(
      summaries.rdd.fold(emptySummary)(mergeSummaries(chunk)), chunk)
    val meta = meta0.copy(n = n)
    writeUtf8(fs, new HPath(p, metaName), metaText(meta))
    meta
  }

  /** Batched 1-D member write: k same-row-domain annotation columns in
    * ONE Spark job (vs 2k of count+write1 each — the AnnData obs
    * frame's write cost was k× this; the shared count job was folded
    * into the write pass in r13, so the upstream plan executes exactly
    * once). `df` is (id BIGINT 0..n-1, <one column per member>);
    * `members` maps column name -> dtype. Rows shuffle to band-keyed
    * partitions once; each partition emits every member's chunk object
    * for its bands; n is derived from the pass and validated on the
    * driver (every band but the last full). Same typed-path rules
    * as write1 (ints as long — never through double; strings UTF-8). */
  def writeMembers(df: DataFrame, basePath: String,
                   members: Seq[(String, String)], chunk: Int,
                   zlib: Boolean = true): Map[String, Zarr1Meta] = {
    if (members.isEmpty) return Map.empty
    val spark = df.sparkSession
    import spark.implicits._
    val metas: Array[Zarr1Meta] = members.map { case (_, dtype) =>
      Zarr1Meta(0, chunk, dtype, if (zlib) Some("zlib") else None) }.toArray
    val names: Array[String] = members.map(_._1).toArray
    members.foreach { case (name, _) =>
      val (fs, p) = fsOf(s"$basePath/$name", ZarrIO.hadoopConf())
      fs.mkdirs(p)
    }
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val proj = col("id").cast("long").as("id") +:
      members.zip(metas).map { case ((name, _), meta) =>
        val c = col(name)
        (if (meta.sWidth > 0) c.cast("string")
         else if (meta.isInt) c.cast("long") else c.cast("double")).as(name)
      }
    val k = names.length
    val merge = mergeSummaries(chunk) _
    val summaries = df.select(proj: _*)
      .repartition(col("id").divide(lit(chunk)).cast("long"))
      .sortWithinPartitions("id")
      .mapPartitions { rows =>
        var acc = emptySummary
        var band = -1L
        var lo = 0L
        var maxOff = -1
        var bandRows = 0L
        var bufs: Array[Array[Any]] = null
        def flush(): Unit = if (band >= 0) {
          val len = maxOff + 1
          require(bandRows == len,
            s"band $band: $bandRows rows for band length $len (duplicate ids)")
          var j = 0
          while (j < k) {
            val vals =
              if (len == chunk) bufs(j)
              else java.util.Arrays.copyOf(
                bufs(j).asInstanceOf[Array[AnyRef]], len)
                .asInstanceOf[Array[Any]]
            require(!vals.contains(null),
              s"member ${names(j)} band $band has missing ids or null values")
            val bytes = encodeChunk(metas(j), vals)
            val (bfs, bp) = fsOf(s"$basePath/${names(j)}", sconf.value)
            val out = bfs.create(new HPath(bp, band.toString), true)
            try out.write(bytes) finally out.close()
            j += 1
          }
          acc = merge(acc, (1L, len.toLong, band, len, true))
        }
        rows.foreach { row =>
          val id = row.getLong(0)
          val b = id / chunk
          if (b != band) {
            flush()
            band = b
            lo = b * chunk
            maxOff = -1
            bandRows = 0L
            bufs = Array.fill(k)(new Array[Any](chunk))
          }
          val off = (id - lo).toInt
          require(off >= 0 && off < chunk, s"id $id outside band $band")
          if (off > maxOff) maxOff = off
          var j = 0
          while (j < k) {
            bufs(j)(off) =
              if (metas(j).sWidth > 0) {
                val s = row.getString(j + 1); if (s == null) "" else s
              } else if (row.isNullAt(j + 1)) null
              else if (metas(j).isInt) row.getLong(j + 1)
              else row.getDouble(j + 1)
            j += 1
          }
          bandRows += 1L
        }
        flush()
        Iterator.single(acc)
      }(Encoders.product[BandSummary])
    val n = validatedN(summaries.rdd.fold(emptySummary)(merge), chunk)
    val finalMetas = names.zip(metas.map(_.copy(n = n)))
    finalMetas.foreach { case (name, meta) =>
      val (fs, p) = fsOf(s"$basePath/$name", ZarrIO.hadoopConf())
      writeUtf8(fs, new HPath(p, ".zarray"), meta.metaJson)
    }
    finalMetas.toMap
  }

  // -------------------------------------------------------------- read --

  /** Distributed 1-D array read: one Spark partition per chunk band,
    * (idx, value) rows; value is BIGINT for int dtypes, DOUBLE for <f8,
    * STRING (NUL-stripped UTF-8) for |S. A missing chunk object is legal
    * zarr — every element takes the store's declared fill_value. */
  def read1(spark: SparkSession, path: String, meta: Zarr1Meta,
            keyOf: Long => String = _.toString): DataFrame = {
    import spark.implicits._
    val sconf = new SerializableHadoopConf(
      spark.sparkContext.hadoopConfiguration)
    val nChunks = meta.numChunks
    val mChunk = meta.chunk
    val mN = meta.n
    def chunkBytes(band: Long): Array[Byte] = {
      val (fs, p) = fsOf(path, sconf.value)
      val cp = new HPath(p, keyOf(band))
      val raw =
        try {
          val st = fs.getFileStatus(cp)
          val r = new Array[Byte](st.getLen.toInt)
          val in = fs.open(cp)
          try in.readFully(0, r) finally in.close()
          Some(r)
        } catch { case _: java.io.FileNotFoundException => None }
      raw match {
        case Some(r) => meta.compressor match {
          case Some("zlib") => ZarrIO.inflate(r, mChunk * meta.bytesPerElem)
          case Some("gzip") => ZarrIO.gunzip(r, mChunk * meta.bytesPerElem)
          case _ => r
        }
        case None => meta.fillChunkBytes // absent chunk = fill_value
      }
    }
    val base = spark.range(0, nChunks, 1, nChunks.toInt)
    if (meta.sWidth > 0) {
      val w = meta.sWidth
      base.flatMap { band =>
        val bytes = chunkBytes(band)
        val lo = band * mChunk
        (0 until math.min(mChunk.toLong, mN - lo).toInt).iterator.map { k =>
          var end = (k + 1) * w
          while (end > k * w && bytes(end - 1) == 0) end -= 1
          // UTF-8 (matches encodeChunk; multibyte UTF-8 never contains
          // 0x00, so the trailing-NUL strip cannot split a character)
          (lo + k, new String(bytes, k * w, end - k * w, "UTF-8"))
        }
      }.toDF("idx", "value")
    } else if (meta.dtype == "<f8") {
      base.flatMap { band =>
        val buf = ByteBuffer.wrap(chunkBytes(band))
          .order(ByteOrder.LITTLE_ENDIAN).asDoubleBuffer()
        val lo = band * mChunk
        (0 until math.min(mChunk.toLong, mN - lo).toInt).iterator
          .map(k => (lo + k, buf.get(k)))
      }.toDF("idx", "value")
    } else {
      val four = meta.dtype == "<i4"
      base.flatMap { band =>
        val bb = ByteBuffer.wrap(chunkBytes(band)).order(ByteOrder.LITTLE_ENDIAN)
        val lo = band * mChunk
        (0 until math.min(mChunk.toLong, mN - lo).toInt).iterator.map { k =>
          (lo + k, if (four) bb.getInt(k * 4).toLong else bb.getLong(k * 8))
        }
      }.toDF("idx", "value")
    }
  }

  // ----------------------------------------------------- consolidation --

  /** Walk the group tree, fold every `.zgroup`/`.zarray`/`.zattrs`
    * object into ONE `.zmetadata` key (zarr v2 consolidated-metadata
    * convention: `{"zarr_consolidated_format":1,"metadata":{...}}`).
    * Returns the number of consolidated keys. Call LAST — after every
    * member's metadata is final. */
  def consolidate(path: String,
                  conf: Configuration = ZarrIO.hadoopConf()): Int = {
    val (fs, root) = fsOf(path, conf)
    val mapper = new ObjectMapper()
    val metaNode = mapper.createObjectNode()
    def walk(dir: HPath, prefix: String): Unit = {
      fs.listStatus(dir).sortBy(_.getPath.getName).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) walk(st.getPath, s"$prefix$name/")
        else if (name == ".zgroup" || name == ".zarray" || name == ".zattrs")
          metaNode.set[ObjectNode](s"$prefix$name",
            mapper.readTree(readUtf8(fs, st.getPath)))
      }
    }
    walk(root, "")
    val top = mapper.createObjectNode()
    top.put("zarr_consolidated_format", 1)
    top.set[ObjectNode]("metadata", metaNode)
    writeUtf8(fs, new HPath(root, ".zmetadata"), mapper.writeValueAsString(top))
    metaNode.size()
  }

  /** The consolidated key→metadata map, if this store has one — the ONE
    * object GET that replaces per-member probing. */
  def consolidated(path: String, conf: Configuration = ZarrIO.hadoopConf())
      : Option[Map[String, JsonNode]] = {
    val (fs, p) = fsOf(path, conf)
    val zp = new HPath(p, ".zmetadata")
    if (!fs.exists(zp)) return None
    val mapper = new ObjectMapper()
    val top = mapper.readTree(readUtf8(fs, zp))
    require(top.get("zarr_consolidated_format").asInt() == 1,
      "unsupported consolidated-metadata format")
    val m = top.get("metadata")
    val b = Map.newBuilder[String, JsonNode]
    m.fieldNames().forEachRemaining(k => b += k -> m.get(k))
    Some(b.result())
  }

  /** 1-D member metadata, consolidated-first: when `.zmetadata` exists
    * the member's `.zarray` object is NEVER read (the object-store
    * open-cost contract; the spec deletes member `.zarray`s to prove
    * it). */
  def memberMeta1(groupPath: String, member: String,
                  conf: Configuration = ZarrIO.hadoopConf()): Zarr1Meta =
    consolidated(groupPath, conf) match {
      case Some(m) =>
        val key = s"$member/.zarray"
        parse1Meta(m.getOrElse(key, throw new IllegalArgumentException(
          s"member $member not in consolidated metadata ($key missing)")))
      case None => read1Meta(s"$groupPath/$member", conf)
    }

  /** Read a 1-D member column of a (possibly consolidated) group. */
  def readMember1(spark: SparkSession, groupPath: String,
                  member: String): DataFrame =
    read1(spark, s"$groupPath/$member", memberMeta1(groupPath, member))

  /** Member-array names of a consolidated group (keys ending
    * `/.zarray`), sorted — the store's table of contents from the ONE
    * `.zmetadata` GET, no listing RPCs. Requires consolidation (a
    * non-consolidated group would need a recursive listing — the exact
    * cost consolidation exists to avoid; fail loudly instead of hiding
    * it). */
  def members(path: String,
              conf: Configuration = ZarrIO.hadoopConf()): Seq[String] =
    consolidated(path, conf) match {
      case Some(m) => m.keys.filter(_.endsWith("/.zarray"))
        .map(_.stripSuffix("/.zarray")).toSeq.sorted
      case None => throw new IllegalArgumentException(
        s"$path has no .zmetadata — consolidate() it, or address members directly")
    }

  /** Write a `.zattrs` attributes object (raw JSON) beside a member —
    * e.g. AnnData's `{"encoding-type":"categorical"}` marker.
    * Consolidation folds it into `.zmetadata` with the rest. */
  def writeAttrs(path: String, json: String,
                 conf: Configuration = ZarrIO.hadoopConf()): Unit = {
    val (fs, p) = fsOf(path, conf)
    fs.mkdirs(p)
    writeUtf8(fs, new HPath(p, ".zattrs"), json)
  }

  /** Decode an AnnData-style CATEGORICAL member: a sub-group holding
    * `codes` (int, -1 = missing per the AnnData convention → NULL) and
    * `categories` (|S strings), returned as (idx, value) with codes
    * resolved to their category strings. The categories side is the
    * small dictionary — broadcast; codes stay distributed. */
  def readCategorical(spark: SparkSession, groupPath: String,
                      member: String): DataFrame = {
    val codes = readMember1(spark, groupPath, s"$member/codes")
      .select(col("idx"), col("value").as("code"))
    val cats = readMember1(spark, groupPath, s"$member/categories")
      .select(col("idx").as("code"), col("value"))
    codes.join(broadcast(cats), Seq("code"), "left")
      .select(col("idx"),
        when(col("code") >= 0, col("value")).otherwise(lit(null)).as("value"))
  }
}
