package graft.sources.hdf5

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Minimal pure-JVM HDF5 subset — the "libhdf5 classic" file class that
  * 10x CellRanger / h5py-default files use (reference R3's primary input
  * format; SURVEY.md §2A R3 [recalled:med] — no JVM HDF5 library exists
  * in this container, so the format core is vendored from the PUBLIC
  * HDF5 file-format specification):
  *
  *   - superblock version 0, little-endian, 8-byte offsets/lengths
  *   - version 1 object headers (with continuation-block support on read)
  *   - old-style groups: symbol-table B-tree v1 + local heap + SNOD
  *   - datasets: fixed-point (i8/i16/i32/i64) + IEEE float (f32/f64) +
  *     fixed-length strings + VARIABLE-length strings (class-9 vlen over
  *     global-heap collections — the h5py/AnnData string default);
  *     dataspace v1 (0-D/1-D/2-D); data layout v3, contiguous or chunked
  *     (B-tree v1 chunk index, multi-level)
  *   - filter pipeline v1/v2 with deflate (java.util.zip — no native dep)
  *   - attribute messages (0x000C, v1): scalar/1-D of the scalar types
  *     above plus fixed/vlen strings — where AnnData keeps its semantics
  *     (encoding-type, shape, _index, column-order)
  *
  * Anything outside the subset (v2+ superblocks, v2 object headers,
  * dense/link-message groups, non-deflate filters, datatypes above) is
  * rejected with a clear error, never misread. Unknown MESSAGE types
  * (fill values, mtimes...) are skipped by size, as the spec intends —
  * so files carrying extra metadata still parse.
  *
  * Scale posture: `H5Meta.open` reads only metadata (superblock, object
  * headers, B-trees — KBs); bulk data decodes on EXECUTORS from chunk /
  * range descriptors (Hdf5Scan) — the Zarr-source pattern, one task per
  * chunk, no driver materialization.
  */
object Hdf5 {
  val Undef: Long = -1L // 0xFFFF_FFFF_FFFF_FFFF — the spec's undefined address
  val Signature: Array[Byte] =
    Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte)

  // ----------------------------------------------------------- datatypes --
  sealed trait DType { def size: Int }
  case object I8 extends DType { val size = 1 }
  case object I16 extends DType { val size = 2 }
  case object I32 extends DType { val size = 4 }
  case object I64 extends DType { val size = 8 }
  case object F32 extends DType { val size = 4 }
  case object F64 extends DType { val size = 8 }
  case class FixedStr(size: Int) extends DType
  /** Variable-length string: each element is a 16-byte descriptor
    * (length u32, global-heap collection address u64, object index u32)
    * resolved against a GCOL collection — the h5py string default. */
  case object VlenStr extends DType { val size = 16 }

  /** A 2-D chunk's grid placement: element offsets of its top-left
    * corner and the (padded, full-size) tile shape. */
  case class Tile(rowOff: Long, colOff: Int, rows: Int, cols: Int)

  /** One chunk (or contiguous range) of raw dataset bytes — the unit of
    * executor-side work. `elemOffset` = global element index of the first
    * element; `storedSize` = on-disk bytes (compressed if deflated).
    * 2-D chunked datasets carry their grid placement in `tile` (their
    * elements are NOT globally contiguous — decode must map through the
    * tile geometry). */
  case class Piece(fileOffset: Long, storedSize: Long, elemOffset: Long,
                   nElems: Long, deflated: Boolean,
                   tile: Option[Tile] = None)

  case class DatasetMeta(path: String, dtype: DType, dims: Seq[Long],
                         pieces: Seq[Piece]) {
    def nElems: Long = dims.product
  }

  /** Parsed attribute value (subset: integer/float/string, scalar or
    * 1-D; a scalar parses as a 1-element Seq). */
  sealed trait AttrValue
  case class AttrLongs(v: Seq[Long]) extends AttrValue
  case class AttrDoubles(v: Seq[Double]) extends AttrValue
  case class AttrStrings(v: Seq[String]) extends AttrValue

  /** Full file inventory: datasets + per-object attributes (keyed by
    * object path; root = ""). Groups appear in `attrs` only. */
  case class H5File(datasets: Map[String, DatasetMeta],
                    attrs: Map[String, Map[String, AttrValue]]) {
    def attrStr(objPath: String, name: String): String =
      attrs.getOrElse(objPath, Map.empty).get(name) match {
        case Some(AttrStrings(Seq(s))) => s
        case other => sys.error(s"$objPath@$name: expected scalar string attr, got $other")
      }
    def attrStrs(objPath: String, name: String): Seq[String] =
      attrs.getOrElse(objPath, Map.empty).get(name) match {
        case Some(AttrStrings(v)) => v
        case other => sys.error(s"$objPath@$name: expected string attr, got $other")
      }
    def attrLongs(objPath: String, name: String): Seq[Long] =
      attrs.getOrElse(objPath, Map.empty).get(name) match {
        case Some(AttrLongs(v)) => v
        case other => sys.error(s"$objPath@$name: expected integer attr, got $other")
      }
  }

  /** Attribute payloads the writer knows how to encode. */
  sealed trait AttrSpec
  case class AttrStr(v: String) extends AttrSpec          // scalar vlen str
  case class AttrStrArray(v: Seq[String]) extends AttrSpec // 1-D vlen str
  case class AttrLongArray(v: Seq[Long]) extends AttrSpec  // 1-D i64
}

/** Little-endian growable buffer with back-patching — the writer's only
  * dependency. Offsets are file addresses (base address 0). */
final class H5Buf {
  private var arr = new Array[Byte](1 << 16)
  private var len = 0
  private def ensure(n: Int): Unit =
    if (len + n > arr.length) {
      var cap = arr.length
      while (cap < len + n) cap <<= 1
      arr = java.util.Arrays.copyOf(arr, cap)
    }
  def pos: Long = len
  def u8(v: Int): Unit = { ensure(1); arr(len) = v.toByte; len += 1 }
  def u16(v: Int): Unit = { u8(v & 0xff); u8((v >> 8) & 0xff) }
  def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
  def u64(v: Long): Unit = { u32(v & 0xffffffffL); u32((v >>> 32) & 0xffffffffL) }
  def bytes(b: Array[Byte]): Unit = { ensure(b.length); System.arraycopy(b, 0, arr, len, b.length); len += b.length }
  def zeros(n: Int): Unit = { ensure(n); len += n }
  def pad8(): Unit = while (len % 8 != 0) u8(0)
  def patchU64(at: Long, v: Long): Unit = {
    val b = ByteBuffer.wrap(arr, at.toInt, 8).order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(v)
  }
  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
}

/** Writer for the subset: build groups/datasets bottom-up, patch the
  * superblock's root entry last. Used by the h5 ingest fixture and the
  * round-trip specs; layout choices mirror libhdf5 defaults (v0
  * superblock, v1 object headers, old-style groups) so the READER is
  * exercised against the same file class real 10x exports belong to. */
final class H5Writer {
  import Hdf5._
  private val buf = new H5Buf
  // superblock reserved up front; root OH address patched at finish
  buf.bytes(Signature)
  buf.u8(0); buf.u8(0); buf.u8(0); buf.u8(0) // superblock/freespace/symtable vers + reserved
  buf.u8(0); buf.u8(8); buf.u8(8); buf.u8(0) // shared-msg ver, sizeof offsets, sizeof lengths, reserved
  buf.u16(4); buf.u16(16)                    // group leaf K, group internal K
  buf.u32(0)                                 // file consistency flags
  buf.u64(0); buf.u64(Undef)                 // base address, freespace address
  private val eofPatch = buf.pos; buf.u64(Undef)   // end-of-file address
  buf.u64(Undef)                             // driver info address
  buf.u64(0)                                 // root entry: link name offset
  private val rootOhPatch = buf.pos; buf.u64(Undef) // root entry: OH address
  buf.u32(0); buf.u32(0)                     // cache type 0 (nothing cached) + reserved
  buf.zeros(16)                              // scratch space (unused for type 0)

  // ----------------------------------------------------- message encoding --
  private def dtypeMsg(t: DType): Array[Byte] = {
    val b = new H5Buf
    t match {
      case I8  => b.u8(0x10); b.u8(0x08); b.u8(0); b.u8(0); b.u32(1); b.u16(0); b.u16(8)
      case I16 => b.u8(0x10); b.u8(0x08); b.u8(0); b.u8(0); b.u32(2); b.u16(0); b.u16(16)
      case I32 => b.u8(0x10); b.u8(0x08); b.u8(0); b.u8(0); b.u32(4); b.u16(0); b.u16(32)
      case I64 => b.u8(0x10); b.u8(0x08); b.u8(0); b.u8(0); b.u32(8); b.u16(0); b.u16(64)
      case F32 => b.u8(0x11); b.u8(0x20); b.u8(0x1f); b.u8(0); b.u32(4)
                  b.u16(0); b.u16(32); b.u8(23); b.u8(8); b.u8(0); b.u8(23); b.u32(127)
      case F64 => b.u8(0x11); b.u8(0x20); b.u8(0x3f); b.u8(0); b.u32(8)
                  b.u16(0); b.u16(64); b.u8(52); b.u8(11); b.u8(0); b.u8(52); b.u32(1023)
      case FixedStr(n) => b.u8(0x13); b.u8(0); b.u8(0); b.u8(0); b.u32(n)
      case VlenStr => // class 9 v1, type=string, UTF-8; 16-byte descriptor
        b.u8(0x19); b.u8(0x01); b.u8(0x01); b.u8(0); b.u32(16)
        b.u8(0x13); b.u8(0); b.u8(0); b.u8(0); b.u32(1) // base: 1-byte string
    }
    b.toArray
  }
  private def dataspaceMsg(dims: Seq[Long]): Array[Byte] = {
    val b = new H5Buf
    b.u8(1); b.u8(dims.length); b.u8(0); b.zeros(5)
    dims.foreach(b.u64)
    b.toArray
  }
  private def contiguousLayoutMsg(addr: Long, size: Long): Array[Byte] = {
    val b = new H5Buf; b.u8(3); b.u8(1); b.u64(addr); b.u64(size); b.toArray
  }
  private def chunkedLayoutMsg(btreeAddr: Long, chunkElems: Long,
                               elemSize: Int): Array[Byte] = {
    val b = new H5Buf
    b.u8(3); b.u8(2); b.u8(2) // v3, chunked, dimensionality = rank+1 = 2 (1-D data)
    b.u64(btreeAddr); b.u32(chunkElems); b.u32(elemSize)
    b.toArray
  }
  private def chunkedLayoutMsg2d(btreeAddr: Long, chunkRows: Int,
                                 chunkCols: Int, elemSize: Int): Array[Byte] = {
    val b = new H5Buf
    b.u8(3); b.u8(2); b.u8(3) // v3, chunked, dimensionality = rank+1 = 3
    b.u64(btreeAddr); b.u32(chunkRows); b.u32(chunkCols); b.u32(elemSize)
    b.toArray
  }
  private def deflateMsg(level: Int): Array[Byte] = {
    val b = new H5Buf
    b.u8(1); b.u8(1); b.zeros(6)            // v1, one filter
    b.u16(1); b.u16(0); b.u16(0); b.u16(1)  // id=deflate, no name, flags, 1 cd value
    b.u32(level); b.u32(0)                  // cd[0]=level + pad to 8
    b.toArray
  }
  private def symbolTableMsg(btree: Long, heap: Long): Array[Byte] = {
    val b = new H5Buf; b.u64(btree); b.u64(heap); b.toArray
  }

  // ------------------------------------------------------- global heap --
  /** One GCOL collection holding `items` (object indices 1..n); returns
    * the collection address. Collection size field covers header +
    * objects, per spec; no free-space object is emitted (exact fit). */
  private def writeGcol(items: Seq[Array[Byte]]): Long = {
    // 8-align the collection start: header and object headers are
    // 8-multiples, so absolute pad8() after each object's data then
    // equals the spec's relative 8-alignment within the collection
    buf.pad8()
    val addr = buf.pos
    buf.bytes("GCOL".getBytes("ASCII"))
    buf.u8(1); buf.zeros(3)
    val sizePatch = buf.pos; buf.u64(0)
    items.zipWithIndex.foreach { case (b, i) =>
      buf.u16(i + 1); buf.u16(1); buf.u32(0); buf.u64(b.length.toLong)
      buf.bytes(b); buf.pad8()
    }
    buf.patchU64(sizePatch, buf.pos - addr)
    addr
  }

  /** vlen-string payload: strings go to global-heap collections (≤64 per
    * collection, so multi-collection resolution is exercised by any
    * dataset over 64 rows — libhdf5 similarly spreads collections), the
    * dataset/attribute data itself is the packed 16-byte descriptors. */
  private def vlenDescriptors(values: Seq[String]): Array[Byte] = {
    val out = new H5Buf
    values.grouped(64).foreach { grp =>
      val bytes = grp.map(_.getBytes("UTF-8"))
      val addr = writeGcol(bytes)
      bytes.zipWithIndex.foreach { case (b, i) =>
        out.u32(b.length.toLong); out.u64(addr); out.u32((i + 1).toLong)
      }
    }
    out.toArray
  }

  // -------------------------------------------------------- attributes --
  /** v1 attribute message: header, NUL-terminated name, datatype and
    * dataspace messages (each 8-padded), then raw data. Any global-heap
    * collections a vlen value needs are written BEFORE the message body
    * (the buffer is append-only, so their addresses are final). */
  private def attrMsg(name: String, spec: AttrSpec): (Int, Array[Byte]) = {
    val (dt, ds, data) = spec match {
      case AttrStr(v) =>
        (dtypeMsg(VlenStr), dataspaceMsg(Seq()), vlenDescriptors(Seq(v)))
      case AttrStrArray(v) =>
        (dtypeMsg(VlenStr), dataspaceMsg(Seq(v.length.toLong)),
          vlenDescriptors(v))
      case AttrLongArray(v) =>
        (dtypeMsg(I64), dataspaceMsg(Seq(v.length.toLong)),
          rawBytes(I64, bb => v.foreach(bb.putLong), v.length))
    }
    val nb = name.getBytes("UTF-8") :+ 0.toByte
    def p8(n: Int) = (n + 7) / 8 * 8
    val b = new H5Buf
    b.u8(1); b.u8(0); b.u16(nb.length); b.u16(dt.length); b.u16(ds.length)
    b.bytes(nb); b.zeros(p8(nb.length) - nb.length)
    b.bytes(dt); b.zeros(p8(dt.length) - dt.length)
    b.bytes(ds); b.zeros(p8(ds.length) - ds.length)
    b.bytes(data)
    (0x000C, b.toArray)
  }

  /** v1 object header: 12-byte prefix + 4 pad, then 8-byte-aligned
    * messages (type, padded size, flags, reserved ×3). */
  private def writeObjectHeader(msgs: Seq[(Int, Array[Byte])]): Long = {
    val addr = buf.pos
    val padded = msgs.map { case (t, d) => (t, d, (d.length + 7) / 8 * 8) }
    buf.u8(1); buf.u8(0); buf.u16(msgs.length); buf.u32(1)
    buf.u32(padded.map(8 + _._3).sum); buf.zeros(4)
    padded.foreach { case (t, d, ps) =>
      buf.u16(t); buf.u16(ps); buf.u8(0); buf.zeros(3)
      buf.bytes(d); buf.zeros(ps - d.length)
    }
    addr
  }

  // ------------------------------------------------------------ datasets --
  private def rawBytes(t: DType, put: ByteBuffer => Unit, n: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * t.size).order(ByteOrder.LITTLE_ENDIAN)
    put(bb); bb.array()
  }

  private def writeDataset(t: DType, dims: Seq[Long], raw: Array[Byte],
                           chunkElems: Int, deflate: Boolean,
                           attrs: Seq[(String, AttrSpec)] = Nil): Long = {
    val attrMsgs = attrs.map { case (n, sp) => attrMsg(n, sp) }
    if (chunkElems <= 0) { // contiguous
      val dataAddr = buf.pos
      buf.bytes(raw)
      writeObjectHeader(Seq(
        0x0001 -> dataspaceMsg(dims),
        0x0003 -> dtypeMsg(t),
        0x0008 -> contiguousLayoutMsg(dataAddr, raw.length.toLong)) ++ attrMsgs)
    } else { // chunked 1-D (+ deflate) with a B-tree v1 index
      require(dims.length == 1, "chunked writer is 1-D")
      val defl = new Deflater(6)
      val chunks = raw.grouped(chunkElems * t.size).zipWithIndex.map {
        case (c, i) =>
          val out = if (!deflate) c else compress(defl, c)
          val addr = buf.pos
          buf.bytes(out)
          (addr, out.length.toLong, Seq(i.toLong * chunkElems))
      }.toVector
      defl.end()
      val btree = writeChunkBtree(chunks, Seq(dims.head), maxLeaf = 64)
      // the filter-pipeline message must track the actual chunk
      // encoding: raw chunks with a declared deflate filter would be
      // fed to the reader's Inflater
      writeObjectHeader(Seq(
        0x0001 -> dataspaceMsg(dims),
        0x0003 -> dtypeMsg(t)) ++
        (if (deflate) Seq(0x000b -> deflateMsg(6)) else Nil) ++ Seq(
        0x0008 -> chunkedLayoutMsg(btree, chunkElems.toLong, t.size)) ++ attrMsgs)
    }
  }

  private def compress(defl: Deflater, raw: Array[Byte]): Array[Byte] = {
    defl.reset(); defl.setInput(raw); defl.finish()
    val tmp = new Array[Byte](raw.length + 64)
    val acc = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) {
      val n = defl.deflate(tmp); acc.write(tmp, 0, n)
    }
    acc.toByteArray
  }

  /** B-tree v1, node type 1 (chunk index): leaves of ≤maxLeaf entries and
    * one internal level above when there is more than one leaf — so the
    * reader's multi-level walk is exercised by any dataset with more than
    * maxLeaf chunks. Keys are (stored size, filter mask, per-dim corner
    * offsets, 0); each node carries entries+1 keys. Rank-generic: 1-D
    * chunks pass a single offset, 2-D pass (rowOff, colOff). */
  private def writeChunkBtree(chunks: Vector[(Long, Long, Seq[Long])],
                              endKey: Seq[Long], maxLeaf: Int): Long = {
    def key(b: H5Buf, size: Long, offs: Seq[Long]): Unit = {
      b.u32(size); b.u32(0); offs.foreach(b.u64); b.u64(0)
    }
    def writeNode(level: Int, entries: Vector[(Long, Long, Seq[Long])],
                  endOff: Seq[Long]): Long = {
      val addr = buf.pos
      buf.bytes("TREE".getBytes("ASCII"))
      buf.u8(1); buf.u8(level); buf.u16(entries.length)
      buf.u64(Undef); buf.u64(Undef)
      entries.foreach { case (child, size, offs) =>
        key(buf, size, offs); buf.u64(child)
      }
      key(buf, 0, endOff)
      addr
    }
    val leaves = chunks.grouped(maxLeaf).toVector
    if (leaves.length == 1) writeNode(0, leaves.head, endKey)
    else {
      val leafAddrs = leaves.zipWithIndex.map { case (leaf, i) =>
        val end = if (i + 1 < leaves.length) leaves(i + 1).head._3 else endKey
        (writeNode(0, leaf, end), 0L, leaf.head._3)
      }
      writeNode(1, leafAddrs, endKey)
    }
  }

  def addI64(values: Array[Long], chunkElems: Int = 0, deflate: Boolean = false): Long =
    writeDataset(Hdf5.I64, Seq(values.length.toLong),
      rawBytes(Hdf5.I64, bb => values.foreach(bb.putLong), values.length),
      chunkElems, deflate)
  def addI32(values: Array[Int], chunkElems: Int = 0, deflate: Boolean = false): Long =
    writeDataset(Hdf5.I32, Seq(values.length.toLong),
      rawBytes(Hdf5.I32, bb => values.foreach(bb.putInt), values.length),
      chunkElems, deflate)
  def addI8(values: Array[Byte], chunkElems: Int = 0, deflate: Boolean = false): Long =
    writeDataset(Hdf5.I8, Seq(values.length.toLong), values.clone(),
      chunkElems, deflate)
  /** Variable-length string dataset (h5py/AnnData string layout):
    * strings in global-heap collections, data = 16-byte descriptors. */
  def addVlenStr(values: Array[String],
                 attrs: Seq[(String, Hdf5.AttrSpec)] = Nil): Long =
    writeDataset(Hdf5.VlenStr, Seq(values.length.toLong),
      vlenDescriptors(values.toSeq), chunkElems = 0, deflate = false, attrs)
  def addF64(values: Array[Double], chunkElems: Int = 0, deflate: Boolean = false): Long =
    writeDataset(Hdf5.F64, Seq(values.length.toLong),
      rawBytes(Hdf5.F64, bb => values.foreach(bb.putDouble), values.length),
      chunkElems, deflate)
  def addF32(values: Array[Float], chunkElems: Int = 0, deflate: Boolean = false): Long =
    writeDataset(Hdf5.F32, Seq(values.length.toLong),
      rawBytes(Hdf5.F32, bb => values.foreach(bb.putFloat), values.length),
      chunkElems, deflate)
  /** 2-D CHUNKED (+deflate) f64 dataset — the h5py default layout for a
    * dense matrix (AnnData dense X). Row-major tiles, every stored tile
    * FULL-SIZE with zero padding at the edges (libhdf5's convention,
    * which is what lets the reader treat nElems as chunkRows·chunkCols
    * unconditionally); B-tree keys carry the (rowOff, colOff) corner. */
  def addF64_2dChunked(values: Array[Double], rows: Int, cols: Int,
                       chunkRows: Int, chunkCols: Int,
                       deflate: Boolean = true,
                       attrs: Seq[(String, Hdf5.AttrSpec)] = Nil): Long = {
    require(values.length == rows * cols, "values must be rows*cols row-major")
    val attrMsgs = attrs.map { case (n, sp) => attrMsg(n, sp) }
    val defl = new Deflater(6)
    val chunks = (for {
      r0 <- 0 until rows by chunkRows
      c0 <- 0 until cols by chunkCols
    } yield {
      val bb = ByteBuffer.allocate(chunkRows * chunkCols * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      var r = 0
      while (r < chunkRows) {
        var c = 0
        while (c < chunkCols) {
          bb.putDouble(
            if (r0 + r < rows && c0 + c < cols)
              values((r0 + r) * cols + (c0 + c))
            else 0.0)
          c += 1
        }
        r += 1
      }
      val raw = bb.array()
      val enc = if (!deflate) raw else compress(defl, raw)
      val addr = buf.pos
      buf.bytes(enc)
      (addr, enc.length.toLong, Seq(r0.toLong, c0.toLong))
    }).toVector
    defl.end()
    val btree = writeChunkBtree(chunks, Seq(rows.toLong, cols.toLong),
      maxLeaf = 64)
    val msgs = (Seq(
      0x0001 -> dataspaceMsg(Seq(rows.toLong, cols.toLong)),
      0x0003 -> dtypeMsg(F64)) ++
      (if (deflate) Seq(0x000b -> deflateMsg(6)) else Nil) :+
      (0x0008 -> chunkedLayoutMsg2d(btree, chunkRows, chunkCols, 8))) ++
      attrMsgs
    writeObjectHeader(msgs)
  }

  def addI64_2d(values: Array[Long], rows: Long, cols: Long): Long = {
    val raw = rawBytes(Hdf5.I64, bb => values.foreach(bb.putLong), values.length)
    val dataAddr = buf.pos
    buf.bytes(raw)
    writeObjectHeader(Seq(
      0x0001 -> dataspaceMsg(Seq(rows, cols)),
      0x0003 -> dtypeMsg(Hdf5.I64),
      0x0008 -> contiguousLayoutMsg(dataAddr, raw.length.toLong)))
  }
  def addFixedStr(values: Array[String], width: Int): Long = {
    val raw = new Array[Byte](values.length * width)
    values.zipWithIndex.foreach { case (s, i) =>
      val b = s.getBytes("UTF-8")
      require(b.length < width, s"string '$s' overflows width $width")
      System.arraycopy(b, 0, raw, i * width, b.length)
    }
    val dataAddr = buf.pos
    buf.bytes(raw)
    writeObjectHeader(Seq(
      0x0001 -> dataspaceMsg(Seq(values.length.toLong)),
      0x0003 -> dtypeMsg(Hdf5.FixedStr(width)),
      0x0008 -> contiguousLayoutMsg(dataAddr, raw.length.toLong)))
  }

  // -------------------------------------------------------------- groups --
  /** Old-style group over already-written children: local heap (names) +
    * one SNOD + a 1-leaf symbol-table B-tree + the group's object
    * header. Returns the group OH address. */
  def addGroup(children: Seq[(String, Long)],
               attrs: Seq[(String, Hdf5.AttrSpec)] = Nil): Long = {
    val sorted = children.sortBy(_._1)
    // heap data: offset 0 is the empty string (B-tree key 0), then each
    // name at an 8-aligned offset
    val heapData = new H5Buf
    heapData.u8(0); heapData.pad8()
    val nameOff = sorted.map { case (name, _) =>
      val off = heapData.pos
      heapData.bytes(name.getBytes("UTF-8")); heapData.u8(0); heapData.pad8()
      off
    }
    val heapAddr = buf.pos
    buf.bytes("HEAP".getBytes("ASCII"))
    buf.u8(0); buf.zeros(3)
    buf.u64(heapData.pos)       // data segment size
    buf.u64(Undef)              // free-list head: none
    buf.u64(heapAddr + 32)      // data segment follows this header
    buf.bytes(heapData.toArray)
    val snodAddr = buf.pos
    buf.bytes("SNOD".getBytes("ASCII"))
    buf.u8(1); buf.u8(0); buf.u16(sorted.length)
    sorted.zip(nameOff).foreach { case ((_, oh), off) =>
      buf.u64(off); buf.u64(oh); buf.u32(0); buf.u32(0); buf.zeros(16)
    }
    val btreeAddr = buf.pos
    buf.bytes("TREE".getBytes("ASCII"))
    buf.u8(0); buf.u8(0); buf.u16(1)        // group node, leaf, 1 child
    buf.u64(Undef); buf.u64(Undef)
    buf.u64(0)                              // key 0: "" (heap offset 0)
    buf.u64(snodAddr)
    buf.u64(nameOff.last)                   // key 1: largest name in child
    writeObjectHeader(Seq(0x0011 -> symbolTableMsg(btreeAddr, heapAddr)) ++
      attrs.map { case (n, sp) => attrMsg(n, sp) })
  }

  /** Install `children` as the root group and return the file bytes. */
  def finish(children: Seq[(String, Long)]): Array[Byte] = {
    val rootOh = addGroup(children)
    buf.patchU64(rootOhPatch, rootOh)
    buf.patchU64(eofPatch, buf.pos)
    buf.toArray
  }

  def writeTo(path: String, children: Seq[(String, Long)]): Unit = {
    val out = finish(children)
    val f = new java.io.FileOutputStream(path)
    try f.write(out) finally f.close()
  }
}

/** Metadata parser (driver-side, bounded reads) + executor-side piece
  * decoding. */
object H5Meta {
  import Hdf5._

  private final class Reader(val raf: RandomAccessFile) {
    def at(off: Long, n: Int): ByteBuffer = {
      val b = new Array[Byte](n)
      raf.seek(off); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
  }

  /** Parse the file's dataset inventory: path → meta. */
  def open(path: String): Map[String, DatasetMeta] = openFull(path).datasets

  /** Full inventory: datasets + per-object attributes (groups included —
    * AnnData's encoding-type/shape/_index/column-order live on group
    * attributes). */
  def openFull(path: String): H5File = {
    val r = new Reader(new RandomAccessFile(path, "r"))
    try {
      val sig = new Array[Byte](8)
      r.raf.seek(0); r.raf.readFully(sig)
      require(sig.sameElements(Signature), s"$path: not an HDF5 file")
      val head = r.at(8, 88)
      val sbVer = head.get() & 0xff
      require(sbVer == 0, s"superblock v$sbVer unsupported (subset: v0)")
      head.position(5)
      val so = head.get() & 0xff; val sl = head.get() & 0xff
      require(so == 8 && sl == 8, s"offset/length sizes $so/$sl unsupported")
      head.position(16)
      val base = head.getLong
      require(base == 0, s"nonzero base address $base unsupported")
      head.position(48)  // eof(8) + driver-info(8) skipped: root entry next
      head.getLong       // root link name offset
      val rootOh = head.getLong
      val out = collection.mutable.Map[String, DatasetMeta]()
      val attrs = collection.mutable.Map[String, Map[String, AttrValue]]()
      walkObject(r, rootOh, "", out, attrs)
      H5File(out.toMap, attrs.toMap)
    } finally r.raf.close()
  }

  // ------------------------------------------------------- global heap --
  /** Parse one GCOL collection: object index → bytes. Bounded read (the
    * collection declares its own size). */
  def readGcol(raf: RandomAccessFile, addr: Long): Map[Int, Array[Byte]] = {
    val hdr = {
      val b = new Array[Byte](16)
      raf.seek(addr); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
    require(new String(hdr.array(), 0, 4, "ASCII") == "GCOL",
      s"bad global-heap collection at $addr")
    require((hdr.get(4) & 0xff) == 1, s"global heap version at $addr")
    hdr.position(8)
    val collSize = hdr.getLong
    val body = {
      val b = new Array[Byte]((collSize - 16).toInt)
      raf.seek(addr + 16); raf.readFully(b)
      ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    }
    val out = collection.mutable.Map[Int, Array[Byte]]()
    var done = false
    while (!done && body.remaining() >= 16) {
      val idx = body.getShort & 0xffff
      body.getShort // ref count
      body.getInt   // reserved
      val size = body.getLong
      if (idx == 0) done = true // free-space object terminates the walk
      else {
        val data = new Array[Byte](size.toInt)
        body.get(data)
        // objects are 8-aligned; skip the pad
        val pad = (8 - (size % 8).toInt) % 8
        body.position(body.position() + pad)
        out(idx) = data
      }
    }
    out.toMap
  }

  /** Resolve ONE vlen-string descriptor — 16 bytes at `off` in `bb`:
    * length u32, collection address u64, object index u32 — against a
    * caller-held GCOL cache (one collection read per distinct address,
    * not per string). The single source of truth for descriptor layout
    * and the len-vs-stored truncation rule; shared by the executor
    * scans, the driver reads, and attribute parsing. */
  def resolveVlen(raf: RandomAccessFile,
                  cache: collection.mutable.Map[Long, Map[Int, Array[Byte]]],
                  bb: ByteBuffer, off: Int, what: String): String = {
    val len = bb.getInt(off)
    val addr = bb.getLong(off + 4)
    val idx = bb.getInt(off + 12)
    val coll = cache.getOrElseUpdate(addr, readGcol(raf, addr))
    val obj = coll.getOrElse(idx,
      sys.error(s"$what: global heap $addr has no object $idx"))
    new String(obj, 0, math.min(len, obj.length), "UTF-8")
  }

  // -------------------------------------------------------- attributes --
  /** v1 attribute message → (name, value). Subset: scalar/1-D of
    * fixed-point, float, fixed-string, vlen-string. */
  private def parseAttr(r: Reader, body: ByteBuffer): (String, AttrValue) = {
    val ver = body.get() & 0xff
    require(ver == 1, s"attribute message v$ver unsupported (subset: v1)")
    body.get()
    val nameSize = body.getShort & 0xffff
    val dtSize = body.getShort & 0xffff
    val dsSize = body.getShort & 0xffff
    def p8(n: Int) = (n + 7) / 8 * 8
    val arr = body.array()
    val base = body.position()
    var e = base
    while (arr(e) != 0) e += 1
    val name = new String(arr, base, e - base, "UTF-8")
    val dtOff = base + p8(nameSize)
    val dsOff = dtOff + p8(dtSize)
    val dataOff = dsOff + p8(dsSize)
    body.position(dtOff)
    val cv = body.get() & 0xff; val clazz = cv & 0x0f
    val bits0 = body.get() & 0xff
    body.get(); body.get()
    val size = body.getInt
    // fixed-point sign bit (bit 3): the subset reads SIGNED ints only —
    // get().toLong below sign-extends, which would turn an unsigned 255
    // into -1; reject instead of misreading (same philosophy as the
    // dataset path's explicit subset rejection)
    require(clazz != 0 || (bits0 & 0x08) != 0,
      s"attr $name: unsigned fixed-point attributes unsupported")
    body.position(dsOff)
    require((body.get() & 0xff) == 1, s"attr $name: dataspace version")
    val rank = body.get() & 0xff
    body.position(dsOff + 8)
    val dims = (0 until rank).map(_ => body.getLong)
    val n = dims.product.toInt // rank 0 (scalar) → 1
    val value = (clazz, size) match {
      case (0, sz) => AttrLongs((0 until n).map { i =>
        body.position(dataOff + i * sz)
        sz match {
          case 1 => body.get().toLong
          case 2 => body.getShort.toLong
          case 4 => body.getInt.toLong
          case 8 => body.getLong
          case _ => sys.error(s"attr $name: int size $sz")
        }
      })
      case (1, 4) => AttrDoubles((0 until n).map { i =>
        body.position(dataOff + i * 4); body.getFloat.toDouble })
      case (1, 8) => AttrDoubles((0 until n).map { i =>
        body.position(dataOff + i * 8); body.getDouble })
      case (3, sz) => AttrStrings((0 until n).map { i =>
        var end = dataOff + i * sz
        val stop = dataOff + (i + 1) * sz
        while (end < stop && arr(end) != 0) end += 1
        new String(arr, dataOff + i * sz, end - (dataOff + i * sz), "UTF-8")
      })
      case (9, 16) => {
        val cache = collection.mutable.Map[Long, Map[Int, Array[Byte]]]()
        AttrStrings((0 until n).map(i =>
          resolveVlen(r.raf, cache, body, dataOff + i * 16, s"attr $name")))
      }
      case (c, sz) => sys.error(s"attr $name: datatype class $c size $sz unsupported")
    }
    (name, value)
  }

  // one parsed v1 object header: message type → payloads (may repeat)
  private def readMessages(r: Reader, addr: Long): Seq[(Int, ByteBuffer)] = {
    val pre = r.at(addr, 16)
    val ver = pre.get() & 0xff
    require(ver == 1, s"object header v$ver unsupported (subset: v1)")
    pre.get()
    val nMsgs = pre.getShort & 0xffff
    pre.getInt // ref count
    val hdrSize = pre.getInt.toLong & 0xffffffffL
    var blocks = List((addr + 16, hdrSize)) // (start, size) of message blocks
    val msgs = collection.mutable.ArrayBuffer[(Int, ByteBuffer)]()
    var read = 0
    while (read < nMsgs && blocks.nonEmpty) {
      val (start, size) = blocks.head
      blocks = blocks.tail
      var cur = start
      val end = start + size
      while (read < nMsgs && cur + 8 <= end) {
        val h = r.at(cur, 8)
        val typ = h.getShort & 0xffff
        val len = h.getShort & 0xffff
        val body = r.at(cur + 8, len)
        if (typ == 0x0010) { // continuation: another message block
          blocks = blocks :+ (body.getLong, body.getLong)
        } else msgs += ((typ, body))
        read += 1
        cur += 8 + len
      }
    }
    msgs.toSeq
  }

  private def walkObject(r: Reader, addr: Long, path: String,
                         out: collection.mutable.Map[String, DatasetMeta],
                         attrsOut: collection.mutable.Map[String, Map[String, AttrValue]]): Unit = {
    val msgs = readMessages(r, addr)
    val objAttrs = msgs.filter(_._1 == 0x000C)
      .map { case (_, b) => parseAttr(r, b) }.toMap
    if (objAttrs.nonEmpty) attrsOut(path) = objAttrs
    val symtab = msgs.find(_._1 == 0x0011)
    if (symtab.isDefined) { // group
      val st = symtab.get._2
      val btree = st.getLong; val heap = st.getLong
      val heapHdr = r.at(heap, 32)
      require(new String(heapHdr.array(), 0, 4, "ASCII") == "HEAP",
        s"bad local heap at $heap")
      heapHdr.position(8)
      val heapSize = heapHdr.getLong; heapHdr.getLong
      val heapData = r.at(heapHdr.getLong, heapSize.toInt)
      def name(off: Long): String = {
        val a = heapData.array(); var i = off.toInt; val s = i
        while (a(i) != 0) i += 1
        new String(a, s, i - s, "UTF-8")
      }
      def walkGroupNode(nodeAddr: Long): Unit = {
        val hdr = r.at(nodeAddr, 8)
        val sigS = new String(hdr.array(), 0, 4, "ASCII")
        require(sigS == "TREE", s"bad group B-tree node at $nodeAddr")
        hdr.position(4)
        require((hdr.get() & 0xff) == 0, "not a group node")
        val level = hdr.get() & 0xff
        val n = hdr.getShort & 0xffff
        // keys/children: key0(8) child0(8) key1(8) ... keyN(8)
        val body = r.at(nodeAddr + 24, 8 * (2 * n + 1))
        (0 until n).foreach { i =>
          body.position(8 * (2 * i + 1))
          val child = body.getLong
          if (level > 0) walkGroupNode(child)
          else { // SNOD
            val sh = r.at(child, 8)
            require(new String(sh.array(), 0, 4, "ASCII") == "SNOD",
              s"bad SNOD at $child")
            sh.position(6)
            val nSym = sh.getShort & 0xffff
            val entries = r.at(child + 8, 40 * nSym)
            (0 until nSym).foreach { j =>
              entries.position(40 * j)
              val nameOff = entries.getLong
              val oh = entries.getLong
              walkObject(r, oh, s"$path/${name(nameOff)}", out, attrsOut)
            }
          }
        }
      }
      walkGroupNode(btree)
    } else { // dataset
      val space = msgs.find(_._1 == 0x0001)
        .getOrElse(sys.error(s"$path: no dataspace")). _2
      require((space.get() & 0xff) == 1, s"$path: dataspace version unsupported")
      val rank = space.get() & 0xff
      space.position(8)
      val dims = (0 until rank).map(_ => space.getLong)
      val dt = msgs.find(_._1 == 0x0003)
        .getOrElse(sys.error(s"$path: no datatype")). _2
      val cv = dt.get() & 0xff
      val clazz = cv & 0x0f
      val bits = Array(dt.get(), dt.get(), dt.get())
      val size = dt.getInt
      // byte-order bit is only defined for fixed-point/float classes;
      // class 9 (vlen) reuses bit 0 for its type field
      require(clazz > 1 || (bits(0) & 1) == 0, s"$path: big-endian unsupported")
      val dtype: DType = (clazz, size) match {
        case (0, 1) => I8
        case (0, 2) => I16
        case (0, 4) => I32
        case (0, 8) => I64
        case (1, 4) => F32
        case (1, 8) => F64
        case (3, n) => FixedStr(n)
        case (9, 16) =>
          // vlen: bits0 low nibble 1 = string (sequences unsupported)
          require((bits(0) & 0x0f) == 1,
            s"$path: vlen sequences unsupported (vlen strings only)")
          VlenStr
        case (c, n) => sys.error(s"$path: datatype class $c size $n unsupported")
      }
      val deflated = msgs.find(_._1 == 0x000b).map(_._2).exists { m =>
        val ver = m.get() & 0xff
        val nf = m.get() & 0xff
        require(ver == 1 || ver == 2, s"$path: filter pipeline v$ver")
        if (ver == 1) m.position(8)
        var anyDeflate = false
        (0 until nf).foreach { _ =>
          val id = m.getShort & 0xffff
          val nameLen = if (ver == 1 || id >= 256) m.getShort & 0xffff else 0
          m.getShort // flags
          val ncd = m.getShort & 0xffff
          m.position(m.position() + nameLen)
          (0 until ncd).foreach(_ => m.getInt)
          if (ver == 1 && ncd % 2 == 1) m.getInt // pad
          require(id == 1, s"$path: filter $id unsupported (deflate only)")
          anyDeflate = true
        }
        anyDeflate
      }
      val layout = msgs.find(_._1 == 0x0008)
        .getOrElse(sys.error(s"$path: no layout")). _2
      require((layout.get() & 0xff) == 3, s"$path: layout version unsupported")
      val pieces: Seq[Piece] = (layout.get() & 0xff) match {
        case 1 => // contiguous
          val dataAddr = layout.getLong; val dataSize = layout.getLong
          require(!deflated, s"$path: deflate on contiguous layout")
          if (dataAddr == Undef || dataSize == 0) Seq.empty
          else Seq(Piece(dataAddr, dataSize, 0L, dims.product, deflated = false))
        case 2 => // chunked, B-tree v1; dimensionality = data rank + 1
          val dimensionality = layout.get() & 0xff
          require(dimensionality == 2 || dimensionality == 3,
            s"$path: only 1-D/2-D chunked supported")
          val btree = layout.getLong
          // chunk shape: one u32 per data dim, then the element size
          val chunkDims = (0 until dimensionality - 1)
            .map(_ => layout.getInt.toLong & 0xffffffffL)
          val chunkElems = chunkDims.product
          val total = dims.product
          val acc = collection.mutable.ArrayBuffer[Piece]()
          def walk(nodeAddr: Long): Unit = {
            val hdr = r.at(nodeAddr, 8)
            require(new String(hdr.array(), 0, 4, "ASCII") == "TREE",
              s"$path: bad chunk B-tree node at $nodeAddr")
            hdr.position(4)
            require((hdr.get() & 0xff) == 1, s"$path: not a chunk node")
            val level = hdr.get() & 0xff
            val n = hdr.getShort & 0xffff
            val keySize = 8 + 8 * dimensionality
            val body = r.at(nodeAddr + 24, (keySize + 8) * n + keySize)
            (0 until n).foreach { i =>
              body.position((keySize + 8) * i)
              val storedSize = body.getInt.toLong & 0xffffffffL
              body.getInt // filter mask
              // per-dim element offsets of the chunk's corner
              val offs = (0 until dimensionality - 1).map(_ => body.getLong)
              body.position((keySize + 8) * i + keySize)
              val child = body.getLong
              if (level > 0) walk(child)
              else if (dimensionality == 2)
                acc += Piece(child, storedSize, offs.head,
                  math.min(chunkElems, total - offs.head), deflated)
              else // 2-D: stored chunks are FULL-SIZE (fill-padded edges)
                acc += Piece(child, storedSize,
                  offs.head * dims(1) + offs(1), chunkElems, deflated,
                  tile = Some(Tile(offs.head, offs(1).toInt,
                    chunkDims.head.toInt, chunkDims(1).toInt)))
            }
          }
          if (btree != Undef) walk(btree)
          acc.toSeq
        case c => sys.error(s"$path: layout class $c unsupported")
      }
      out(path) = DatasetMeta(path, dtype, dims, pieces)
    }
  }

  /** Executor-side: raw stored bytes of one piece → decoded bytes. */
  def decodePiece(file: String, p: Piece, elemSize: Int): Array[Byte] = {
    val raf = new RandomAccessFile(file, "r")
    val stored =
      try { val b = new Array[Byte](p.storedSize.toInt); raf.seek(p.fileOffset); raf.readFully(b); b }
      finally raf.close()
    if (!p.deflated) stored
    else {
      val inf = new Inflater()
      inf.setInput(stored)
      val out = new Array[Byte]((p.nElems * elemSize).toInt)
      var off = 0
      while (!inf.finished() && off < out.length)
        off += inf.inflate(out, off, out.length - off)
      inf.end()
      require(off == out.length, s"chunk inflate short: $off/${out.length}")
      out
    }
  }
}
