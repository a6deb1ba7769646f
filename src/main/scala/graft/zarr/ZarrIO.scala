package graft.zarr

import java.io.{ByteArrayOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, DeflaterOutputStream, Inflater}

/** Zarr v2 directory-store metadata + chunk codec (public spec:
  * https://zarr.readthedocs.io/en/stable/spec/v2.html — the storage format
  * of the reference's `zarr_spark.py` chunk readers [recalled, SURVEY.md
  * §2A R1/R2]; the mount was empty so semantics anchor on the published
  * spec). Scope: 2-D arrays, C order, little-endian f4/f8/i2/i4/i8,
  * compressor `zlib` or none — normalized (float) and raw-count (int)
  * expression matrices.
  */
case class ZarrMeta(rows: Long, cols: Int, chunkRows: Int, chunkCols: Int,
                    dtype: String, compressor: Option[String],
                    fillValue: Double) {
  require(ZarrIO.BytesPerElem.contains(dtype),
    s"unsupported zarr dtype $dtype " +
      s"(supported: ${ZarrIO.BytesPerElem.keys.mkString(", ")})")
  def bytesPerElem: Int = ZarrIO.BytesPerElem(dtype)
  def rowChunkCount: Int = (((rows + chunkRows - 1) / chunkRows)).toInt
  def colChunkCount: Int = (cols + chunkCols - 1) / chunkCols
}

object ZarrIO {

  /** Little-endian element widths. Floats are the reference's normalized
    * matrices; ints are what raw scRNA-seq COUNT matrices ship as (10x
    * writes int32) — values surface as exact doubles (i8 beyond 2^53
    * would lose precision; counts never approach it). */
  val BytesPerElem: Map[String, Int] =
    Map("<f4" -> 4, "<f8" -> 8, "<i2" -> 2, "<i4" -> 4, "<i8" -> 8)

  /** Parse `<path>/.zarray` (Jackson ships with Spark). */
  def readMeta(path: String): ZarrMeta = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new File(path, ".zarray"))
    require(node.get("zarr_format").asInt() == 2, "only zarr v2 supported")
    require(node.get("shape").size() == 2, "only 2-D zarr arrays supported")
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
    val fv = node.get("fill_value")
    ZarrMeta(
      rows = node.get("shape").get(0).asLong(),
      cols = node.get("shape").get(1).asInt(),
      chunkRows = node.get("chunks").get(0).asInt(),
      chunkCols = node.get("chunks").get(1).asInt(),
      dtype = node.get("dtype").asText(),
      compressor = compId,
      fillValue = if (fv == null || fv.isNull) 0.0 else fv.asDouble())
  }

  def writeMeta(path: String, meta: ZarrMeta): Unit = {
    val comp = meta.compressor match {
      case Some("zlib") => """{"id":"zlib","level":5}"""
      case _ => "null"
    }
    val json =
      s"""{"zarr_format":2,"shape":[${meta.rows},${meta.cols}],""" +
        s""""chunks":[${meta.chunkRows},${meta.chunkCols}],""" +
        s""""dtype":"${meta.dtype}","compressor":$comp,""" +
        s""""fill_value":${meta.fillValue},"order":"C","filters":null}"""
    Files.createDirectories(Paths.get(path))
    Files.write(Paths.get(path, ".zarray"), json.getBytes("UTF-8"))
  }

  /** Chunk file name for grid cell (i, j) — zarr v2 "."-joined indices. */
  def chunkFile(path: String, i: Long, j: Int): File =
    new File(path, s"$i.$j")

  /** Read + decompress one chunk into doubles (C order, padded to full
    * chunk shape). A MISSING chunk file is legal zarr: it means
    * fill_value everywhere. */
  def readChunk(path: String, meta: ZarrMeta, i: Long, j: Int): Array[Double] = {
    val n = meta.chunkRows * meta.chunkCols
    val f = chunkFile(path, i, j)
    if (!f.exists()) return Array.fill(n)(meta.fillValue)
    val raw = Files.readAllBytes(f.toPath)
    val bytes = meta.compressor match {
      case Some("zlib") => inflate(raw, n * meta.bytesPerElem)
      case _ => raw
    }
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    meta.dtype match {
      case "<f4" =>
        val fb = buf.asFloatBuffer(); var k = 0
        while (k < n) { out(k) = fb.get(k).toDouble; k += 1 }
      case "<f8" =>
        val db = buf.asDoubleBuffer(); var k = 0
        while (k < n) { out(k) = db.get(k); k += 1 }
      case "<i2" =>
        val sb = buf.asShortBuffer(); var k = 0
        while (k < n) { out(k) = sb.get(k).toDouble; k += 1 }
      case "<i4" =>
        val ib = buf.asIntBuffer(); var k = 0
        while (k < n) { out(k) = ib.get(k).toDouble; k += 1 }
      case "<i8" =>
        val lb = buf.asLongBuffer(); var k = 0
        while (k < n) { out(k) = lb.get(k).toDouble; k += 1 }
    }
    out
  }

  /** Compress + write one chunk (values already padded to chunk shape). */
  def writeChunk(path: String, meta: ZarrMeta, i: Long, j: Int,
                 values: Array[Double]): Unit = {
    require(values.length == meta.chunkRows * meta.chunkCols,
      s"chunk ($i,$j): ${values.length} values for " +
        s"${meta.chunkRows}x${meta.chunkCols} chunk")
    val buf = ByteBuffer.allocate(values.length * meta.bytesPerElem)
      .order(ByteOrder.LITTLE_ENDIAN)
    // int dtypes validate loudly: v.toShort/.toInt silently WRAP out-of-
    // range values (a 40000 count in <i2 would round-trip as -25536) and
    // floor fractional input — both are data corruption, not narrowing
    def asIntegral(v: Double, lo: Long, hi: Long): Long = {
      require(v == math.rint(v) && !v.isInfinite,
        s"zarr ${meta.dtype}: non-integral value $v")
      // range-check on the double BEFORE toLong (which saturates silently).
      // Long.MaxValue.toDouble rounds UP to 2^63, a value <i8 cannot hold,
      // so the upper bound must be STRICT there (v.toLong.toDouble == v is
      // not a fix: it also round-trips cleanly at exactly 2^63). The
      // narrower dtypes' bounds are exact in double, so inclusive is right.
      val hiOk = if (hi == Long.MaxValue) v < hi.toDouble else v <= hi.toDouble
      require(v >= lo.toDouble && hiOk,
        s"zarr ${meta.dtype}: $v out of range [$lo, $hi]")
      v.toLong
    }
    meta.dtype match {
      case "<f4" => values.foreach(v => buf.putFloat(v.toFloat))
      case "<f8" => values.foreach(buf.putDouble)
      case "<i2" => values.foreach(v =>
        buf.putShort(asIntegral(v, Short.MinValue, Short.MaxValue).toShort))
      case "<i4" => values.foreach(v =>
        buf.putInt(asIntegral(v, Int.MinValue, Int.MaxValue).toInt))
      case "<i8" => values.foreach(v =>
        buf.putLong(asIntegral(v, Long.MinValue, Long.MaxValue)))
    }
    val bytes = buf.array()
    val out = meta.compressor match {
      case Some("zlib") => deflate(bytes)
      case _ => bytes
    }
    val f = chunkFile(path, i, j)
    val fos = new FileOutputStream(f)
    try fos.write(out) finally fos.close()
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val dos = new DeflaterOutputStream(bos, new Deflater(5))
    dos.write(bytes); dos.close()
    bos.toByteArray
  }

  private def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && inf.needsInput())
        throw new java.io.IOException("truncated zlib chunk")
      off += n
    }
    inf.end()
    require(off == expected, s"zarr chunk: $off bytes, expected $expected")
    out
  }
}
