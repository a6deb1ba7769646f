package graft.sources.hdf5

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed HDF5 dataset scans: driver parses metadata (KBs), then one
  * Spark task per chunk/range decodes bytes executor-side — the Zarr
  * source pattern. Rows are (idx, value) with idx = global element index,
  * so downstream CSC/COO assembly is ordinary relational algebra.
  *
  * Contiguous (non-deflated) pieces are SPLIT at element boundaries into
  * ~4 MiB ranges first: a 100 GB contiguous dataset becomes ~25k
  * parallel range reads, not one task. Deflated chunks decode whole (the
  * deflate stream is per-chunk); their parallelism is the chunk count —
  * which is the format's own scale knob. */
object Hdf5Scan {
  import Hdf5._

  private val SplitBytes = 4L << 20

  private[hdf5] def splitPieces(pieces: Seq[Piece], elemSize: Int): Seq[Piece] =
    pieces.flatMap { p =>
      if (p.deflated || p.storedSize <= SplitBytes) Seq(p)
      else {
        val per = math.max(1L, SplitBytes / elemSize)
        (0L until p.nElems by per).map { e =>
          val n = math.min(per, p.nElems - e)
          Piece(p.fileOffset + e * elemSize, n * elemSize, p.elemOffset + e,
            n, deflated = false)
        }
      }
    }

  private def meta(file: String, dsPath: String): DatasetMeta =
    H5Meta.open(file).getOrElse(dsPath,
      throw new IllegalArgumentException(s"$file: no dataset $dsPath"))

  /** The linear (idx, val) entry points assume globally contiguous
    * row-major elements; a 2-D CHUNKED dataset's tiles are NOT (their
    * elemOffset is a corner, their nElems padded) — sending one through
    * scanDoubles would scramble indices silently. Loud gate instead. */
  private def metaLinear(file: String, dsPath: String): DatasetMeta = {
    val m = meta(file, dsPath)
    require(m.pieces.forall(_.tile.isEmpty),
      s"$dsPath is 2-D chunked — use scanMatrix, not a linear scan/read")
    m
  }

  private def scan(s: SparkSession, file: String, m: DatasetMeta,
                   valType: org.apache.spark.sql.types.DataType,
                   decode: (ByteBuffer, Int) => Any): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val elemSize = m.dtype.size
    val pieces = splitPieces(m.pieces, elemSize)
    val slices = math.max(1, math.min(pieces.size, 32))
    val rdd = s.sparkContext.parallelize(pieces, slices)
      .flatMap { p =>
        val bb = ByteBuffer.wrap(H5Meta.decodePiece(file, p, elemSize))
          .order(ByteOrder.LITTLE_ENDIAN)
        (0L until p.nElems).iterator
          .map(i => Row(p.elemOffset + i, decode(bb, (i * elemSize).toInt)))
      }
    s.createDataFrame(rdd, StructType(Seq(
      StructField("idx", LongType, nullable = false),
      StructField("val", valType, nullable = false))))
  }

  /** (idx, val double) from an F32/F64 dataset. */
  def scanDoubles(s: SparkSession, file: String, dsPath: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val m = metaLinear(file, dsPath)
    m.dtype match {
      case F64 => scan(s, file, m, DoubleType, (bb, o) => bb.getDouble(o))
      case F32 => scan(s, file, m, DoubleType, (bb, o) => bb.getFloat(o).toDouble)
      case t => throw new IllegalArgumentException(s"$dsPath: $t is not float")
    }
  }

  /** (idx, val long) from an I8/I16/I32/I64 dataset. */
  def scanLongs(s: SparkSession, file: String, dsPath: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val m = metaLinear(file, dsPath)
    m.dtype match {
      case I64 => scan(s, file, m, LongType, (bb, o) => bb.getLong(o))
      case I32 => scan(s, file, m, LongType, (bb, o) => bb.getInt(o).toLong)
      case I16 => scan(s, file, m, LongType, (bb, o) => bb.getShort(o).toLong)
      case I8  => scan(s, file, m, LongType, (bb, o) => bb.get(o).toLong)
      case t => throw new IllegalArgumentException(s"$dsPath: $t is not int")
    }
  }

  /** (idx, val string) from a VARIABLE-length string dataset (the
    * h5py/AnnData layout): pieces decode to 16-byte descriptors, the
    * strings resolve against global-heap collections — each task caches
    * the collections it touches, so a piece costs one GCOL read per
    * distinct collection, not per row. */
  def scanVlenStrings(s: SparkSession, file: String, dsPath: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val m = metaLinear(file, dsPath)
    require(m.dtype == VlenStr,
      s"$dsPath: ${m.dtype} is not a vlen string")
    val pieces = splitPieces(m.pieces, VlenStr.size)
    val slices = math.max(1, math.min(pieces.size, 32))
    val rdd = s.sparkContext.parallelize(pieces, slices)
      .mapPartitions { ps =>
        val raf = new java.io.RandomAccessFile(file, "r")
        val gcolCache = collection.mutable.Map[Long, Map[Int, Array[Byte]]]()
        val rows = ps.flatMap { p =>
          val bb = java.nio.ByteBuffer
            .wrap(H5Meta.decodePiece(file, p, VlenStr.size))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0L until p.nElems).iterator.map { i =>
            Row(p.elemOffset + i,
              H5Meta.resolveVlen(raf, gcolCache, bb, (i * 16).toInt, dsPath))
          }
        }
        // RAF must outlive the iterator; TaskContext closes it at task end
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => raf.close()))
        rows
      }
    s.createDataFrame(rdd, StructType(Seq(
      StructField("idx", LongType, nullable = false),
      StructField("val", StringType, nullable = false))))
  }

  /** Driver-side full read of a SMALL vlen-string dataset (categorical
    * categories, var_names — the bounded-stats class). */
  def readVlenStrings(file: String, dsPath: String): Array[String] = {
    val m = metaLinear(file, dsPath)
    require(m.nElems <= (1L << 20),
      s"$dsPath has ${m.nElems} elems — use scanVlenStrings, not a driver read")
    require(m.dtype == VlenStr, s"$dsPath: ${m.dtype} is not a vlen string")
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      val gcolCache = collection.mutable.Map[Long, Map[Int, Array[Byte]]]()
      val out = new Array[String](m.nElems.toInt)
      m.pieces.foreach { p =>
        val bb = ByteBuffer.wrap(H5Meta.decodePiece(file, p, VlenStr.size))
          .order(ByteOrder.LITTLE_ENDIAN)
        (0 until p.nElems.toInt).foreach { i =>
          out(p.elemOffset.toInt + i) =
            H5Meta.resolveVlen(raf, gcolCache, bb, i * 16, dsPath)
        }
      }
      out
    } finally raf.close()
  }

  /** Driver-side full read for SMALL float datasets (per-gene scores —
    * the bounded-stats class). */
  def readDoubles(file: String, dsPath: String): Array[Double] = {
    val m = metaLinear(file, dsPath)
    require(m.nElems <= (1L << 22),
      s"$dsPath has ${m.nElems} elems — use scanDoubles, not a driver read")
    val out = new Array[Double](m.nElems.toInt)
    val elemSize = m.dtype.size
    m.pieces.foreach { p =>
      val bb = ByteBuffer.wrap(H5Meta.decodePiece(file, p, elemSize))
        .order(ByteOrder.LITTLE_ENDIAN)
      (0 until p.nElems.toInt).foreach { i =>
        out(p.elemOffset.toInt + i) = m.dtype match {
          case F64 => bb.getDouble(i * 8)
          case F32 => bb.getFloat(i * 4).toDouble
          case t => sys.error(s"$dsPath: $t is not float")
        }
      }
    }
    out
  }

  /** (idx, val string) from a fixed-length string dataset (null-padded,
    * the 10x barcodes convention). */
  def scanStrings(s: SparkSession, file: String, dsPath: String): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val m = metaLinear(file, dsPath)
    val width = m.dtype match {
      case FixedStr(w) => w
      case t => throw new IllegalArgumentException(s"$dsPath: $t is not string")
    }
    scan(s, file, m, StringType, { (bb, o) =>
      val a = bb.array()
      var end = o
      while (end < o + width && a(end) != 0) end += 1
      new String(a, o, end - o, "UTF-8")
    })
  }

  /** (row, col, val double) from a 2-D dataset — contiguous or 2-D
    * CHUNKED (the h5py dense-matrix default). One Spark task batch per
    * tile; stored tiles are full-size, so edge padding is clipped
    * against the dataspace dims here. Elements of a tile are NOT
    * globally contiguous — (row, col) come from the tile geometry. */
  def scanMatrix(s: SparkSession, file: String, dsPath: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val m = meta(file, dsPath)
    require(m.dims.length == 2, s"$dsPath: rank ${m.dims.length}, need 2")
    val elemSize = m.dtype.size
    val nRows = m.dims.head
    val nCols = m.dims(1)
    val dtype = m.dtype
    def get(bb: ByteBuffer, o: Int): Double = dtype match {
      case F64 => bb.getDouble(o)
      case F32 => bb.getFloat(o).toDouble
      case I64 => bb.getLong(o).toDouble
      case I32 => bb.getInt(o).toDouble
      case I16 => bb.getShort(o).toDouble
      case I8  => bb.get(o).toDouble
      case t => sys.error(s"$dsPath: $t is not numeric")
    }
    // contiguous pieces (no tile) still split linearly; tiles decode whole
    val pieces = splitPieces(m.pieces.filter(_.tile.isEmpty), elemSize) ++
      m.pieces.filter(_.tile.isDefined)
    val slices = math.max(1, math.min(pieces.size, 32))
    val rdd = s.sparkContext.parallelize(pieces, slices).flatMap { p =>
      val bb = ByteBuffer.wrap(H5Meta.decodePiece(file, p, elemSize))
        .order(ByteOrder.LITTLE_ENDIAN)
      p.tile match {
        case Some(t) =>
          for {
            r <- (0 until t.rows).iterator
            c <- (0 until t.cols).iterator
            if t.rowOff + r < nRows && t.colOff + c < nCols
          } yield Row(t.rowOff + r, (t.colOff + c).toLong,
            get(bb, (r * t.cols + c) * elemSize))
        case None =>
          (0L until p.nElems).iterator.map { i =>
            val g = p.elemOffset + i
            Row(g / nCols, g % nCols, get(bb, (i * elemSize).toInt))
          }
      }
    }
    s.createDataFrame(rdd, StructType(Seq(
      StructField("row", LongType, nullable = false),
      StructField("col", LongType, nullable = false),
      StructField("val", DoubleType, nullable = false))))
  }

  /** Driver-side full read for SMALL datasets (indptr, shape — the
    * bounded-stats class; do NOT use on data/indices). */
  def readLongs(file: String, dsPath: String): Array[Long] = {
    val m = metaLinear(file, dsPath)
    require(m.nElems <= (1L << 22),
      s"$dsPath has ${m.nElems} elems — use scanLongs, not a driver read")
    val out = new Array[Long](m.nElems.toInt)
    val elemSize = m.dtype.size
    m.pieces.foreach { p =>
      val bb = ByteBuffer.wrap(H5Meta.decodePiece(file, p, elemSize))
        .order(ByteOrder.LITTLE_ENDIAN)
      (0 until p.nElems.toInt).foreach { i =>
        out(p.elemOffset.toInt + i) = m.dtype match {
          case I8  => bb.get(i).toLong
          case I16 => bb.getShort(i * 2).toLong
          case I32 => bb.getInt(i * 4).toLong
          case I64 => bb.getLong(i * 8)
          case t => sys.error(s"$dsPath: $t is not int")
        }
      }
    }
    out
  }

  /** Attach the owning SPAN id to each scanned element: span m owns
    * element indices [indptr(m), indptr(m+1)) — the CSR/CSC row-
    * assignment step of every compressed ingest. `elems` must carry the
    * element index as `idx`; the result is `elems` + `spanCol`.
    *
    * Shape: grid-cell EQUI-join (the q_join_interval /
    * AnnData.readCompressed pattern), not a broadcast range join — the
    * range form is a BroadcastNestedLoopJoin that compares every
    * element against every span: O(nnz · n_spans) predicate
    * evaluations, a scale-killer (quadratic in the matrix size for
    * square-ish matrices). Here each span explodes into the fixed-width
    * grid cells it overlaps; grid width = MEAN span length (derived
    * from the driver-known indptr, so the sizing is input-adaptive, not
    * a constant), which bounds the expected join fanout per element at
    * ~2 rows regardless of scale. The broadcast side is the exploded
    * span/grid frame: n_spans + nnz/gw ≈ 2·n_spans rows of four longs —
    * the same bounded driver artifact indptr itself already is. */
  def joinSpans(elems: DataFrame, indptr: Array[Long],
                spanCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val s = elems.sparkSession
    val n = indptr.length - 1
    val nnz = if (indptr.nonEmpty) indptr.last else 0L
    val gw = math.max(1L, nnz / math.max(1, n))
    val spans = s.createDataFrame(
      (0 until n).map(j => (j.toLong, indptr(j), indptr(j + 1))))
      .toDF(spanCol, "lo", "hi")
      .filter(col("hi") > col("lo")) // empty spans own no element (and
                                     // would make the grid sequence run
                                     // backwards)
    val grid = spans.select(col(spanCol), col("lo"), col("hi"),
      explode(sequence(expr(s"lo div $gw"), expr(s"(hi - 1) div $gw")))
        .as("_gc"))
    elems.withColumn("_gc", expr(s"idx div $gw"))
      .join(broadcast(grid), "_gc")
      .filter(col("idx") >= col("lo") && col("idx") < col("hi"))
      .drop("_gc", "lo", "hi")
  }
}
