package graft.zarr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 read path for 2-D Zarr v2 arrays — the reference's
  * storage layer re-expressed Spark-first (SURVEY.md §7.4; reference
  * `zarr_spark.py::get_chunk_indices/read_zarr_chunk` [recalled:high]:
  * 1 chunk = 1 RDD partition; here 1 ROW-chunk band = 1 InputPartition
  * and the reader assembles full rows across that band's column chunks).
  *
  * Surface: `spark.read.format("zarr").load(dir)` →
  * `(row_id BIGINT, vec ARRAY<FLOAT|DOUBLE>)` (element type from the
  * array's dtype).
  *
  * Scale design:
  *  - the chunk grid IS the partitioning: no listing job, no sampling —
  *    `rowChunkCount` partitions, each reading its band's column chunks
  *    sequentially (zarr chunks are the unit of I/O+decompression exactly
  *    like parquet row groups);
  *  - CHUNK PRUNING: row_id range predicates (=, <, <=, >, >=) are pushed
  *    down, clamp the band range, and non-intersecting bands are never
  *    planned — the DSv2 twin of parquet min/max row-group skipping;
  *  - COLUMN PRUNING: a row_id-only projection (counts, id joins) never
  *    reads or decompresses chunk bytes at all.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"
  // true so the WRITE path works against a store that doesn't exist yet:
  // Spark then hands the DataFrame's schema to getTable instead of
  // requiring inferSchema (which needs a committed .zarray) to succeed
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "zarr source requires a path: .load(<dir>)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrTable.schemaFor(ZarrIO.readMeta(
      ZarrVersioned.resolveAt(pathOf(options),
        Option(options.get("version")), ZarrIO.hadoopConf())))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new ZarrTable(pathOf(opts), Option(schema), Option(opts.get("version")))
  }
}

object ZarrTable {
  def elementType(meta: ZarrMeta): DataType =
    if (meta.dtype == "<f4") FloatType else DoubleType
  def schemaFor(meta: ZarrMeta): StructType = StructType(Seq(
    StructField("row_id", LongType, nullable = false),
    StructField("vec", ArrayType(elementType(meta), containsNull = false),
      nullable = false)))
}

class ZarrTable(path: String, providedSchema: Option[StructType] = None,
                pinnedVersion: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {
  // Versioned stores (ZarrVersioned, the default write commit protocol)
  // resolve their `current` pointer ONCE here, at table-resolution time:
  // every chunk read of this scan then targets that immutable version
  // dir, so a commit landing mid-query cannot mix versions (snapshot
  // isolation, modulo GC of the superseded version). Flat stores
  // resolve to themselves. A TIME-TRAVEL pin (`option("version", …)`)
  // overrides the pointer — retained versions are immutable snapshots.
  // The WRITE path keeps the store ROOT — the writer manages versions
  // itself.
  private lazy val readPath =
    ZarrVersioned.resolveAt(path, pinnedVersion, ZarrIO.hadoopConf())
  private lazy val meta = ZarrIO.readMeta(readPath)
  override def name(): String = s"zarr:`$path`"
  // The committed .zarray is authoritative when it exists: a
  // user-specified schema that disagrees is REJECTED loudly — with
  // supportsExternalMetadata=true Spark would otherwise report the
  // user's types while the scan produces the store's (e.g. FLOAT rows
  // read as DOUBLE → garbage/ClassCastException at codegen, the silent
  // failure the old supportsExternalMetadata=false guard prevented).
  // Only a not-yet-existing store (the write-to-new path, where
  // inferSchema cannot run) takes the provided schema on faith.
  override def schema(): StructType = {
    // ONLY an absent store falls back to the user schema (the
    // write-to-new path). A .zarray that exists but fails to parse
    // must propagate: swallowing it made corruption indistinguishable
    // from absence, and a subsequent overwrite would clobber a store
    // whose metadata merely failed to parse (round-7 advisory).
    val stored = try Some(ZarrTable.schemaFor(meta))
                 catch { case _: java.io.FileNotFoundException => None }
    (stored, providedSchema) match {
      case (Some(st), Some(user)) =>
        // nullability is presentation, not physics, here (a write
        // schema arrives with whatever nullability the DF carried) —
        // compare names + types with nullability erased
        def norm(dt: DataType): DataType = dt match {
          case s: StructType => StructType(s.fields.map(f =>
            StructField(f.name, norm(f.dataType), nullable = true)))
          case ArrayType(e, _) => ArrayType(norm(e), containsNull = true)
          case other => other
        }
        require(norm(user) == norm(st),
          s"zarr:`$path` has schema ${st.simpleString}; the specified " +
            s"schema ${user.simpleString} does not match — drop .schema() " +
            "or make it identical")
        st
      case (Some(st), None) => st
      case (None, Some(user)) => user
      case (None, None) => ZarrTable.schemaFor(meta) // surface readMeta error
    }
  }
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(readPath, meta)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"zarr:`$path`: cannot WRITE through a time-travel pin " +
        s"(version=${pinnedVersion.get}) — versions are immutable; " +
        "write to the store root and let the commit protocol version it")
    new ZarrWriteBuilder(path, info)
  }
}

/** row_id range bounds a filter implies, if the source can apply it
  * exactly. Shared by compile-time pushdown (ZarrScanBuilder — bounds
  * are applied per-row in the reader, so accepted filters are FULLY
  * handled there) and RUNTIME filtering (ZarrScan.filter — where a
  * range envelope is merely sound, which is all a runtime filter
  * needs: the join re-checks keys). */
object ZarrFilterBounds {
  def boundsOf(f: Filter): Option[(Long, Long)] = f match {
    case EqualTo("row_id", v: Number) =>
      Some((v.longValue(), v.longValue()))
    case GreaterThan("row_id", v: Number) =>
      Some((v.longValue() + 1, Long.MaxValue))
    case GreaterThanOrEqual("row_id", v: Number) =>
      Some((v.longValue(), Long.MaxValue))
    case LessThan("row_id", v: Number) =>
      Some((Long.MinValue, v.longValue() - 1))
    case LessThanOrEqual("row_id", v: Number) =>
      Some((Long.MinValue, v.longValue()))
    case IsNotNull("row_id") => Some((Long.MinValue, Long.MaxValue))
    // the runtime-filter shape: the [min, max] ENVELOPE of the build
    // side's key set — sound for pruning (supersets never drop matches)
    case In("row_id", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Number]) =>
      val ls = vs.map(_.asInstanceOf[Number].longValue())
      Some((ls.min, ls.max))
    case _ => None
  }
}

class ZarrScanBuilder(path: String, meta: ZarrMeta)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var required: StructType = ZarrTable.schemaFor(meta)
  private var lo: Long = 0L
  private var hi: Long = meta.rows - 1
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[aggregate.Aggregation] = None

  private def boundsOf(f: Filter): Option[(Long, Long)] =
    ZarrFilterBounds.boundsOf(f)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(boundsOf(_).isDefined)
    sup.foreach { f =>
      val (l, h) = boundsOf(f).get
      lo = math.max(lo, l); hi = math.min(hi, h)
    }
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(s: StructType): Unit = required = s

  /** AGGREGATE PUSHDOWN (metadata-only): zarr stores are dense by
    * construction (the write path enforces row_id = 0..n-1), so a
    * global COUNT / MIN(row_id) / MAX(row_id) — composed with any
    * pushed row_id range — is fully determined by `.zarray` shape
    * arithmetic. At 100 TB that turns `SELECT count(*) FROM store` from
    * a full chunk scan into one small-object metadata read: the scan
    * plans a single no-I/O partition that emits the answer row.
    * Complete pushdown only (no partial rows, no grouping): Spark only
    * offers the aggregate when every filter was fully absorbed by
    * pushFilters, which for this source means exact row_id bounds. */
  private def isRowId(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference =>
        nr.fieldNames.sameElements(Array("row_id"))
      case _ => false
    }

  private def metaAnswerable(agg: aggregate.Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: aggregate.CountStar => true
        // row_id is non-null, so count(row_id) == count(*); a DISTINCT
        // count would also equal it (ids are unique) but is declined to
        // keep the claim on the structural invariant only
        case c: aggregate.Count => !c.isDistinct && isRowId(c.column)
        case m: aggregate.Min => isRowId(m.column)
        case m: aggregate.Max => isRowId(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    metaAnswerable(agg)

  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    if (metaAnswerable(agg)) { pushedAgg = Some(agg); true } else false

  override def build(): Scan = pushedAgg match {
    case Some(agg) => new ZarrAggScan(path, meta, lo, hi, agg)
    case None => new ZarrScan(path, meta, required, lo, hi)
  }
}

/** The metadata-answered aggregate scan: one driver-computed row, one
  * no-I/O partition, zero chunk reads (the spec proves it by deleting
  * every chunk object and re-running). */
class ZarrAggScan(path: String, meta: ZarrMeta, lo: Long, hi: Long,
                  agg: aggregate.Aggregation) extends Scan with Batch {
  private val first = math.max(lo, 0L)
  private val last = math.min(hi, meta.rows - 1)
  private val n = math.max(0L, last - first + 1)

  private def describeFunc(f: aggregate.AggregateFunc): String = f match {
    case _: aggregate.CountStar => "COUNT(*)"
    case _: aggregate.Count => "COUNT(row_id)"
    case _: aggregate.Min => "MIN(row_id)"
    case _: aggregate.Max => "MAX(row_id)"
    case other => other.toString
  }

  // values are POSITIONAL against the pushed aggregate list — Spark
  // rewires the query's aggregate expressions to these columns by
  // position (names are informational)
  private val values: Array[Any] = agg.aggregateExpressions.map {
    case _: aggregate.CountStar => n: Any
    case _: aggregate.Count => n: Any
    case _: aggregate.Min => if (n > 0) (first: Any) else null
    case _: aggregate.Max => if (n > 0) (last: Any) else null
    case other => throw new IllegalStateException(
      s"unpushable aggregate survived the pushdown check: $other")
  }

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i", LongType, nullable = f match {
        case _: aggregate.Min | _: aggregate.Max => true
        case _ => false
      })
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"ZarrScan path=$path rows=[$lo,$hi] PushedAggregates=[" +
      agg.aggregateExpressions.map(describeFunc).mkString(", ") + "]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ZarrAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrAggReaderFactory
}

case class ZarrAggPartition(values: Array[Any]) extends InputPartition

class ZarrAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val values = p.asInstanceOf[ZarrAggPartition].values
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

class ZarrScan(path: String, meta: ZarrMeta, required: StructType,
               lo: Long, hi: Long) extends Scan with Batch
    with SupportsReportStatistics with SupportsRuntimeFiltering {
  // RUNTIME-narrowed bounds (dynamic chunk pruning): row_id is this
  // source's partition axis — the chunk grid is the partition layout —
  // so it is declared as a runtime-filterable attribute and a
  // DPP-style subquery on the join build side narrows [rlo, rhi]
  // BEFORE planInputPartitions, dropping whole chunk bands at runtime
  // exactly like dynamic partition pruning drops Hive partitions. The
  // [min,max] envelope of an IN-set is sound (the join still checks
  // keys); compile-time bounds stay per-row exact in the reader.
  @volatile private var rlo: Long = lo
  @volatile private var rhi: Long = hi
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("row_id"))
  override def filter(filters: Array[Filter]): Unit =
    filters.foreach { f =>
      ZarrFilterBounds.boundsOf(f).foreach { case (l, h) =>
        rlo = math.max(rlo, l); rhi = math.min(rhi, h)
      }
    }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ZarrScan path=$path rows=[$lo,$hi] cols=${required.fieldNames.mkString(",")}"

  /** Exact statistics from the chunk grid — rows from the (clamped)
    * pushed range, bytes from the PROJECTED width — so Catalyst's join
    * planning sees a pruned zarr scan at its true size and can choose a
    * broadcast join on its own: a filtered slice of a 100 TB store that
    * fits the broadcast threshold broadcasts without a user hint.
    * Parquet gets this from footers; the dense grid makes it exact here. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L,
      math.min(hi, meta.rows - 1) - math.max(lo, 0L) + 1)
    private val elem = if (meta.dtype == "<f4") 4L else 8L
    private val rowBytes = required.fieldNames.map {
      case "row_id" => 8L
      case "vec" => meta.cols * elem
      case _ => 8L
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(1L, n * rowBytes))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (rlo > rhi || meta.rows == 0) return Array.empty
    // capture the DRIVER's Hadoop conf at planning time — executor-side
    // chunk reads need its credentials / FS impl settings, not defaults
    val conf = new SerializableHadoopConf(ZarrIO.hadoopConf())
    val first = math.max(rlo, 0L) / meta.chunkRows
    val last = math.min(rhi, meta.rows - 1) / meta.chunkRows
    (first to last).map(i => ZarrInputPartition(path, meta, i, rlo, rhi, conf)
      : InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(required)
}

/** One row-chunk band. Carries everything the executor needs — including
  * the driver's serialized Hadoop conf for object-store chunk I/O. */
case class ZarrInputPartition(path: String, meta: ZarrMeta, rowChunk: Long,
                              lo: Long, hi: Long,
                              conf: SerializableHadoopConf)
  extends InputPartition

class ZarrReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ZarrPartitionReader(p.asInstanceOf[ZarrInputPartition], required)
}

class ZarrPartitionReader(p: ZarrInputPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val meta = p.meta
  private val needVec = required.fieldNames.contains("vec")
  private val floatElems = ZarrTable.elementType(meta) == FloatType
  private val bandStart = p.rowChunk * meta.chunkRows
  // clamp the band to the array AND the pushed row_id bounds
  private var row = math.max(bandStart, p.lo)
  private val rowEnd =
    math.min(math.min(bandStart + meta.chunkRows, meta.rows), p.hi + 1)
  // column chunks of this band, loaded lazily only when vec is projected
  private lazy val colChunks: Array[Array[Double]] =
    (0 until meta.colChunkCount)
      .map(j => ZarrIO.readChunk(p.path, meta, p.rowChunk, j, p.conf.value))
      .toArray
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (row >= rowEnd) return false
    val values = new Array[Any](required.length)
    var f = 0
    while (f < required.length) {
      values(f) = required.fields(f).name match {
        case "row_id" => row
        case "vec" => vecFor((row - bandStart).toInt)
        case other => throw new IllegalStateException(s"unknown column $other")
      }
      f += 1
    }
    current = new GenericInternalRow(values)
    row += 1
    true
  }

  private def vecFor(r: Int): GenericArrayData = {
    if (!needVec) return null
    if (floatElems) {
      val out = new Array[Float](meta.cols)
      assemble(r, (k, v) => out(k) = v.toFloat)
      new GenericArrayData(out)
    } else {
      val out = new Array[Double](meta.cols)
      assemble(r, (k, v) => out(k) = v)
      new GenericArrayData(out)
    }
  }

  /** Stitch row r of the band across its column chunks (each chunk is
    * C-order chunkRows×chunkCols, edge chunks padded). */
  private def assemble(r: Int, put: (Int, Double) => Unit): Unit = {
    var j = 0
    while (j < meta.colChunkCount) {
      val chunk = colChunks(j)
      val colStart = j * meta.chunkCols
      val width = math.min(meta.chunkCols, meta.cols - colStart)
      var c = 0
      while (c < width) {
        put(colStart + c, chunk(r * meta.chunkCols + c))
        c += 1
      }
      j += 1
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
