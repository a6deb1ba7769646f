package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.hdf5.{H5Writer, Hdf5Scan}
import graft.tables.Tables

/** 10x-style HDF5 ingest — the OTHER half of reference R3 (SURVEY.md §2A:
  * 10x `.h5` → engine format [recalled:med]; MtxIngest covers the
  * MatrixMarket export). The container has no JVM HDF5 library, so the
  * format core is the vendored public-spec subset in
  * graft.sources.hdf5 — the same "libhdf5 classic" file class CellRanger
  * writes (v0 superblock, v1 object headers, old-style groups, chunked +
  * deflate datasets).
  *
  * Fixture: embeddings.parquet → CSC matrix in /matrix (data f64
  * chunked+deflate, indices i64 chunked+deflate, indptr i64 contiguous,
  * shape i64, barcodes fixed-str) — the 10x CSC layout with exactly
  * bit-preserved doubles, so the DuckDB oracle computes identical values
  * straight from the parquet (the MtxIngest contract).
  *
  * Scale shape: data/indices decode as one Spark task per chunk
  * (Hdf5Scan); the element-index equi-join re-pairs them (ONE shuffle);
  * cell assignment is a broadcast range join against the indptr column
  * boundaries (bounded: n_cells+1 longs — at larger scales indptr is
  * itself chunk-range-scanned and the range join becomes a keyed join on
  * chunk id); the per-cell aggregation is the usual keyed shuffle with a
  * cell-ordered checksum fold for cross-engine float parity. */
object H5Ingest {
  type Q = (SparkSession, String) => DataFrame

  val BarcodeWidth = 20

  /** One-time embeddings.parquet → matrix.h5 (CSC, 10x layout). Routed
    * through Fixtures.cached for the marker + cross-process FileLock
    * (two unlocked concurrent builders would interleave into one file —
    * the hazard the h5ad fixtures were also cured of in r8). */
  def fixture(s: SparkSession, sfDir: String): String =
    graft.tables.Fixtures.cached("h5", "matrix.h5", sfDir) { file =>
      buildFixture(s, sfDir, file.toString)
    }()

  private def buildFixture(s: SparkSession, sfDir: String,
                           path: String): Unit = {
    val rows = Tables.embeddings(s, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => abs(x.cast("double"))).as("v"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val dim = rows.head._2.length
    val data = Vector.newBuilder[Double]
    val indices = Vector.newBuilder[Long]
    val indptr = Vector.newBuilder[Long]
    var nnz = 0L
    indptr += 0L
    rows.foreach { case (_, v) =>
      var g = 0
      while (g < dim) {
        if (v(g) != 0.0) { data += v(g); indices += g.toLong; nnz += 1 }
        g += 1
      }
      indptr += nnz
    }
    val w = new H5Writer
    val dsData = w.addF64(data.result().toArray, chunkElems = 4096, deflate = true)
    val dsIdx = w.addI64(indices.result().toArray, chunkElems = 4096, deflate = true)
    val dsPtr = w.addI64(indptr.result().toArray)
    val dsShape = w.addI64(Array(dim.toLong, rows.length.toLong))
    val dsBc = w.addFixedStr(rows.map(r => s"CELL-${r._1}"), BarcodeWidth)
    val grp = w.addGroup(Seq(
      "data" -> dsData, "indices" -> dsIdx, "indptr" -> dsPtr,
      "shape" -> dsShape, "barcodes" -> dsBc))
    w.writeTo(path, Seq("matrix" -> grp))
  }

  /** Ingest the h5 fixture and summarize per cell, with the barcode read
    * from the string dataset — exercises every dataset in the file
    * (data, indices, indptr, shape, barcodes) plus group traversal,
    * chunk B-trees, and the deflate filter. */
  def h5Ingest(s: SparkSession, d: String): DataFrame = {
    val file = fixture(s, d)
    val indptr = Hdf5Scan.readLongs(file, "/matrix/indptr")
    val shape = Hdf5Scan.readLongs(file, "/matrix/shape")
    require(shape.length == 2 && shape(1).toInt == indptr.length - 1,
      s"shape ${shape.toSeq} inconsistent with indptr ${indptr.length}")
    val data = Hdf5Scan.scanDoubles(s, file, "/matrix/data")
    val idxs = Hdf5Scan.scanLongs(s, file, "/matrix/indices")
      .withColumnRenamed("val", "gene")
    val barcodes = Hdf5Scan.scanStrings(s, file, "/matrix/barcodes")
      .select(col("idx").as("cell"), col("val").as("barcode"))
    // cell assignment via the grid-cell EQUI-join (Hdf5Scan.joinSpans):
    // the former broadcast range join was a BroadcastNestedLoopJoin
    // evaluating O(nnz · n_cells) predicates
    Hdf5Scan.joinSpans(data.join(idxs, "idx"), indptr, "cell")
      .groupBy("cell")
      .agg(count(lit(1)).as("n_genes"),
        sort_array(collect_list(struct(col("gene"), col("val")))).as("gv"))
      .join(broadcast(barcodes), Seq("cell"))
      .select(col("barcode"), col("n_genes"),
        // gene-ascending fold = the oracle's ORDER BY pos — bit-identical
        // doubles in, identical rounded checksum out (MtxIngest contract)
        round(aggregate(col("gv"), lit(0.0),
          (a, e) => a + e.getField("val")), 4).as("checksum"))
      .orderBy("barcode")
  }

  val queries: Map[String, Q] = Map("q_h5_ingest" -> h5Ingest _)

  val oracle: Map[String, String] = Map(
    "q_h5_ingest" ->
      """WITH c AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT vec_id, unnest(v) AS val,
                      generate_subscripts(v, 1) AS pos FROM c),
         nz AS (SELECT * FROM x WHERE val <> 0)
         SELECT 'CELL-' || CAST(vec_id AS VARCHAR) AS barcode,
                CAST(count(1) AS BIGINT) AS n_genes,
                round(list_sum(list(val ORDER BY pos)), 4) AS checksum
         FROM nz GROUP BY vec_id ORDER BY barcode""",
  )
}
