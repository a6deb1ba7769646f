package graft.sc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** 10x-style ingest ETL — reference R3 (SURVEY.md §2A: 10x HDF5 → engine
  * format conversion scripts [recalled:med]). The container has no HDF5
  * JVM library, so the ingest surface targets the OTHER canonical 10x
  * CellRanger export: MatrixMarket coordinate text (`matrix.mtx`) with
  * `genes.tsv` / `barcodes.tsv` sidecars — a public, line-oriented format
  * Spark parses distributedly with plain text sources.
  *
  * 10x orientation: mtx rows = genes, cols = cells, 1-based. Output is
  * this engine's COO form (id = cell, pos = gene, 0-based — ScSparse's
  * contract), so ingested data flows straight into the sparse ops or
  * `ScSparse.toDense` → dense ops / Zarr sink.
  *
  * Scale: the matrix body parses as a distributed text scan (one split
  * per HDFS block at real sizes); only the 3-number dims header is read
  * driver-side. The single zipWithIndex pass (to drop the header line,
  * which is indistinguishable from a data triplet by content) is the one
  * RDD use — it computes per-partition offsets in a lightweight job, no
  * data movement. */
object MtxIngest {

  case class MtxDims(nGenes: Long, nCells: Long, nnz: Long)

  /** Driver-side peek at the dims header (first non-comment line). */
  def readDims(file: String): MtxDims = {
    val src = scala.io.Source.fromFile(file)
    try {
      val header = src.getLines().find(l => !l.startsWith("%") && l.trim.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(s"$file: no mtx header"))
      val parts = header.trim.split("\\s+")
      MtxDims(parts(0).toLong, parts(1).toLong, parts(2).toLong)
    } finally src.close()
  }

  /** Matrix body → COO (id = cell 0-based, pos = gene 0-based, val).
    * Pattern matrices (no value column) get val = 1.0. */
  def readMatrix(s: SparkSession, file: String): DataFrame = {
    import s.implicits._
    val lines = s.read.textFile(file)
      .filter(l => !l.startsWith("%") && l.trim.nonEmpty)
    val body = lines.rdd.zipWithIndex().filter(_._2 > 0L).keys.toDS()
    body.select(split(trim(col("value")), "\\s+").as("f"))
      .select(
        (element_at(col("f"), 2).cast("long") - 1).as("id"),
        (element_at(col("f"), 1).cast("int") - 1).as("pos"),
        coalesce(try_element_at(col("f"), lit(3)).cast("double"), lit(1.0))
          .as("val"))
  }

  /** Line-indexed TSV sidecar → (pos, <named columns>). Line order IS the
    * index (10x convention: genes.tsv row i describes matrix row i). */
  def readIndexedTsv(s: SparkSession, file: String,
                     names: Seq[String]): DataFrame = {
    import s.implicits._
    val indexed = s.read.textFile(file).rdd.zipWithIndex()
      .map { case (l, i) => (i, l) }.toDF("idx", "line")
    indexed.select(
      col("idx").cast("int").as("pos") +:
        names.zipWithIndex.map { case (n, i) =>
          element_at(split(col("line"), "\t"), i + 1).as(n)
        }: _*)
  }
}

object MtxQueries {
  type Q = (SparkSession, String) => DataFrame

  /** One-time embeddings.parquet → 10x-layout fixture (matrix.mtx +
    * genes.tsv + barcodes.tsv). Values are written via Double.toString —
    * the shortest round-tripping representation — so the ingested doubles
    * are BIT-IDENTICAL to `abs(CAST(embedding AS DOUBLE))` computed by
    * either engine directly from the parquet (no rounding anywhere). */
  def fixture(s: SparkSession, sfDir: String): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_mtx$key")
    val marker = new java.io.File(root, "_DONE")
    if (marker.exists()) return root.toString
    root.mkdirs()
    val rows = Tables.embeddings(s, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), x => abs(x.cast("double"))).as("v"))
      .orderBy("vec_id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val dim = rows.head._2.length
    val entries = for {
      (cell, v) <- rows.iterator
      g <- 0 until dim
      if v(g) != 0.0
    } yield s"${g + 1} ${cell + 1} ${v(g)}"
    val body = entries.toVector
    val mtx = new java.io.PrintWriter(new java.io.File(root, "matrix.mtx"))
    try {
      mtx.println("%%MatrixMarket matrix coordinate real general")
      mtx.println("% generated from embeddings.parquet (counts view)")
      mtx.println(s"$dim ${rows.length} ${body.size}")
      body.foreach(mtx.println)
    } finally mtx.close()
    val genes = new java.io.PrintWriter(new java.io.File(root, "genes.tsv"))
    try (0 until dim).foreach { g =>
      genes.println(f"ENSG$g%08d\tg$g%03d")
    } finally genes.close()
    val bc = new java.io.PrintWriter(new java.io.File(root, "barcodes.tsv"))
    try rows.foreach { case (cell, _) => bc.println(s"CELL-$cell") }
    finally bc.close()
    new java.io.FileOutputStream(marker).close()
    root.toString
  }

  /** Ingest the 10x fixture and summarize per gene, with gene names READ
    * from genes.tsv (the sidecar join is the point — obs/var arrive as
    * ordinary tables). The oracle computes identical per-gene stats from
    * the parquet twin; checksum folds are cell-ordered on both sides. */
  def mtxIngest(s: SparkSession, d: String): DataFrame = {
    val dir = fixture(s, d)
    val coo = MtxIngest.readMatrix(s, s"$dir/matrix.mtx")
    val genes = MtxIngest.readIndexedTsv(s, s"$dir/genes.tsv",
      Seq("gene_id", "gene_name"))
    coo.groupBy("pos")
      .agg(count(lit(1)).as("n_cells"),
        sort_array(collect_list(struct(col("id"), col("val")))).as("iv"))
      .join(broadcast(genes), Seq("pos"))
      .select((col("pos") + 1).cast("int").as("pos1"), col("gene_name"),
        col("n_cells"),
        round(aggregate(col("iv"), lit(0.0),
          (a, e) => a + e.getField("val")), 4).as("checksum"))
      .orderBy("pos1")
  }

  val queries: Map[String, Q] = Map("q_mtx_ingest" -> mtxIngest _)

  val oracle: Map[String, String] = Map(
    "q_mtx_ingest" ->
      """WITH c AS (SELECT vec_id,
                           list_transform(embedding,
                             x -> abs(CAST(x AS DOUBLE))) AS v
                    FROM embeddings),
         x AS (SELECT vec_id, unnest(v) AS val,
                      generate_subscripts(v, 1) AS pos FROM c),
         nz AS (SELECT * FROM x WHERE val <> 0),
         g AS (SELECT pos, CAST(count(1) AS BIGINT) AS n_cells,
                      round(list_sum(list(val ORDER BY vec_id)), 4)
                        AS checksum
               FROM nz GROUP BY pos)
         SELECT CAST(pos AS INT) AS pos1,
                'g' || lpad(CAST(pos - 1 AS VARCHAR), 3, '0') AS gene_name,
                n_cells, checksum
         FROM g ORDER BY pos1""",
  )
}
