package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MtxIngestSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(lines: Seq[String], name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("mtx").toFile
    val f = new java.io.File(dir, name)
    val pw = new java.io.PrintWriter(f)
    try lines.foreach(pw.println) finally pw.close()
    f.toString
  }

  test("mtx body parses: 1-based gene×cell triplets -> 0-based COO") {
    val f = writeFixture(Seq(
      "%%MatrixMarket matrix coordinate real general",
      "% a comment that must be skipped",
      "3 2 4",
      "1 1 5.5",
      "3 1 2.0",
      "2 2 7.25",
      "3 2 1.0"), "m.mtx")
    assert(MtxIngest.readDims(f) == MtxIngest.MtxDims(3, 2, 4))
    val coo = MtxIngest.readMatrix(spark, f)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(coo == Set((0L, 0, 5.5), (0L, 2, 2.0), (1L, 1, 7.25), (1L, 2, 1.0)))
  }

  test("header line is dropped even when a data triplet equals it") {
    // dims "2 2 2" — and a legal data line could read "2 2 2"
    val f = writeFixture(Seq("2 2 2", "1 1 9.0", "2 2 2"), "h.mtx")
    val coo = MtxIngest.readMatrix(spark, f)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(coo == Set((0L, 0, 9.0), (1L, 1, 2.0)))
  }

  test("pattern mtx (no value column) defaults to 1.0") {
    val f = writeFixture(Seq("2 2 2", "1 2 ", "2 1").map(_.trim), "p.mtx")
    val vals = MtxIngest.readMatrix(spark, f)
      .select("val").as[Double].collect().toSeq
    assert(vals == Seq(1.0, 1.0))
  }

  test("indexed tsv sidecar: line order is the position index") {
    val f = writeFixture(Seq("ENSG0\talpha", "ENSG1\tbeta"), "g.tsv")
    val t = MtxIngest.readIndexedTsv(spark, f, Seq("gene_id", "gene_name"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    assert(t == Set((0, "ENSG0", "alpha"), (1, "ENSG1", "beta")))
  }

  test("fixture ingest round-trips bit-exactly to the parquet counts view") {
    val dir = MtxQueries.fixture(spark, sf)
    val ingested = MtxIngest.readMatrix(spark, s"$dir/matrix.mtx")
    val direct = ScSparse.toSparse(ScMatrix.counts(spark, sf))
    val diff = ingested.except(direct).count() + direct.except(ingested).count()
    assert(diff == 0)
    // sidecars line up with the matrix dims
    val dims = MtxIngest.readDims(s"$dir/matrix.mtx")
    assert(MtxIngest.readIndexedTsv(spark, s"$dir/genes.tsv",
      Seq("gene_id", "gene_name")).count() == dims.nGenes)
    assert(MtxIngest.readIndexedTsv(spark, s"$dir/barcodes.tsv",
      Seq("barcode")).count() == dims.nCells)
  }
}
