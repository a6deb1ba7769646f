package graft.zarr

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sc.AnnData

/** FOREIGN-WRITER interop proof for the zarr/AnnData readers.
  *
  * Every zarr fixture the readers consume was, until round 12, written
  * by this repo's own writers (plus spec'd byte-level builders — still
  * JVM code in this codebase). A reader bug mirrored in the writer would
  * be invisible: the "self-consistent readers" risk. This query reads a
  * store whose bytes NO JVM code wrote — `tools/make_foreign_zarr.py`,
  * python stdlib (json/zlib) + numpy, following the public zarr v2 +
  * AnnData on-disk specs — and the DuckDB oracle recomputes the expected
  * result from the generator's FIXED FORMULA (X[i,j] = (i·31+j·17) mod
  * 97 over 48×20), never reading the store. Agreement therefore proves:
  * python-written chunk bytes → JVM chunk decode → Spark plan → the same
  * numbers an independent derivation gives.
  *
  * Surface exercised: dense 2-D X through the DSv2 source (partial edge
  * chunks both axes: 7×6 chunks over 48×20), categorical obs decode
  * (codes `<i4` with −1 = missing → NULL, null-padded `|S5` categories),
  * numeric obs (`<f8`, null compressor), `<i8` var, an AnnData
  * csr_matrix X (data/indices/indptr + encoding-type attrs) through the
  * compressed-axis reader, and python-assembled consolidated
  * `.zmetadata` as the member TOC.
  *
  * The fixture is sf-independent (a fixed interop vector, like a codec
  * conformance stream): the store is built once per SCRIPT content hash
  * — editing the generator invalidates the cache — under the same
  * FileLock discipline as [[graft.tables.Fixtures.cached]]. */
object ForeignZarr {

  private def scriptFile(): File = {
    val f = new File(new File(System.getProperty("user.dir"), "tools"),
      "make_foreign_zarr.py")
    require(f.isFile,
      s"foreign-zarr generator not found at ${f.getAbsolutePath} — " +
        "q_zarr_foreign must run from the repo root (the driver's " +
        "Verify/Bench contract)")
    f
  }

  /** Build (first call per script hash) or reuse the python-written
    * store; returns its root directory. The store MUST be produced by
    * the python process — a missing python3 fails this query loudly
    * rather than silently substituting a JVM-written stand-in, which
    * would defeat the interop proof. */
  def fixture(): String = synchronized {
    val script = scriptFile()
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(script.toPath))
      .map("%02x".format(_)).mkString.take(16)
    val root = new File(System.getProperty("java.io.tmpdir"),
      s"graft_foreignzarr_$md5")
    val marker = new File(root, "_DONE")
    if (marker.exists()) return root.toString
    root.mkdirs()
    val raf = new java.io.RandomAccessFile(new File(root, "_LOCK"), "rw")
    try {
      val lock = raf.getChannel.lock()
      try {
        if (!marker.exists()) {
          val pb = new ProcessBuilder("python3", script.getAbsolutePath,
            root.toString)
          pb.redirectErrorStream(true)
          val p = pb.start()
          val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
          val rc = p.waitFor()
          require(rc == 0,
            s"foreign-zarr generator failed (rc=$rc):\n${out.takeRight(800)}")
          require(new File(root, "dense.zarr/.zmetadata").isFile &&
            new File(root, "sparse.zarr/.zmetadata").isFile,
            s"generator exited 0 but stores are incomplete under $root")
          new java.io.FileOutputStream(marker).close()
        }
      } finally lock.release()
    } finally raf.close()
    root.toString
  }

  /** q_zarr_foreign: per-category aggregate over the python-written
    * store — dense row sums (DSv2 2-D scan), CSR row sums (compressed-
    * axis reader), weights (1-D `<f8` member), labels (categorical
    * decode with missing→NULL filtered). All sums are integer-or-half-
    * valued doubles, exact under any addition order. */
  def foreignQuery(s: SparkSession, d: String): DataFrame = {
    val root = fixture()
    val ad = AnnData.readZarr(s, s"$root/dense.zarr")
    val dense = ad.x.select(col("id"),
      aggregate(col("vec"), lit(0.0), (a, x) => a + x).as("rs"))
    val csr = AnnData.readCsrX(s, s"$root/sparse.zarr")
      .groupBy(col("id")).agg(sum(col("value")).as("rcs"))
    ad.obs.filter(col("label").isNotNull)
      .join(dense, "id").join(csr, "id")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_cells"), sum(col("rs")).as("sum_x"),
        sum(col("rcs")).as("sum_csr"), sum(col("weight")).as("sum_w"))
      .orderBy(col("label"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zarr_foreign" -> foreignQuery _)

  /** The oracle recomputes the generator's formula from scratch
    * (generate_series — it never opens the store): X[i,j] =
    * (i·31+j·17) mod 97, CSR keeps (i+j) mod 3 = 0, label = cats[i mod
    * 4] (missing at i mod 13 = 5), weight = (i mod 7) + 0.5. */
  val oracle: Map[String, String] = Map(
    "q_zarr_foreign" ->
      """WITH cells AS (SELECT i FROM generate_series(0, 47) t(i)),
        |genes AS (SELECT j FROM generate_series(0, 19) t(j)),
        |x AS (SELECT i, j, CAST((i*31 + j*17) % 97 AS DOUBLE) AS v
        |      FROM cells CROSS JOIN genes),
        |rs AS (SELECT i, SUM(v) AS rs FROM x GROUP BY i),
        |rcs AS (SELECT i, SUM(v) AS rcs FROM x WHERE (i + j) % 3 = 0 GROUP BY i),
        |lab AS (SELECT i,
        |          CASE WHEN i % 13 = 5 THEN NULL
        |               ELSE ['alpha','beta','gamma','delta'][(i % 4) + 1] END AS label,
        |          CAST(i % 7 AS DOUBLE) + 0.5 AS w
        |        FROM cells)
        |SELECT label, COUNT(*) AS n_cells, SUM(rs.rs) AS sum_x,
        |       SUM(rcs.rcs) AS sum_csr, SUM(lab.w) AS sum_w
        |FROM lab JOIN rs USING (i) JOIN rcs USING (i)
        |WHERE label IS NOT NULL
        |GROUP BY label ORDER BY label""".stripMargin)
}
