package graft.zarr

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sc.AnnData

/** The foreign-writer interop fixture: bytes written by
  * tools/make_foreign_zarr.py (python stdlib + numpy, no JVM), read by
  * the production readers. The gate query (q_zarr_foreign) proves the
  * aggregate; this spec pins the element-level decode — values, NULL
  * categorical codes, |S padding strip, CSR structure — against the
  * generator's formula. */
class ForeignZarrSpec extends SparkSpec {

  private lazy val root = ForeignZarr.fixture()

  test("dense X decodes element-exact against the formula, through " +
    "python-written partial-edge zlib chunks") {
    val x = spark.read.format("zarr").load(s"$root/dense.zarr/X")
      .select(col("row_id"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(x.size == 48)
    for (i <- Seq(0, 6, 7, 41, 47); j <- Seq(0, 5, 6, 17, 19))
      assert(x(i.toLong)(j) == ((i * 31 + j * 17) % 97).toDouble,
        s"X[$i][$j]")
  }

  test("categorical obs decodes codes→categories with -1 → NULL and " +
    "|S5 null-padding stripped; numeric obs reads the null-compressor " +
    "member") {
    val obs = AnnData.readZarr(spark, s"$root/dense.zarr").obs
      .select(col("id"), col("label"), col("weight")).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getDouble(2)))
      .toMap
    assert(obs.size == 48)
    val cats = Array("alpha", "beta", "gamma", "delta")
    for (i <- 0 until 48) {
      val expectLabel =
        if (i % 13 == 5) None else Some(cats(i % 4))
      assert(obs(i.toLong)._1 == expectLabel, s"label[$i]")
      assert(obs(i.toLong)._2 == (i % 7) + 0.5, s"weight[$i]")
    }
    assert(obs.values.count(_._1.isEmpty) == 4) // i = 5, 18, 31, 44
  }

  test("the python-written csr_matrix X reads back as exactly the " +
    "(i+j)%3==0 COO of the formula") {
    val coo = AnnData.readCsrX(spark, s"$root/sparse.zarr").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(coo.size == 320)
    for (((i, j), v) <- coo) {
      assert((i + j) % 3 == 0, s"stray element ($i,$j)")
      assert(v == ((i * 31 + j * 17) % 97).toDouble, s"value ($i,$j)")
    }
    // completeness: every (i+j)%3==0 cell is present
    assert(coo.size ==
      (for (i <- 0 until 48; j <- 0 until 20 if (i + j) % 3 == 0) yield 1).sum)
  }

  test("var/col_id (<i8) round-trips 0..19") {
    val v = AnnData.readZarr(spark, s"$root/dense.zarr").vars
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v == (0 until 20).map(j => j.toLong -> j.toLong).toMap)
  }
}
