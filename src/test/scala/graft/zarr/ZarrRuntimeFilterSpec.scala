package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, In}

/** Runtime (DPP-style) chunk pruning: row_id is the zarr source's
  * partition axis, so a join build side's key set narrows the planned
  * chunk bands at RUNTIME — the DSv2 twin of dynamic partition
  * pruning. The API contract is pinned directly (filter() before
  * planInputPartitions drops whole bands); the end-to-end join is
  * value-pinned against the unfiltered result. */
class ZarrRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val N = 512
  private val ChunkRows = 64

  private def mkStore(): String = {
    val dir = java.nio.file.Files.createTempDirectory("zrf").toString + "/store"
    (0 until N).map(i => (i.toLong, Seq.tabulate(3)(j => i + j * 0.5)))
      .toDF("row_id", "vec")
      .write.format("zarr").option("chunk_rows", ChunkRows)
      .option("commit", "rename").mode("overwrite").save(dir)
    dir
  }

  test("filter() narrows planInputPartitions to the IN-envelope's bands") {
    val dir = mkStore()
    val meta = ZarrIO.readMeta(dir)
    def freshScan() = new ZarrScanBuilder(dir, meta).build()
    val all = freshScan().toBatch.planInputPartitions()
    assert(all.length == N / ChunkRows) // 8 bands unfiltered

    val scan = freshScan()
    scan.asInstanceOf[ZarrScan].filter(
      Array[Filter](In("row_id", Array[Any](100L, 105L, 110L))))
    val pruned = scan.toBatch.planInputPartitions()
    assert(pruned.length == 1, s"expected 1 band for [100,110], got ${pruned.length}")

    // an envelope spanning two bands keeps exactly those two
    val scan2 = freshScan()
    scan2.asInstanceOf[ZarrScan].filter(
      Array[Filter](In("row_id", Array[Any](60L, 70L))))
    assert(scan2.toBatch.planInputPartitions().length == 2)

    // a non-row_id runtime filter is ignored (sound: no narrowing)
    val scan3 = freshScan()
    scan3.asInstanceOf[ZarrScan].filter(
      Array[Filter](In("other", Array[Any](1L))))
    assert(scan3.toBatch.planInputPartitions().length == N / ChunkRows)
  }

  test("declared runtime-filter attribute is row_id") {
    val dir = mkStore()
    val scan = new ZarrScanBuilder(dir, ZarrIO.readMeta(dir)).build()
    val attrs = scan.asInstanceOf[ZarrScan].filterAttributes()
    assert(attrs.map(_.describe()).toSeq == Seq("row_id"))
  }

  test("end-to-end: joining a filtered dim over row_id stays value-exact") {
    val dir = mkStore()
    val dim = (0 until N).map(_.toLong).toDF("k")
      .filter(col("k") >= 200 && col("k") < 210)
    val fact = spark.read.format("zarr").load(dir)
    val j = fact.join(dim, fact("row_id") === dim("k"))
      .select(col("row_id"), expr("round(aggregate(vec, 0D, (a, x) -> a + x), 4)").as("s"))
      .orderBy("row_id")
    val got = j.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = (200L until 210L).map(i =>
      (i, math.rint((3 * i + 0.5 + 1.0) * 10000) / 10000))
    assert(got == want)
  }
}
