package graft.zarr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metadata-answered aggregate pushdown: COUNT/MIN/MAX over row_id must
  * come from `.zarray` shape arithmetic — proven by DELETING every chunk
  * object and re-running — while non-answerable aggregates fall back to
  * the real scan with identical results. */
class ZarrAggPushdownSpec extends SparkSpec {
  import spark.implicits._

  private val N = 300

  private def mkStore(commit: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("zarragg").toString + "/store"
    (0 until N).map(i => (i.toLong, Array.tabulate(4)(j => i * 10.0 + j).toSeq))
      .toDF("row_id", "vec")
      .write.format("zarr").option("chunk_rows", 64)
      .option("commit", commit).mode("overwrite").save(dir)
    dir
  }

  private def aggDf(dir: String) =
    spark.read.format("zarr").load(dir)
      .filter(col("row_id") >= 10 && col("row_id") <= 250)
      .agg(count(lit(1)).as("n"), min("row_id").as("lo"), max("row_id").as("hi"))

  test("count/min/max(row_id) under a pushed range: right values, " +
    "PushedAggregates in the plan") {
    val dir = mkStore("versioned")
    val df = aggDf(dir)
    assert(planOf(df).contains("PushedAggregates=[COUNT(*), MIN(row_id), MAX(row_id)]"),
      s"aggregate not pushed:\n${planOf(df)}")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((241L, 10L, 250L)))
  }

  test("the answer comes from metadata alone: every chunk object " +
    "CORRUPTED (a deleted chunk would legally read as fill value), " +
    "aggregate still answers; the payload scan then fails") {
    val dir = mkStore("versioned")
    // truncate every chunk payload to garbage, keep metadata + pointer
    val root = java.nio.file.Paths.get(dir)
    var corrupted = 0
    java.nio.file.Files.walk(root).forEach { p =>
      val name = p.getFileName.toString
      if (java.nio.file.Files.isRegularFile(p) &&
          name.matches("\\d+\\.\\d+")) {
        java.nio.file.Files.write(p, Array[Byte](1, 2, 3))
        corrupted += 1
      }
    }
    assert(corrupted > 0, "fixture layout changed: no chunk objects found")
    assert(aggDf(dir).collect().head.getLong(0) == 241L)
    // sanity: the same store can NOT serve a vec scan anymore — the agg
    // result above therefore cannot have come from chunk reads
    intercept[Exception] {
      spark.read.format("zarr").load(dir)
        .select(explode(col("vec"))).count()
    }
  }

  test("empty pushed range: count 0, null min/max") {
    val dir = mkStore("versioned")
    val df = spark.read.format("zarr").load(dir)
      .filter(col("row_id") >= 1000)
      .agg(count(lit(1)).as("n"), min("row_id").as("lo"), max("row_id").as("hi"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("SupportsReportStatistics: a small zarr side broadcasts WITHOUT a " +
    "hint (exact rows/bytes from the chunk grid reach join planning)") {
    val dir = mkStore("versioned")
    val small = spark.read.format("zarr").load(dir)
      .filter(col("row_id") < 50)
      .select(col("row_id"), size(col("vec")).as("dim"))
    val big = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val j = big.join(small, big("l_orderkey") === small("row_id"))
    assert(planOf(j).contains("BroadcastHashJoin"),
      s"zarr side not broadcast:\n${planOf(j)}")
    assert(j.count() > 0)
  }

  test("non-answerable aggregates decline the pushdown and stay correct: " +
    "sum(row_id), grouped count, vec-dependent agg") {
    val dir = mkStore("rename")
    val s1 = spark.read.format("zarr").load(dir).agg(sum("row_id").as("s"))
    assert(!planOf(s1).contains("PushedAggregates"))
    assert(s1.collect().head.getLong(0) == (0L until N).sum)
    val g = spark.read.format("zarr").load(dir)
      .groupBy((col("row_id") % 2).as("par")).agg(count(lit(1)).as("n"))
    assert(!planOf(g).contains("PushedAggregates"))
    assert(g.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == Set((0L, (N / 2).toLong), (1L, (N / 2).toLong)))
    val v = spark.read.format("zarr").load(dir)
      .agg(sum(size(col("vec"))).as("d"))
    assert(!planOf(v).contains("PushedAggregates"))
    assert(v.collect().head.getLong(0) == N * 4L)
  }
}
