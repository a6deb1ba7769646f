package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec    => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  test("interleaveBits is the Morton code (golden bit patterns)") {
    val rows = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (5L, 2L))
      .toDF("a", "b")
      .select(ZOrder.interleaveBits(col("a"), col("b"), 4).as("z"))
      .as[Long].collect().toSeq
    // a fills even bit positions, b odd: (3,0)->0b0101=5, (0,3)->0b1010=10,
    // (3,3)->0b1111=15, (5,2)->a bits {0,2}->z{0,4}, b bit {1}->z{3} = 25
    assert(rows == Seq(0L, 5L, 10L, 15L, 25L))
  }

  test("interleave is monotone-compatible: equal prefixes share z ranges") {
    // any pair within one (a,b) unit cell maps to one z value — sanity
    // that the fold covers all 16 bits without collisions for small ints
    val n = 64
    val zs = (for (a <- 0 until n; b <- 0 until n) yield (a.toLong, b.toLong))
      .toDF("a", "b")
      .select(ZOrder.interleaveBits(col("a"), col("b"), 16).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == n * n, "Morton code collided")
  }

  test("partkey slice skips on the z-layout but not on the date-sorted one") {
    val total = Tables.lineitem(spark, sf).count()
    val pk = col("l_partkey") <= 25

    val viaZ = spark.read.parquet(ZOrder.fixture(spark, sf)).filter(pk)
    val matching = viaZ.count()
    assert(matching > 0, "partkey slice empty — band drifted")
    val zRead = scanOutputRows(viaZ)

    // the single-dimension (date-sorted) layout cannot serve a partkey
    // predicate: partkey min/max spans the domain in every row group
    val viaDate = spark.read.parquet(Sorted.fixture(spark, sf)).filter(pk)
    val dateRead = scanOutputRows(viaDate)

    assert(dateRead > total / 2,
      s"date-sorted read $dateRead of $total for a partkey slice — " +
        "layout assumption broke")
    assert(zRead * 2 < dateRead,
      s"z-layout read $zRead vs date-sorted $dateRead — no 2nd-dim skipping")
  }

  test("z-ordered rewrite is content-preserving for the query") {
    val viaZ = ZOrder.scanZOrder(spark, sf).collect().toSeq
    val viaPlain = Tables.lineitem(spark, sf)
      .filter(col("l_partkey") <= 25)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")) + lit(1e-6), 2).as("sum_qty"))
      .orderBy("l_partkey").collect().toSeq
    assert(viaZ == viaPlain)
  }
}
