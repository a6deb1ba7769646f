package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("mutual information: closed forms on dependent and independent data") {
    // perfectly dependent: y == x, 4 uniform classes -> MI = ln(4)
    val dep = (0 until 100).map(i => (s"c${i % 4}", s"c${i % 4}"))
      .toDF("x", "y")
    val miDep = ScalarFuncs.miTable(dep, "x", "y")
      .agg(sum("mi_term")).head.getDouble(0)
    assert(math.abs(miDep - math.log(4)) < 1e-4, s"got $miDep")
    // independent: y cycles out of phase with x -> every cell at its
    // expected count, MI = 0 and chi2 = 0
    val ind = (0 until 100).map(i => (s"c${i % 4}", s"d${(i / 4) % 5}"))
      .toDF("x", "y")
    val indT = ScalarFuncs.miTable(ind, "x", "y")
    assert(math.abs(indT.agg(sum("mi_term")).head.getDouble(0)) < 1e-4)
    assert(indT.agg(sum("chi2_term")).head.getDouble(0) < 1e-4)
    // MI over observed cells is a KL divergence: total is non-negative
    val corpus = ScalarFuncs.statsMi(spark, sf)
      .agg(sum("mi_term")).head.getDouble(0)
    assert(corpus >= -1e-6)
  }

  test("MAD outliers: heavy tail fires, robust center stays put") {
    val out = ScalarFuncs.outliersMad(spark, sf).collect()
    val evN = graft.tables.Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n")).sum == evN)
    out.foreach { r =>
      assert(r.getAs[Double]("mad") > 0, s"$r")
      val nOut = r.getAs[Long]("n_outliers")
      // the event values are log-normal-ish: the right tail must trip
      // the 3.5 cutoff, but robustly — only a small fraction
      assert(nOut > 0 && nOut < r.getAs[Long]("n") / 10, s"$r")
      assert(r.getAs[Double]("max_z") > 3.5, s"$r")
    }
  }

  test("winsorized mean sits inside the clip bounds, tails are ~5%") {
    val out = ScalarFuncs.aggWinsor(spark, sf).collect()
    assert(out.nonEmpty)
    val n = graft.tables.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val avg = r.getAs[Double]("avg_winsor")
      assert(lo <= avg && avg <= hi, s"$r")
      // exact percentiles: at most ~5% of the group in each tail
      val g = n(r.getString(0)).toDouble
      assert(r.getAs[Long]("n_clip_lo") <= g * 0.06 + 1, s"$r")
      assert(r.getAs[Long]("n_clip_hi") <= g * 0.06 + 1, s"$r")
    }
  }
}
