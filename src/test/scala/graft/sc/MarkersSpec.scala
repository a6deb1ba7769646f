package graft.sc

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MarkersSpec extends SparkSpec {
  import spark.implicits._

  test("markers: planted differential gene tops its group, t signs flip") {
    // gene 1 (pos1=1) is ~10x higher in label 0 than in label 1; gene 2
    // is flat. Within-group variance is planted so Welch's t is defined.
    val m = Seq(
      (0, Seq(10.0, 1.0)), (0, Seq(12.0, 1.5)), (0, Seq(11.0, 1.2)),
      (1, Seq(1.0, 1.1)), (1, Seq(1.5, 1.4)), (1, Seq(0.8, 1.3)))
      .toDF("label", "vec")
    val out = Markers.markersFor(m, topK = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getDouble(3))).toSeq
    // label 0's rank-1 marker is gene 1 with strongly positive t
    val top0 = out.find(r => r._1 == 0 && r._2 == 1).get
    assert(top0._3 == 1 && top0._4 > 3.0)
    // for label 1 the same gene is the most DEPLETED (negative t, so it
    // ranks last of the two genes)
    val g1in1 = out.find(r => r._1 == 1 && r._3 == 1).get
    assert(g1in1._4 < -3.0 && g1in1._2 == 2)
  }

  test("markers: t is symmetric under group swap on two groups") {
    val m = Seq(
      (0, Seq(5.0, 1.0)), (0, Seq(6.0, 2.0)), (0, Seq(5.5, 1.5)),
      (1, Seq(2.0, 4.0)), (1, Seq(2.5, 5.0)), (1, Seq(1.5, 4.5)))
      .toDF("label", "vec")
    val out = Markers.markersFor(m, topK = 2)
      .select("label", "pos1", "t").as[(Int, Int, Double)].collect()
      .map { case (l, p, t) => ((l, p), t) }.toMap // keyed by (label, pos1)
    // with exactly two groups, "rest" of one IS the other: t(0,g) == -t(1,g)
    assert(math.abs(out((0, 1)) + out((1, 1))) < 1e-9)
    assert(math.abs(out((0, 2)) + out((1, 2))) < 1e-9)
  }

  test("wilcoxon: hand-computed tie-corrected rank-sum z") {
    // gene 1: label0 {5,7,9} vs label1 {1,2,5} → ranks 1,2,3.5,3.5,5,6
    // R0 = 3.5+5+6 = 14.5, mu = 10.5, tsum = 2³−2 = 6,
    // σ² = (9/12)(7 − 6/30) = 5.1 → z0 = 4/√5.1 ≈ 1.7713
    // gene 2: all-equal → σ² = 0 → z = 0 (guard)
    val m = Seq(
      (0, Seq(5.0, 1.0)), (0, Seq(7.0, 1.0)), (0, Seq(9.0, 1.0)),
      (1, Seq(1.0, 1.0)), (1, Seq(2.0, 1.0)), (1, Seq(5.0, 1.0)))
      .toDF("label", "vec")
    val out = Markers.wilcoxonFor(m, topK = 2)
      .select("label", "pos1", "z", "rank_sum")
      .as[(Int, Int, Double, Double)].collect()
      .map { case (l, p, z, r) => ((l, p), (z, r)) }.toMap
    assert(math.abs(out((0, 1))._1 - 1.7713) < 5e-4, out.toString)
    assert(out((0, 1))._2 === 14.5)
    // two groups: z antisymmetric, rank sums complementary
    assert(math.abs(out((1, 1))._1 + out((0, 1))._1) < 1e-9)
    assert(out((1, 1))._2 === 6.5)
    // degenerate all-equal gene guards to z = 0
    assert(out((0, 2))._1 === 0.0 && out((1, 2))._1 === 0.0)
  }

  test("regress_out: exactly linear data recovers slope, zero residual") {
    // gene k = k * tot/3 exactly (vec = [t/3, 2t/3] with tot = t):
    // slope_1 = 1/3, slope_2 = 2/3, intercept 0, resid 0
    val m = Seq(Tuple1(Seq(1.0, 2.0)), Tuple1(Seq(2.0, 4.0)),
      Tuple1(Seq(3.0, 6.0)), Tuple1(Seq(5.0, 10.0)))
      .toDF("vec")
    val rows = Markers.regressOutFor(m).collect()
    val byPos = rows.map(r => r.getInt(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(math.abs(byPos(1)._1 - 1.0 / 3) < 1e-4)
    assert(math.abs(byPos(2)._1 - 2.0 / 3) < 1e-4)
    assert(math.abs(byPos(1)._2) < 1e-4 && math.abs(byPos(2)._2) < 1e-4)
    assert(byPos(1)._3 < 1e-6 && byPos(2)._3 < 1e-6)
  }

  test("downsample: largest-remainder hits the target exactly, hand-checked") {
    // cell 1: c=(3,5,2), tot=10, T=6 -> scaled*6: (18,30,12)/10 ->
    // base (1,3,1)=5, rems (8,0,2): one leftover goes to pos 1 (rem 8)
    // -> ds=(2,3,1), wsum = 2*1+3*2+1*3 = 11
    // cell 2: tot 4 <= 6 -> passthrough, wsum = 1+2*2+3*1 = 8
    // cell 3: all-tie rems (2,2,2) with base (0,0,0), tot=3... use
    // c=(1,1,1), tot=3, T=6 -> tot<=T passthrough
    val m = Seq(
      (1L, Seq(3L, 5L, 2L)),
      (2L, Seq(1L, 2L, 1L)),
      (3L, Seq(1L, 1L, 1L)))
      .toDF("vec_id", "c")
    val out = Markers.downsampleFor(m, target = 6L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out(1L) == ((10L, 6L, 11L)))
    assert(out(2L) == ((4L, 4L, 8L)))
    assert(out(3L) == ((3L, 3L, 6L)))
  }

  test("downsample: ties split by position, never exceeds per-gene counts") {
    // c=(2,2,2), tot=6, T=4: base (1,1,1), rems (2,2,2) all tied ->
    // deficit 1 goes to the LOWEST position -> ds=(2,1,1)
    val m = Seq((1L, Seq(2L, 2L, 2L))).toDF("vec_id", "c")
    val r = Markers.downsampleFor(m, target = 4L).collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 2L * 1 + 1 * 2 + 1 * 3) // wsum pins (2,1,1)
  }

  test("regress_out: constant covariate degrades to slope 0, mean intercept") {
    // every cell has the same total -> var(tot)=0; the guard must emit
    // slope 0 / intercept = gene mean / resid = gene stddev, not NaN
    val m = Seq(Tuple1(Seq(1.0, 3.0)), Tuple1(Seq(2.0, 2.0)),
      Tuple1(Seq(3.0, 1.0))).toDF("vec")
    val byPos = Markers.regressOutFor(m).collect().map(r =>
      r.getInt(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byPos(1)._1 == 0.0 && math.abs(byPos(1)._2 - 2.0) < 1e-4)
    // resid rms == population stddev of {1,2,3} = sqrt(2/3)
    assert(math.abs(byPos(1)._3 - math.sqrt(2.0 / 3)) < 1e-4)
  }
}
