package graft.sc

import graft.SparkSpec

/** Hand-computed fixtures through QcMetrics.qcOnCounts and
  * ScoreGenes.scoreOnCounts. */
class QcScoreSpec extends SparkSpec {
  import spark.implicits._

  test("qc metrics: hand-computed totals, gene counts, top-5 share") {
    // 6-gene cell: total 1+2+3+4+5+6=21; top5 = 6+5+4+3+2=20
    val df = Seq((1L, Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0)),
                 (2L, Seq(0.0, 0.01, 0.2, 0.0, 0.0, 0.0)))
      .toDF("id", "vec")
    val out = QcMetrics.qcOnCounts(df, tau = 0.05).collect()
    val r1 = out.find(_.getLong(0) == 1L).get
    assert(r1.getDouble(1) === 21.0)
    assert(r1.getInt(2) === 6)
    assert(math.abs(r1.getDouble(3) - 20.0 * 100.0 / 21.0) < 1e-3)
    val r2 = out.find(_.getLong(0) == 2L).get
    assert(math.abs(r2.getDouble(1) - 0.21) < 1e-9)
    assert(r2.getInt(2) === 1) // only 0.2 clears tau=0.05
    assert(r2.getDouble(3) === 100.0) // ≤5 nonzero genes ⇒ top5 is everything
  }

  test("score_genes: set minus matched-control mean on a planted matrix") {
    // 16 genes ⇒ set = positions {0, 8}. Construct so set genes sit in
    // bins whose other members have a known mean: gene means are
    // controlled directly by using identical rows (mean = the value).
    // means: pos0=10, pos8=12, others: pos1..7 = 1..7, pos9..15 = 21..27
    // ntile(4) over 16 genes by mean: bins of 4.
    // sorted means: 1,2,3,4 | 5,6,7,10 | 12,21,22,23 | 24,25,26,27
    // set bins = bin2 (10) and bin3 (12); ctrl = {5,6,7} ∪ {21,22,23}
    // per-cell (all rows identical): set mean = 11, ctrl mean = 14
    val vec = Seq(10.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0,
                  12.0, 21.0, 22.0, 23.0, 24.0, 25.0, 26.0, 27.0)
    val df = Seq((1L, vec), (2L, vec)).toDF("id", "vec")
    val out = ScoreGenes.scoreOnCounts(df).collect()
    assert(out.length === 2)
    out.foreach(r => assert(math.abs(r.getDouble(1) - (11.0 - 14.0)) < 1e-9))
  }
}
