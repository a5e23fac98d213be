package graft.operators

import graft.SparkSpecBase

/** q190: the IVF probe-recall curve is monotone in nprobe and anchored
  * to the single-point q101 measurement.
  */
class ProbeCurveSpec extends SparkSpecBase {

  test("q190: recall is monotone in nprobe; nprobe=2 matches q101") {
    val curve = SimilarityOps.probeRecallCurve(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(curve.map(_._1).toSeq === Seq(1, 2, 4))
    // probing more lists can only add candidates -> recall monotone
    curve.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2)
      case _ =>
    }
    curve.foreach { case (_, h, r) =>
      assert(h >= 0L && h <= 40L)
      assert(r >= 0.0 && r <= 1.0)
    }
    // the nprobe=2 point must equal q101's total hits
    val q101hits = SimilarityOps.annRecall(spark, sf0001)
      .collect().map(_.getLong(1)).sum
    assert(curve.find(_._1 == 2).get._2 === q101hits)
  }
}
