package graft.operators

import graft.SparkSpecBase

/** PCA power iteration (q95): the math the oracle cannot gate —
  * convergence. On a corpus with a planted dominant direction the
  * iteration must recover it; across iterations the Rayleigh quotient
  * must not decrease; the reported component is unit-norm up to
  * quantization.
  */
class PcaOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** 200 vectors: dominant variance along dim 3 (0-based 2), small
    * deterministic off-axis noise — top component ≈ ±e₃.
    */
  private lazy val planted = {
    val rows = (0 until 200).map { i =>
      val v = Array.tabulate(64) { d =>
        if (d == 2) (if (i % 2 == 0) 0.4f else -0.4f)
        else (((i * 7 + d * 13) % 11) - 5) / 1000.0f
      }
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  private def loadings(iters: Int): Array[Double] =
    PcaOps.powerIterationOn(planted, iters)
      .orderBy("d").select("loading").as[Double].collect()

  private def rayleigh(v: Array[Double]): Double = {
    val data = planted.select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().map(_._2.map(_.toDouble))
    val n = data.length
    val mu = Array.tabulate(64)(d => data.map(_(d)).sum / n)
    data.map { x =>
      val s = (0 until 64).map(d => (x(d) - mu(d)) * v(d)).sum
      s * s
    }.sum
  }

  test("planted direction recovered: top component concentrates on the planted axis") {
    val v = loadings(iters = 3)
    assert(math.abs(v(2)) > 0.95, s"planted loading weak: ${v(2)}")
    assert((0 until 64).filter(_ != 2).forall(d => math.abs(v(d)) < 0.2),
      "off-axis loadings should be small")
  }

  test("unit norm up to quantization at every iteration count") {
    Seq(1, 2, 3).foreach { it =>
      val norm2 = loadings(it).map(x => x * x).sum
      assert(math.abs(norm2 - 1.0) < 1e-3, s"iters=$it norm² = $norm2")
    }
  }

  test("Rayleigh quotient non-decreasing across iterations") {
    val r = Seq(1, 2, 3).map(it => rayleigh(loadings(it)))
    assert(r(1) >= r(0) - 1e-6 && r(2) >= r(1) - 1e-6,
      s"Rayleigh decreased: $r")
  }

  test("ABTT removal: corrected rows orthogonal to the component, norms never grow") {
    val v = PcaOps.powerIteration(spark, sf0001)
      .orderBy("d").select("loading").as[Double].collect()
    val data = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().map(_._2.map(_.toDouble))
    data.foreach { x =>
      val s = (0 until 64).map(d => x(d) * v(d)).sum
      val xp = Array.tabulate(64)(d => x(d) - s * v(d))
      // x'·v = s(1 − ‖v‖²): ‖v‖ = 1 up to 6dp rounding ⇒ near-zero
      assert(math.abs((0 until 64).map(d => xp(d) * v(d)).sum) < 0.01)
      val n0 = math.sqrt(x.map(a => a * a).sum)
      val n1 = math.sqrt(xp.map(a => a * a).sum)
      assert(n1 <= n0 + 1e-9, s"projection removal grew a norm: $n1 > $n0")
    }
    // the summary frame partitions the corpus and envelopes are ordered
    val stats = PcaOps.commonComponentRemoved(spark, sf0001).collect()
    assert(stats.map(_.getAs[Long]("n")).sum === data.length.toLong)
    stats.foreach(r => assert(
      r.getAs[Double]("min_norm") <= r.getAs[Double]("max_norm")))
  }

  test("testdata component is deterministic and unit-norm") {
    val a = PcaOps.powerIteration(spark, sf0001).collect()
    val b = PcaOps.powerIteration(spark, sf0001).collect()
    assert(a.toSeq === b.toSeq)
    val norm2 = a.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-3)
  }
}
