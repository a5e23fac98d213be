package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q146 source Gini + q147 dedup savings. */
class GiniSavingsSpec extends SparkSpecBase {
  import spark.implicits._

  test("sourceGini: in [0,1); matches a direct computation") {
    val out = PipelineOps.sourceGini(spark, sf0001)
      .as[(Int, Long, Double)].head()
    assert(out._1 > 1 && out._3 >= 0.0 && out._3 < 1.0)
    val xs = graft.Tables.documents(spark, sf0001)
      .groupBy("source").agg(sum("n_chars").as("x"))
      .select($"source", $"x").as[(String, Long)].collect()
      .sortBy(r => (r._2, r._1)).map(_._2)
    val n = xs.length
    val six = xs.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum
    val want = BigDecimal(
      (2.0 * six) / (n.toDouble * xs.sum.toDouble) - (n + 1).toDouble / n)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._3 === want)
    assert(out._2 === xs.sum)
  }

  test("dedupSavings: canonical <= raw on every measure; raw saves zero") {
    val out = DedupOps.dedupSavings(spark, sf0001)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val raw = out("raw"); val de = out("exact_dedup")
    assert(raw._5 === 0.0)
    assert(de._2 <= raw._2 && de._3 <= raw._3 && de._4 <= raw._4)
    assert(de._5 >= 0.0 && de._5 < 1.0)
    assert(raw._2 === graft.Tables.documents(spark, sf0001).count())
    // canonical doc count equals q27's distinct-content count
    assert(de._2 === DedupOps.exactDedup(spark, sf0001).count())
  }
}
