package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-7 seventh batch: time-travel reconstruction (q136), cross-modal
  * fusion bands (q137), partition-stats manifest (q138).
  */
class TravelFusionSpec extends SparkSpecBase {
  import spark.implicits._

  test("timeTravel: history reconstruction equals direct snapshots") {
    val out = IncrementalOps.q136TimeTravel(spark, sf0001)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val v1 = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    // recompute v2 directly with the documented mutation
    val v2n = v1.filter($"doc_id" % 13 =!= 0).count() +
      v1.filter($"doc_id" % 17 === 0).count()
    assert(out(1)._1 === v1.count())
    assert(out(2)._1 === v2n)
    assert(out(1)._2 ===
      v1.agg(sum(length($"text"))).as[Long].head())
  }

  test("fusionBands: every embedded doc lands in exactly one cell") {
    val out = PipelineOps.fusionBands(spark, sf0001)
      .as[(Int, Int, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (qb, nb, n) =>
      assert(qb >= 0 && qb <= 4 && nb >= 0 && n > 0)
    }
    val nEmb = graft.Tables.embeddings(spark, sf0001).count()
    assert(out.map(_._3).sum === nEmb)
  }

  test("partitionStats: manifest bounds are tight and totals conserve") {
    val out = EventOps.partitionStats(spark, sf0001)
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val ev = graft.Tables.events(spark, sf0001)
    assert(out.map(_._2).sum === ev.count())
    out.foreach { case (_, n, mnu, mxu, nTypes) =>
      assert(n > 0 && mnu <= mxu && nTypes >= 1 && nTypes <= 5)
    }
    // bounds really are min/max: global min/max match the manifest's
    val (gmn, gmx) = ev.agg(min("user_id"), max("user_id"))
      .as[(Long, Long)].head()
    assert(out.map(_._3).min === gmn && out.map(_._4).max === gmx)
  }
}
