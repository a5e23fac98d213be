package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q141 snapshot drift report + q142 uncertainty sampling. */
class DriftUncertaintySpec extends SparkSpecBase {
  import spark.implicits._

  test("driftReport: all three metrics drift under the v2 mutation") {
    val out = IncrementalOps.q141DriftReport(spark, sf0001)
      .as[(String, Long, Long, Int)].collect()
    assert(out.map(_._1).toSeq === Seq("chars", "distinct_texts", "n_rows"))
    // deriveV2 drops %13 and adds %17 — row count must differ; the
    // [rev2] suffix changes chars and distinct contents
    out.foreach { case (m, v1, v2, drifted) =>
      assert(v1 > 0 && v2 > 0)
      assert(drifted === (if (v1 != v2) 1 else 0), m)
    }
    assert(out.forall(_._4 === 1))
    // v1 row count is the corpus size
    val nRows = out.find(_._1 == "n_rows").get
    assert(nRows._2 === graft.Tables.documents(spark, sf0001).count())
  }

  test("driftReport: identical snapshots show zero drift") {
    val v1 = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    val p = v1.agg(count(lit(1)).as("n"), sum(length($"text")).as("c"),
      countDistinct(md5($"text")).as("d")).as[(Long, Long, Long)].head()
    // sanity: the profile itself is deterministic across two evaluations
    val p2 = v1.agg(count(lit(1)).as("n"), sum(length($"text")).as("c"),
      countDistinct(md5($"text")).as("d")).as[(Long, Long, Long)].head()
    assert(p === p2)
  }

  test("uncertainty: k rows, sorted by margin, consistent with q83") {
    val out = TextAnalysisOps.uncertaintySample(spark, sf0001, k = 25)
      .as[(Long, Double, Double)].collect()
    assert(out.length === 25)
    out.foreach { case (_, logit, margin) =>
      assert(margin === math.abs(logit))
    }
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.toSeq)
    // the selected margins are the global smallest
    val allMargins = TextAnalysisOps.qualityClassifier(spark, sf0001)
      .select(abs($"logit")).as[Double].collect().sorted
    assert(out.last._3 <= allMargins(25)) // 26th smallest bounds the cut
  }
}
