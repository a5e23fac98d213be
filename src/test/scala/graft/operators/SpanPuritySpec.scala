package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch P: fulfillment spans (q203) and cluster purity
  * (q204).
  */
class SpanPuritySpec extends SparkSpecBase {

  test("q203: bands partition the order set; single-line orders band 0") {
    val out = CoreQueries.q203FulfillmentSpan(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nOrders = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct().count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    // single-line orders have span 0, so band 0 must hold at least them
    val singles = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") === 1).count()
    val band0 = out.find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(band0 >= singles)
  }

  test("q204: totals reconcile with the q53 cluster assignment") {
    val out = DedupOps.clusterPurity(spark, sf0001).collect()
    val clusters = DedupOps.nearDupClusters(spark, sf0001)
    if (clusters.isEmpty) {
      assert(out.isEmpty) // tiny corpus can legitimately have no pairs
    } else {
      assert(out.map(_.getLong(1)).sum ===
        clusters.select(col("cluster_id")).distinct().count())
      assert(out.map(r => r.getLong(0) * r.getLong(1)).sum ===
        clusters.count())
      out.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    }
  }
}
