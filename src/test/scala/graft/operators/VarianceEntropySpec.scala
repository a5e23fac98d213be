package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch N: PCA variance explained (q198), supply
  * concentration (q199), journey entropy (q200).
  */
class VarianceEntropySpec extends SparkSpecBase {
  import spark.implicits._

  test("q198: ratio in (0, 1]; near 1 on a planted dominant direction") {
    val r = PcaOps.varianceExplained(spark, sf0001).collect().head
    assert(r.getLong(0) === graft.Tables.embeddings(spark, sf0001).count())
    assert(r.getDouble(1) > 0.0 && r.getDouble(1) <= 1.0)
  }

  test("q199: bands partition the part set; single-source parts band 10") {
    val out = CoreQueries.q199SupplyConcentration(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nParts = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().count()
    assert(out.map(_.getLong(1)).sum === nParts)
    val nLines = graft.Tables.lineitem(spark, sf0001).count()
    assert(out.map(_.getLong(2)).sum === nLines)
    out.foreach(r => assert(r.getLong(0) >= 1L && r.getLong(0) <= 10L))
    // a part with one supplier must land in band 10: verify against a
    // direct count of single-supplier parts landing at 10*top==total
    val singles = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("ns"))
      .filter(col("ns") === 1).count()
    val band10 = out.find(_.getLong(0) == 10L).map(_.getLong(1)).getOrElse(0L)
    assert(band10 >= singles)
  }

  test("journeyEntropy: hand-computed distribution") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // 4 users: two share path view->click, one click, one view
    val ev = Seq(
      (1L, 10L, ts(0), "view"), (2L, 10L, ts(1), "click"),
      (3L, 20L, ts(0), "view"), (4L, 20L, ts(1), "click"),
      (5L, 30L, ts(0), "click"),
      (6L, 40L, ts(0), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
    val r = EventOps.journeyEntropyOn(ev).collect().head
    assert(r.getLong(0) === 4L)
    assert(r.getLong(1) === 3L)
    // distribution {1/2, 1/4, 1/4} -> H = 1.5 bits
    assert(r.getDouble(2) === 1.5)
  }

  test("journeyEntropy: single shared path gives +0.0 bits") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val ev = Seq((1L, 1L, ts(0), "view"), (2L, 2L, ts(0), "view"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val r = EventOps.journeyEntropyOn(ev).collect().head
    assert(r.getDouble(2) === 0.0)
    assert(1.0 / r.getDouble(2) > 0) // +0.0, not -0.0
  }
}
