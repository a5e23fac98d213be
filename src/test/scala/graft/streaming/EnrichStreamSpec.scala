package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Stream-static enrichment ≡ batch row-for-row (stateless join — a
  * pure function of the input rows), null tier preserved.
  */
class EnrichStreamSpec extends SparkSpecBase {

  test("streamed enrichment equals the batch left join cell-for-cell") {
    val streamed = EnrichStream.runOnce(spark, sf0001, "enrich_vs_batch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    val batch = EnrichStream.enriched(
        graft.Tables.events(spark, sf0001),
        EnrichStream.customerTiers(spark, sf0001))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // sanity: this fixture enriches every event (sf0.001 users 0-14
    // all own a customer row), so any null tier here is a join bug
    assert(batch.forall(_._4.nonEmpty), "unexpected null tier on a fixture where every user has a dim row")
    assert(batch.exists(_._4.nonEmpty), "no event enriched — fixture dead")
    // row count preserved exactly (a silently-inner join would shrink)
    assert(batch.size === graft.Tables.events(spark, sf0001)
      .select(col("event_id")).distinct().count())
  }

  test("left disposition has teeth: a dim-less user survives with null tier") {
    // sf0.001 has no dim-less users, so drive the SAME expression tree
    // over a frame where one event's user is absent from the dim
    import spark.implicits._
    val ev = Seq((1L, 5L, "click"), (2L, 999999L, "view"))
      .toDF("event_id", "user_id", "event_type")
    val out = EnrichStream.enriched(ev,
        EnrichStream.customerTiers(spark, sf0001))
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3)))).toMap
    assert(out(1L).nonEmpty, "known user must be enriched")
    assert(out(2L).isEmpty, "dim-less user must survive with null tier")
    assert(out.size === 2, "left join must preserve both rows")
  }
}
