package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpecBase {

  test("streaming daily counts match the batch q25 aggregation") {
    val streamed = EventsStream.runOnce(spark, sf0001, "events_daily_test")
      .select(col("day"), col("event_type"), col("cnt"))
    val batch = graft.operators.CoreQueries.q25EventsDaily(spark, sf0001)
      .select(col("day"), col("event_type"), col("cnt"))
    assert(streamed.count() > 0)
    // stream (complete mode over all files) ≡ batch group-by
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup-within-watermark matches batch distinct-by-event_id") {
    val streamed = EventsStream.runDedupedOnce(spark, sf0001, "events_deduped_test")
      .select(col("event_id"), col("event_type"), col("user_id"))
    val batch = graft.Tables.events(spark, sf0001)
      .dropDuplicates("event_id")
      .select(col("event_id"), col("event_type"), col("user_id"))
    // compare collected tuple sets (exceptAll over a memory-sink table
    // trips an attribute-binding bug in this Spark build)
    val s = streamed.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val b = batch.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(s.nonEmpty)
    assert(s.sameElements(b), s"streaming dedup diverged: ${s.length} vs ${b.length}")
  }

  test("stream-stream interval join matches the batch time-bounded join") {
    val streamed = EventsStream.runViewToClickOnce(spark, sf0001, "events_ssjoin_test")
    val ev = graft.Tables.events(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val batch = views.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 60 MINUTES"))
      .select(col("view_id"), col("click_id"))
    val s = streamed.select(col("view_id"), col("click_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = batch.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(s.nonEmpty)
    assert(s.sameElements(b), s"stream-stream join diverged: ${s.length} vs ${b.length}")
  }

  test("stream-static enrichment join matches the batch equivalent") {
    val streamed = EventsStream.runEnrichedOnce(spark, sf0001, "events_enriched_test")
    val batch = graft.Tables.events(spark, sf0001)
      .join(graft.Tables.customer(spark, sf0001)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")),
        Seq("user_id"), "left")
      .groupBy(col("segment")).agg(count(lit(1)).as("cnt"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
