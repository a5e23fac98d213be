package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the remaining named Structured
  * Streaming join surface (stream-stream lives in
  * [[IntervalJoinStream]]): the live events stream joined per
  * microbatch against a STATIC dimension (customer tier derived from
  * the batch customer table). No state store at all — the static side
  * is planned like any batch relation (broadcast here), re-resolved
  * per microbatch, which is exactly the production enrichment pattern
  * for slowly-changing dims small enough to broadcast.
  *
  * Stream ≡ batch holds row-exactly: a stateless projection+join's
  * output is a pure function of the input rows (microbatch placement
  * affects only emission time), so the streamed enrichment equals the
  * batch join over the identical landed file — the spec gates it
  * cell-for-cell, including the LEFT OUTER disposition for events
  * whose user has no dim row (kept with null tier, the q106
  * keep-the-nulls rule; an inner enrichment would silently drop
  * exactly the rows most worth flagging at 100 TB).
  */
object EnrichStream {

  /** Static dim: customer key → balance tier (exact integer cents
    * thresholds — no FP in the tier boundary).
    */
  def customerTiers(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("cust_id"),
        when(round(col("c_acctbal") * 100, 0).cast("long") >= 500000L, "gold")
          .when(round(col("c_acctbal") * 100, 0).cast("long") >= 0L, "standard")
          .otherwise("delinquent").as("tier"))

  /** The enrichment tree over any events frame (streaming or batch):
    * left join on the user→customer key, null tier preserved.
    */
  def enriched(events: DataFrame, tiers: DataFrame): DataFrame =
    events
      .select(col("event_id"), col("user_id"), col("event_type"))
      .join(broadcast(tiers), col("user_id") === col("cust_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("tier"))

  /** Live enriched events over the staged landing zone. */
  def enrichedStream(spark: SparkSession, dir: String): DataFrame =
    enriched(
      EventsStream.stagedEventsStream(spark, dir, "graft-enrich-stream"),
      customerTiers(spark, dir))

  /** Drive synchronously over the staged file (append — stateless). */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "enriched_events"): DataFrame =
    EventsStream.runToMemoryTable(spark, enrichedStream(spark, dir),
      queryName, "append")
}
