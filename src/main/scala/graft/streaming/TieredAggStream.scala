package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chained stateful streaming aggregation (the 15th streaming surface):
  * TWO event-time windowed aggregations in ONE streaming query —
  * 15-minute per-type buckets rolled up into hourly panels, both in the
  * state store (Spark 4's multiple-stateful-operators support;
  * `window(window_col, …)` re-windows the tier-1 struct downstream).
  * This is the production "tiered rollup" shape: the fine tier absorbs
  * raw-event volume close to the source, the coarse tier aggregates
  * ALREADY-REDUCED rows — at 100 TB the second shuffle moves bucket
  * counts (bounded by types × buckets/hour), never events.
  *
  * Append-mode semantics: an hourly row emits once, when the watermark
  * clears the hour — the spec pins both the completeness side (a
  * sentinel advancing the watermark flushes every real bucket) and the
  * immutability side (a straggler behind the watermark never re-emits
  * or alters a finalized hour).
  *
  * The batch twin ([[tieredBatch]], q247's surface) runs the SAME
  * expression tree (withWatermark is a no-op in batch), and the DuckDB
  * oracle recomputes the panel from raw events with pure integer
  * epoch-floor buckets — proving the tiering is lossless: summing the
  * tier-1 partials reproduces the direct hourly aggregate exactly
  * (counts and integer cents are associative folds).
  */
object TieredAggStream {

  /** The shared two-tier tree over any events frame (streaming or
    * batch): tier-1 `t1` windows per event_type, tier-2 `t2` rollup of
    * the tier-1 windows. Money rides the integer-cent grid end to end.
    */
  def tieredTree(events: DataFrame, wmDelay: String = "1 hour",
      t1: String = "15 minutes", t2: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", wmDelay)
      .groupBy(window(col("ts"), t1), col("event_type"))
      .agg(count(lit(1)).as("cnt_t1"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_c_t1"))
      .groupBy(window(col("window"), t2), col("event_type"))
      .agg(sum(col("cnt_t1")).as("cnt"),
        sum(col("value_c_t1")).as("value_c"),
        count(lit(1)).as("n_buckets"))
      .select(unix_micros(col("window.start")).as("bucket_start_us"),
        col("event_type"), col("cnt"), col("value_c"), col("n_buckets"))

  /** The live tiered panel over the staged landing zone. */
  def tieredStream(spark: SparkSession, dir: String): DataFrame =
    tieredTree(EventsStream.stagedEventsStream(spark, dir, "graft-tiered"))

  /** Drive synchronously (append — chained stateful aggregations only
    * support append mode).
    */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "tiered_counts"): DataFrame =
    EventsStream.runToMemoryTable(spark, tieredStream(spark, dir),
      queryName, "append")

  /** Batch twin through the SAME tree — q247's gate surface. */
  def tieredBatch(spark: SparkSession, dir: String): DataFrame =
    tieredTree(graft.Tables.events(spark, dir))
      .orderBy(col("bucket_start_us"), col("event_type"))
}
