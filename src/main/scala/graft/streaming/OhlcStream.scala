package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming daily OHLC bars: q176's time-series compaction maintained
  * live as events land. The open/close trick survives streaming
  * UNCHANGED because lexicographic struct min/max are commutative
  * associative aggregates — any microbatch placement folds to the same
  * per-group min/max records (the XOR/CMS argument applied to
  * selection), so stream ≡ batch holds EXACTLY, not just eventually.
  * Complete output mode over (event_type, day) groups — bounded global
  * state (|types|·|days| rows of five scalars).
  */
object OhlcStream {

  /** Live OHLC over the staged events landing zone; same expression
    * tree as the batch [[graft.operators.EventOps.dailyOhlcOn]].
    */
  def ohlcStream(spark: SparkSession, dir: String): DataFrame =
    EventsStream.stagedEventsStream(spark, dir, "graft-ohlc-stream")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        struct(col("ts"), col("event_id").as("eid"), col("value").as("v"))
          .as("rec"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(min(col("rec")).getField("v").as("open"),
        max(col("rec")).getField("v").as("close"),
        min(col("value")).as("low"), max(col("value")).as("high"),
        count(lit(1)).as("n_events"))

  /** Drive synchronously over the staged file (complete mode). */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "ohlc_bars"): DataFrame =
    EventsStream.runToMemoryTable(spark, ohlcStream(spark, dir),
      queryName, "complete")

  /** Watermarked OHLC bars over an arbitrary events frame: groups by
    * the event-time WINDOW (not a derived date) so the state store can
    * evict closed bars once the watermark passes — the bounded-state
    * production variant of [[ohlcStream]]'s complete-mode aggregation,
    * whose state otherwise grows one row per (type, day) forever.
    *
    * Late-data contract: a row whose event time has fallen behind the
    * watermark is DROPPED — an already-evicted bar is immutable, so a
    * straggler can never retro-edit a published open/low/high/close.
    * OhlcStreamSpec feeds an out-of-order fixture past the watermark
    * and pins BOTH sides: the late extreme absent here, present in the
    * unwatermarked batch reference over the identical rows.
    */
  def ohlcBarsWatermarked(events: DataFrame,
      delay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .select(col("event_type"), window(col("ts"), "1 day").as("w"),
        struct(col("ts"), col("event_id").as("eid"), col("value").as("v"))
          .as("rec"),
        col("value"))
      .groupBy(col("event_type"), col("w"))
      .agg(min(col("rec")).getField("v").as("open"),
        max(col("rec")).getField("v").as("close"),
        min(col("value")).as("low"), max(col("value")).as("high"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("w.start").cast("date").as("day"),
        col("open"), col("close"), col("low"), col("high"),
        col("n_events"))
}
