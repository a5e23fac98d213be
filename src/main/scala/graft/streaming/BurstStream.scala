package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window streaming aggregation — the window surface the other
  * nine operators don't cover (tumbling: EventsStream/OhlcStream;
  * session: Sessionize + native session_window; global stateful:
  * SketchStream/FingerprintStream). Per (user, 10-minute window sliding
  * every 5), the live event count — the streaming counterpart of
  * q210's batch burst screen: the same 10-minute burst a batch scan
  * finds after the fact, surfaced while it is happening.
  *
  * Stream ≡ batch holds EXACTLY: each event belongs to a fixed set of
  * two windows (10 min span / 5 min slide) determined by its own event
  * time, and per-window counts are commutative associative sums — the
  * CMS/XOR argument — so microbatch placement cannot change any cell.
  * The spec gates the streamed counts cell-for-cell against the batch
  * `window()` aggregation over the identical landed file.
  *
  * Scale shape: the state store keys on (user, window) — bounded by
  * active users × (span/slide) live windows once a watermark evicts
  * closed ones; the slide factor multiplies rows 2×, not corpus-scale.
  */
object BurstStream {

  /** The sliding-window count frame over any events frame (streaming or
    * batch) — delegates to the shared
    * [[graft.operators.EventOps.slidingCountsOn]] expression tree so
    * the q212 batch query and this stream cannot drift.
    */
  def slidingCounts(events: DataFrame, span: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    graft.operators.EventOps.slidingCountsOn(events, span, slide)

  /** Live sliding counts over the staged events landing zone. */
  def burstStream(spark: SparkSession, dir: String): DataFrame =
    slidingCounts(
      EventsStream.stagedEventsStream(spark, dir, "graft-burst-stream"))

  /** Watermarked sliding counts: same frame, but the state store
    * EVICTS windows once the watermark passes their end — the
    * bounded-state production variant (active users × span/slide live
    * windows, instead of every window ever seen). Late-data contract:
    * rows behind the watermark are DROPPED — an evicted window's count
    * is immutable, so a straggler can never retro-bump a burst cell
    * (the OhlcStream/SketchStream rule applied to the sliding
    * surface; BurstStreamSpec pins both dispositions).
    */
  def slidingCountsWatermarked(events: DataFrame,
      delay: String = "1 hour", span: String = "10 minutes",
      slide: String = "5 minutes"): DataFrame =
    graft.operators.EventOps.slidingCountsOn(
      events.withWatermark("ts", delay), span, slide)

  /** Drive synchronously over the staged file (complete mode). */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "burst_windows"): DataFrame =
    EventsStream.runToMemoryTable(spark, burstStream(spark, dir),
      queryName, "complete")
}
