package graft.streaming

import graft.functions.{PriEvent, ReservoirAggregator}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming priority reservoir (the 20th streaming surface): maintain
  * the q326 sample — the k smallest md5 priorities — LIVE as events
  * arrive, as one global stateful aggregation over the
  * [[graft.functions.ReservoirAggregator]].
  *
  * Why this sampler is the one to stream: min-k-by-priority is a
  * commutative idempotent monoid (q326 proves the merge law
  * relationally — global top-k ≡ merged shard top-ks), so the
  * streaming state is a FIXED k-row buffer and stream ≡ batch holds
  * EXACTLY under any micro-batch boundary placement — the same
  * argument that makes the CMS the right sketch to stream
  * (SketchStream), applied to sampling. A uniform random reservoir
  * (Vitter's algorithm R) by contrast is order-dependent state that
  * could only be distribution-gated; the deterministic-priority form
  * is the one a distributed OR streaming pipeline can actually verify.
  *
  * ReservoirStreamSpec feeds the same rows in one batch and split
  * across micro-batches and pins both equal to the batch twin
  * row-for-row.
  */
object ReservoirStream {

  /** The prioritized projection — IDENTICAL to q326's (same salt, same
    * md5), so the streamed sample is the live view of that query.
    */
  def priEvents(ev: DataFrame): Dataset[PriEvent] = {
    import ev.sparkSession.implicits._
    ev.select(
        md5(concat(col("event_id").cast("string"), lit("_rs7"))).as("pri"),
        col("event_id"),
        round(col("value") * 100, 0).cast("long").as("v_c"))
      .as[PriEvent]
  }

  /** The live reservoir over a (streaming or batch) events frame: one
    * global aggregation to the k-row sample, exploded back to rows.
    * Streaming callers run it in complete mode (global stateful agg,
    * no watermark — state is k rows by construction, not by eviction).
    */
  def reservoir(events: DataFrame, k: Int = 100): DataFrame =
    priEvents(events)
      .select(new ReservoirAggregator(k).toColumn)
      .toDF("sample")
      .select(explode(col("sample")).as("e"))
      .select(col("e.pri").as("pri"), col("e.event_id").as("event_id"),
        col("e.v_c").as("v_c"))

  /** Drive synchronously over the staged landing zone (complete mode). */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "reservoir_sample"): DataFrame =
    EventsStream.runToMemoryTable(spark,
      reservoir(EventsStream.stagedEventsStream(spark, dir,
        "graft-reservoir-stream")),
      queryName, "complete")
}
