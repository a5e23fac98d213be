package graft.streaming

import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark-bounded streaming dedup — the 18th streaming operator and
  * the FIRST-CLASS API complement to [[DedupStream]]: where DedupStream
  * hand-rolls permanent first-arrival state in
  * `flatMapGroupsWithState` (a dup of a year-old doc is still a dup,
  * state grows with distinct content forever), this rides the built-in
  * `dropDuplicatesWithinWatermark`, whose state is EVICTED once the
  * watermark passes each key's event time + delay — the bounded-state
  * answer for a 100 TB/day feed where duplicates cluster in time
  * (retries, replays, crawler re-fetches) and unbounded state would
  * OOM the state store long before the corpus ends.
  *
  * The traded guarantee, pinned by the spec's MemoryStream
  * dispositions: a duplicate arriving WITHIN the delay of its first
  * copy is dropped exactly like DedupStream; a duplicate arriving
  * after the watermark evicted its key is RE-ADMITTED (downstream
  * batch dedup — q27 — remains the backstop). Choose by duplicate
  * arrival-lag distribution: retries/replays → this; adversarial
  * year-later dups → DedupStream or batch.
  *
  * Exactly-once across restart: the dedup state lives in the
  * checkpoint, so a `Trigger.AvailableNow` catch-up run after a stop
  * drops duplicates of PREVIOUSLY admitted keys (spec-proven through
  * [[ForeachBatchSink]]'s idempotent per-batch parquet commits).
  */
object WatermarkDedupStream {

  /** Admit the first copy of each content fingerprint seen within the
    * watermark delay. Input needs (doc_id, text, ts); output is the
    * admitted (doc_id, fp, ts) rows, append-mode.
    */
  def admitted(docs: DataFrame, delay: String = "10 minutes"): DataFrame =
    docs.select(col("doc_id"), Text.fingerprintMd5(col("text")).as("fp"),
        col("ts"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("fp")

  /** The staged documents stream with a deterministic synthetic event
    * time (documents carry none): epoch-fixed + doc_id seconds — the
    * whole corpus spans minutes, so a one-file AvailableNow run admits
    * exactly one copy per fingerprint, making the run comparable to
    * the batch q27 rule.
    */
  def stagedAdmitted(spark: SparkSession, dir: String,
      delay: String = "1 hour"): DataFrame =
    admitted(
      DocsStream.stagedDocumentsStream(spark, dir, "graft-wmdedup-stream")
        .withColumn("ts",
          timestamp_seconds(lit(1700000000L) + col("doc_id"))),
      delay)

  /** Drive synchronously over the staged file; returns admitted rows. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "wm_dedup_admitted"): DataFrame =
    EventsStream.runToMemoryTable(spark,
      stagedAdmitted(spark, dir), queryName, "append")
}
