package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY.md §2.10): the reference is
  * batch-only with `mode(append)` re-runs as its incremental mechanism; we
  * provide the real streaming path over the `events` table — file source →
  * watermark → tumbling-window agg → sink. At scale this is the
  * continuously-running variant of q25_events_daily.
  */
object EventsStream {

  /** events schema as the file stream source sees it. The physical type
    * of `ts` depends on the testdata generation (raw nanos long vs µs
    * timestamp — see graft.Tables.events), so the pinned stream schema is
    * parameterized on it.
    */
  def eventsRawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  /** Stage one parquet file into a fresh watch directory and open it as a
    * schema-pinned file stream — the landing-zone shape a production
    * stream consumes. Shared by the events entry points (here and
    * Sessionize) and by [[DocsStream]].
    */
  private[streaming] def stageParquetStream(spark: SparkSession,
      srcFile: String, prefix: String, schema: StructType): DataFrame = {
    val watchDir = java.nio.file.Files.createTempDirectory(prefix)
    val staged = watchDir.resolve("staged-000.parquet")
    // DeleteOnExitHook runs in REVERSE registration order: register the
    // directory first so the file inside it is deleted before it
    watchDir.toFile.deleteOnExit()
    staged.toFile.deleteOnExit()
    java.nio.file.Files.copy(java.nio.file.Paths.get(srcFile), staged)
    spark.readStream.schema(schema).parquet(watchDir.toString)
  }

  /** The events table as a staged file stream, with the ns→µs conversion
    * applied.
    */
  def stagedEventsStream(spark: SparkSession, dir: String,
      prefix: String): DataFrame = {
    // Probe the batch-side footer once so the pinned stream schema matches
    // the file's physical layout (same footer-based dispatch as
    // graft.Tables.events — no error-message sniffing; the legacy NANOS
    // layout needs the session-scoped nanosAsLong conf, which the
    // streaming source consults beyond this call).
    val tsType =
      if (graft.Tables.footerSaysNanos(spark, s"$dir/events.parquet", "ts")) {
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        LongType
      } else spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    val stream = stageParquetStream(spark, s"$dir/events.parquet", prefix,
      eventsRawSchema(tsType))
    tsType match {
      case LongType => // raw nanos: floor-convert ns→µs like DuckDB does
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // wall-clock-preserving under the project's UTC sessions
        stream.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => stream
    }
  }

  /** Drive any streaming DataFrame into a memory sink synchronously. */
  def runToMemoryTable(spark: SparkSession, df: DataFrame,
      queryName: String, mode: String): DataFrame = {
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Tumbling 1-day window counts per event_type with a 1-day watermark.
    * Returns the *streaming* DataFrame (caller starts the sink).
    */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame =
    stagedEventsStream(spark, dir, "graft-events-stream")
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Native session-window streaming aggregation: Spark's built-in
    * `session_window` (gap-merged event-time sessions in the state
    * store) over the staged events stream — the declarative counterpart
    * of the custom [[Sessionize]] flatMapGroupsWithState sessionizer.
    * The spec gates it against the BATCH session_window over the same
    * landed file (exact), and CascadeSessionSpec separately pins batch
    * session_window ≡ the q58 window formulation — closing the triangle
    * custom-state ↔ native-streaming ↔ relational.
    */
  def sessionCounts(spark: SparkSession, dir: String,
      gap: String = "30 minutes"): DataFrame =
    stagedEventsStream(spark, dir, "graft-events-sessionwin")
      .withWatermark("ts", "1 day")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))
      .select(col("user_id"), col("session_start"), col("n_events"))

  /** Stream-static enrichment join: the events stream joined to a static
    * user→segment dimension (derived from customer) before aggregating —
    * the standard streaming enrichment shape (static side re-planned per
    * micro-batch; no state store involved for the join itself).
    */
  def enrichedCounts(spark: SparkSession, dir: String): DataFrame = {
    val users = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    stagedEventsStream(spark, dir, "graft-events-enrich")
      .join(users, Seq("user_id"), "left")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("cnt"))
  }

  def runEnrichedOnce(spark: SparkSession, dir: String,
      queryName: String = "events_enriched"): DataFrame =
    runToMemoryTable(spark, enrichedCounts(spark, dir), queryName, "complete")

  /** Streaming exact dedup: drop replayed events by event_id with
    * watermark-bounded state (`dropDuplicatesWithinWatermark`) — the
    * streaming face of the q27 exact-dedup family. State holds only keys
    * younger than the watermark, so it is bounded at 100 TB/day ingest
    * rates; an unbounded `dropDuplicates` on a stream would grow state
    * forever. Emits the deduplicated event stream itself (append mode —
    * downstream aggregation composes as a separate query).
    */
  def dedupedEvents(spark: SparkSession, dir: String): DataFrame =
    stagedEventsStream(spark, dir, "graft-events-dedup")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"), col("user_id"))

  def runDedupedOnce(spark: SparkSession, dir: String,
      queryName: String = "events_deduped"): DataFrame =
    runToMemoryTable(spark, dedupedEvents(spark, dir), queryName, "append")

  /** Stream-stream interval join with watermarks on both sides: pair each
    * user's 'click' with the 'view' that happened at most `windowMinutes`
    * before it — the funnel/attribution shape. Both watermarks plus the
    * time-bound condition let Spark expire join state, so state is bounded
    * by (rate × window), not the whole history. Equality keys (user_id)
    * shuffle both streams the same way; the interval condition is applied
    * post-match, never as a cross product.
    */
  def viewToClickJoin(spark: SparkSession, dir: String,
      windowMinutes: Int = 60): DataFrame = {
    val src = stagedEventsStream(spark, dir, "graft-events-ssjoin")
    val views = src.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
      col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  def runViewToClickOnce(spark: SparkSession, dir: String,
      queryName: String = "events_ssjoin"): DataFrame =
    runToMemoryTable(spark, viewToClickJoin(spark, dir), queryName, "append")

  /** Drive the stream synchronously over the existing files (local smoke:
    * memory sink + processAllAvailable) and return the materialized result.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String = "events_daily"): DataFrame =
    runToMemoryTable(spark, dailyCounts(spark, dir), queryName, "complete")
}
