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

  /** events schema as the file stream source sees it (ts read as raw
    * nanos long — see graft.Tables.events).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Tumbling 1-day window counts per event_type with a 1-day watermark.
    * Returns the *streaming* DataFrame (caller starts the sink).
    */
  def dailyCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file stream source wants a directory of arriving files; the
    // testdata table is a single file — stage it into a watch dir (this is
    // exactly the landing-zone shape a production stream would consume)
    val watchDir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    val staged = watchDir.resolve("events-000.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged)
    // best-effort cleanup: a staged full-table copy per call would
    // otherwise accumulate in /tmp across suite/bench runs
    staged.toFile.deleteOnExit(); watchDir.toFile.deleteOnExit()
    val stream = spark.readStream
      .schema(eventsRawSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    stream
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("date").as("day"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Stream-static enrichment join: the events stream joined to a static
    * user→segment dimension (derived from customer) before aggregating —
    * the standard streaming enrichment shape (static side re-planned per
    * micro-batch; no state store involved for the join itself).
    */
  def enrichedCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val watchDir = java.nio.file.Files.createTempDirectory("graft-events-enrich")
    val staged = watchDir.resolve("events-000.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged)
    staged.toFile.deleteOnExit(); watchDir.toFile.deleteOnExit()
    val users = graft.Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(watchDir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .join(users, Seq("user_id"), "left")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("cnt"))
  }

  def runEnrichedOnce(spark: SparkSession, dir: String,
      queryName: String = "events_enriched"): DataFrame = {
    val q = enrichedCounts(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Drive the stream synchronously over the existing files (local smoke:
    * memory sink + processAllAvailable) and return the materialized result.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String = "events_daily"): DataFrame = {
    val q = dailyCounts(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
