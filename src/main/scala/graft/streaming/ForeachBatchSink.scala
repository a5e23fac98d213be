package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The streaming WRITE surface: `foreachBatch` into partitioned parquet
  * with idempotent per-batch commits — the operational bridge between
  * the streaming operators and the batch write contract
  * (WRITE_CONTRACT.md / `etl.Sinks`).
  *
  * Exactly-once OUTPUT without a transactional store: each micro-batch
  * lands in its own `batch=<id>` subdirectory in `overwrite` mode, so a
  * batch replayed after a crash (failure between the write and the
  * checkpoint commit — the at-least-once window every foreachBatch sink
  * has) REWRITES its own files instead of appending duplicates. Readers
  * see the directory as one partitioned table (`batch` becomes a
  * partition column under discovery). The same idea as the Delta
  * `txnVersion` dedup, expressed in plain parquet layout.
  */
object ForeachBatchSink {

  /** Idempotent per-batch writer — safe to call again with the same
    * (batchId, rows): the second write replaces the first bit-for-bit
    * instead of duplicating. Kept separate from the stream wiring so
    * the spec can replay a batch directly.
    */
  def writeBatch(df: DataFrame, outDir: String, batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")

  /** Drive the staged events stream into the sink synchronously. */
  def runOnce(spark: SparkSession, dir: String, outDir: String,
      checkpoint: String): Unit = {
    val q = EventsStream.stagedEventsStream(spark, dir, "graft-fb-sink")
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: Dataset[Row], id: Long) =>
        writeBatch(batch.toDF(), outDir, id))
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
