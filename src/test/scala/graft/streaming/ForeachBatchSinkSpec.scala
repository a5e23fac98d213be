package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The foreachBatch parquet sink: stream lands every source row exactly
  * once, and a REPLAYED batch (the at-least-once window of every
  * foreachBatch sink) overwrites itself instead of duplicating.
  */
class ForeachBatchSinkSpec extends SparkSpecBase {

  test("streamed sink lands all rows; batch replay is idempotent") {
    val base = Files.createTempDirectory("graft-fb-sink").toString
    val out = s"$base/out"
    ForeachBatchSink.runOnce(spark, sf0001, out, s"$base/chk")
    val landed = spark.read.parquet(out)
    val src = graft.Tables.events(spark, sf0001)
    assert(landed.count() === src.count())
    // cell-level: landed event ids equal the source ids exactly
    assert(landed.select(col("event_id")).exceptAll(
      src.select(col("event_id"))).count() === 0L)
    assert(src.select(col("event_id")).exceptAll(
      landed.select(col("event_id"))).count() === 0L)

    // replay: re-write batch 0 with the same rows (crash-between-write-
    // and-commit simulation; a real replay re-reads the SOURCE from the
    // checkpointed offsets, which for this one-file AvailableNow run is
    // the whole events table) -> table unchanged, no duplication
    ForeachBatchSink.writeBatch(src, out, 0L)
    assert(spark.read.parquet(out).count() === src.count())
  }
}
