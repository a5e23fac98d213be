package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Chained stateful aggregation (15-min → hourly in one streaming
  * query): append-mode completeness/immutability against the batch twin
  * run through the SAME expression tree.
  */
class TieredAggStreamSpec extends SparkSpecBase {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))

  test("append stream emits exactly the watermark-finalized hours of the batch twin") {
    val streamed = TieredAggStream.runOnce(spark, sf0001, "tiered_vs_batch")
      .collect().map(key).toSet
    val batch = TieredAggStream.tieredBatch(spark, sf0001).collect()
      .map(key).toSet
    // append mode withholds hours the final watermark has not cleared:
    // everything emitted must be a batch row (cell-exact), and every
    // hour strictly inside the watermark must have been emitted
    assert(streamed.subsetOf(batch),
      s"streamed rows not in batch: ${(streamed -- batch).take(3)}")
    val maxTsUs = graft.Tables.events(spark, sf0001)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = maxTsUs - 3600000000L // the tree's 1 h watermark delay
    val surelyFinal = batch.filter(_._1 + 3600000000L < wmUs)
    assert(surelyFinal.subsetOf(streamed),
      s"finalized hours missing from stream: ${(surelyFinal -- streamed).take(3)}")
    assert(streamed.nonEmpty && surelyFinal.nonEmpty)
  }

  test("sentinel-flushed stream equals the batch panel; a straggler cannot reopen a final hour") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = TieredAggStream.tieredTree(events).writeStream
      .outputMode("append").format("memory").queryName("tiered_mem").start()
    // two real hours (09 and 10), multiple 15-min buckets each, plus a
    // far-future sentinel that advances the watermark past both
    input.addData(
      (1L, t("2024-01-01 09:05:00"), "click", 1.00),
      (2L, t("2024-01-01 09:20:00"), "click", 2.00),
      (3L, t("2024-01-01 09:50:00"), "view", 4.00),
      (4L, t("2024-01-01 10:10:00"), "click", 8.00),
      (5L, t("2024-01-05 00:00:00"), "sentinel", 0.0))
    q.processAllAvailable()
    val flushed = spark.table("tiered_mem")
      .filter(col("event_type") =!= "sentinel").collect().map(key).toSet
    val hr = (s: String) => t(s).getTime * 1000L
    assert(flushed === Set(
      (hr("2024-01-01 09:00:00"), "click", 2L, 300L, 2L),
      (hr("2024-01-01 09:00:00"), "view", 1L, 400L, 1L),
      (hr("2024-01-01 10:00:00"), "click", 1L, 800L, 1L)))
    // straggler into the finalized 09:00 hour: behind the watermark, so
    // the emitted panel must not grow or change (append immutability)
    input.addData((6L, t("2024-01-01 09:40:00"), "click", 99.0))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("tiered_mem")
      .filter(col("event_type") =!= "sentinel").collect().map(key).toSet
    assert(after === flushed, "straggler reopened a finalized hour")
  }
}
