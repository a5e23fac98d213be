package graft.streaming

import graft.SparkSpecBase

/** Streaming OHLC ≡ batch q176, cell-exact: struct min/max are
  * commutative associative folds, so microbatch placement cannot
  * change any bar.
  */
class OhlcStreamSpec extends SparkSpecBase {

  test("streamed bars equal the batch q176 rows cell-for-cell") {
    val streamed = OhlcStream.runOnce(spark, sf0001, "ohlc_vs_batch")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    val batch = graft.operators.EventOps.dailyOhlc(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }

  test("watermarked bars DROP a late extreme; the batch reference keeps it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = OhlcStream.ohlcBarsWatermarked(events, "1 hour").writeStream
      .outputMode("update").format("memory").queryName("ohlc_late").start()
    // batch 1: a day-1 bar (low 5.0, 2 events) plus a day-3 row that
    // advances the watermark to day-3 00:00 − 1 h — past day-1's window end
    input.addData(
      (1L, t("2024-01-01 09:00:00"), "trade", 5.0),
      (2L, t("2024-01-01 15:00:00"), "trade", 9.0),
      (3L, t("2024-01-03 00:00:00"), "trade", 7.0))
    q.processAllAvailable()
    // batch 2: a straggler for day 1 carrying a NEW global low — behind
    // the watermark, so the contract says: dropped, bar immutable
    input.addData((4L, t("2024-01-01 12:00:00"), "trade", 0.5))
    q.processAllAvailable()
    q.stop()
    val day1 = spark.table("ohlc_late")
      .filter(col("day") === lit("2024-01-01").cast("date")).collect()
    assert(day1.nonEmpty)
    // every emitted update for day 1 predates the straggler: the late
    // row never reached the state store
    assert(day1.forall(_.getAs[Double]("low") == 5.0),
      day1.mkString("; "))
    assert(day1.forall(_.getAs[Long]("n_events") == 2L),
      day1.mkString("; "))
    // the unwatermarked batch aggregation over the IDENTICAL four rows
    // includes the late extreme — the drop above is the watermark's doing
    val all = Seq(
      (1L, t("2024-01-01 09:00:00"), "trade", 5.0),
      (2L, t("2024-01-01 15:00:00"), "trade", 9.0),
      (3L, t("2024-01-03 00:00:00"), "trade", 7.0),
      (4L, t("2024-01-01 12:00:00"), "trade", 0.5))
      .toDF("event_id", "ts", "event_type", "value")
    val batchDay1 = graft.operators.EventOps.dailyOhlcOn(all)
      .filter(col("day") === lit("2024-01-01").cast("date")).collect()
    assert(batchDay1.length == 1)
    assert(batchDay1.head.getAs[Double]("low") == 0.5)
    assert(batchDay1.head.getAs[Long]("n_events") == 3L)
  }
}
