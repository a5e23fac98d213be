package graft.streaming

import graft.SparkSpecBase

/** Streaming sliding-window counts ≡ batch, cell-exact: window
  * membership is a pure function of each event's own time and
  * per-window counts are commutative sums, so microbatch placement
  * cannot change any cell.
  */
class BurstStreamSpec extends SparkSpecBase {

  test("streamed sliding counts equal the batch window() rows cell-for-cell") {
    val streamed = BurstStream.runOnce(spark, sf0001, "burst_vs_batch")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    val batch = BurstStream.slidingCounts(
        graft.Tables.events(spark, sf0001))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // the slide actually multiplies membership: some user has a window
    // pair covering the same event (two windows, 5 minutes apart)
    val perUser = batch.groupBy(_._1)
    assert(perUser.values.exists(_.size >= 2))
  }

  test("watermarked sliding counts DROP a late burst row; batch keeps it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF.toDF("user_id", "ts")
    val q = BurstStream.slidingCountsWatermarked(events, "1 hour")
      .writeStream.outputMode("update").format("memory")
      .queryName("burst_late").start()
    // batch 1: user 1 bursts twice at 10:02; a 14:00 row pushes the
    // watermark to 13:00 — far past the 10:00/09:55 windows' ends
    input.addData((1L, t("2024-01-01 10:02:00")),
      (1L, t("2024-01-01 10:02:30")), (2L, t("2024-01-01 14:00:00")))
    q.processAllAvailable()
    // batch 2: a straggler inside user 1's burst — behind the
    // watermark, so the evicted windows must NOT grow
    input.addData((1L, t("2024-01-01 10:03:00")))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("burst_late")
      .filter(col("user_id") === 1L).collect()
      .map(r => r.getTimestamp(1).toString -> r.getLong(2)).toMap
    // both sliding windows over the burst hold the pre-straggler count
    assert(u1.values.toSet === Set(2L), u1.toString)
    // the unwatermarked batch frame over the IDENTICAL rows counts 3
    val all = Seq((1L, t("2024-01-01 10:02:00")),
      (1L, t("2024-01-01 10:02:30")), (2L, t("2024-01-01 14:00:00")),
      (1L, t("2024-01-01 10:03:00"))).toDF("user_id", "ts")
    val batchU1 = BurstStream.slidingCounts(all)
      .filter(col("user_id") === 1L).collect()
    assert(batchU1.forall(_.getLong(2) === 3L), batchU1.mkString("; "))
  }
}
