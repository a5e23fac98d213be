package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** State-SIZE observability gate (VERDICT r12 item 7): the 18 streaming
  * ops are stream≡batch correctness-gated, but none of those gates
  * would catch a state LEAK — a watermark accidentally dropped from a
  * query keeps every result identical while the state store grows
  * without bound until the 100 TB/day feed OOMs it. This suite drives
  * the eviction-bearing shapes through MemoryStream and asserts, from
  * `StreamingQueryProgress.stateOperators`, that (a) state rows are
  * actually REMOVED as the watermark advances and (b) the peak state
  * never approaches "every key ever seen".
  */
class StreamStateSizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  /** (peak numRowsTotal, final numRowsTotal, total numRowsRemoved)
    * across every progress entry that carries state operators.
    */
  private def stateSeries(q: StreamingQuery): (Long, Long, Long) = {
    val entries = q.recentProgress.toSeq
      .flatMap(p => Option(p.stateOperators).toSeq.flatten.headOption
        .map(s => (s.numRowsTotal, s.numRowsRemoved)))
    assert(entries.nonEmpty, "no state operator progress recorded")
    (entries.map(_._1).max, entries.last._1, entries.map(_._2).sum)
  }

  test("dropDuplicatesWithinWatermark: state shrinks after eviction, never holds every key seen") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF.toDF("doc_id", "text", "ts")
    val q = WatermarkDedupStream.admitted(docs, "10 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("state_size_dedup").start()
    def feed(ids: Range, ts: String): Unit = {
      input.addData(ids.map(i => (i.toLong, s"text$i", t(ts))))
      q.processAllAvailable()
    }
    // 50 fresh keys per batch, event time advancing 5 minutes per batch
    // — far past the 10 s delay, so each batch's keys are evictable as
    // soon as the NEXT batch moves the watermark
    feed(1 to 50, "2024-01-01 10:00:00")
    feed(51 to 100, "2024-01-01 10:05:00")
    feed(101 to 150, "2024-01-01 10:10:00")
    feed(151 to 151, "2024-01-01 10:15:00")
    val (peak, fin, removed) = stateSeries(q)
    q.stop()
    // 151 distinct keys fed; an unwatermarked dedup would hold all 151
    assert(peak <= 101, s"state peaked at $peak rows — eviction is not keeping up")
    assert(removed >= 100, s"only $removed state rows evicted across the run")
    assert(fin <= 51, s"final state $fin rows — old keys survived their eviction time")
  }

  test("watermarked tumbling-window aggregation: closed windows leave the store") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp)]
    val agg = input.toDF.toDF("event_type", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("state_size_window").start()
    // 12 batches, 30 s apart — each batch lands in its own 10 s window
    // and every earlier window closes as the watermark passes it
    (0 until 12).foreach { b =>
      val sec = f"${b * 30 % 60}%02d"
      val min = f"${b * 30 / 60}%02d"
      input.addData(Seq(("view", t(s"2024-01-01 10:$min:$sec")),
        ("click", t(s"2024-01-01 10:$min:$sec"))))
      q.processAllAvailable()
    }
    val (peak, _, removed) = stateSeries(q)
    q.stop()
    // 12 windows × 2 types ever created; in-flight state must stay a
    // small constant set, not the whole history
    assert(peak <= 8, s"window state peaked at $peak rows — closed windows not evicted")
    assert(removed >= 20, s"only $removed window-state rows evicted")
    // the closed windows actually emitted downstream
    assert(spark.table("state_size_window").count() >= 20)
  }

  test("watermarked session window: closed sessions leave the store") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val agg = input.toDF.toDF("user_id", "ts")
      .withWatermark("ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("state_size_session").start()
    // each batch: 5 users active for one event, 10 minutes apart —
    // every batch closes the previous batch's 5 sessions
    (0 until 8).foreach { b =>
      input.addData((1L to 5L).map(u =>
        (u, t(f"2024-01-01 ${10 + b / 6}%02d:${b * 10 % 60}%02d:00"))))
      q.processAllAvailable()
    }
    val (peak, _, removed) = stateSeries(q)
    q.stop()
    // 40 sessions ever; in-flight is one batch's worth
    assert(peak <= 10, s"session state peaked at $peak rows")
    assert(removed >= 30, s"only $removed session-state rows evicted")
  }
}
