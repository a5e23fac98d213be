package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Stream-stream interval join ≡ batch, row-exact: an inner interval
  * join's output pair set is a pure function of the two input row sets
  * and the predicate — microbatch placement affects WHEN a pair emits,
  * never whether. Late-data dispositions pinned via MemoryStream (the
  * BurstStream protocol).
  */
class IntervalJoinStreamSpec extends SparkSpecBase {

  test("streamed attribution pairs equal the batch interval join row-for-row") {
    val streamed = IntervalJoinStream.runOnce(spark, sf0001, "ij_vs_batch")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val ev = graft.Tables.events(spark, sf0001)
    val batch = IntervalJoinStream.intervalJoined(
        IntervalJoinStream.typedSide(ev, "click", "c"),
        IntervalJoinStream.typedSide(ev, "purchase", "p"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // the interval actually fans out: some purchase has >1 prior click
    // (multi-touch — q106's last-touch would keep only the newest)
    assert(batch.groupBy(_._1).values.exists(_.size >= 2) ||
      batch.size >= 2)
  }

  test("a click arriving AFTER its purchase's batch still joins while inside the watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val events = input.toDF.toDF("user_id", "ts", "event_type", "event_id")
    val q = IntervalJoinStream.attributionJoin(events, delay = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_late_ok").start()
    // batch 1: the purchase alone — watermark advances to 09:00
    input.addData((1L, t("2024-01-01 10:00:00"), "purchase", 100L))
    q.processAllAvailable()
    assert(spark.table("ij_late_ok").count() === 0L)
    // batch 2: its prior click arrives LATE in stream order but above
    // the 09:00 watermark — the buffered purchase state must still
    // match it retroactively
    input.addData((1L, t("2024-01-01 09:30:00"), "click", 7L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_late_ok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((100L, 1L, 7L, 1800000000L)))
  }

  test("left outer: a click-less purchase emits its null row once the watermark clears it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val events = input.toDF.toDF("user_id", "ts", "event_type", "event_id")
    val q = IntervalJoinStream.attributionJoinLeft(events, delay = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_outer").start()
    // batch 1: a matched pair (u1) and a click-less purchase (u3)
    input.addData((1L, t("2024-01-01 09:30:00"), "click", 7L),
      (1L, t("2024-01-01 10:00:00"), "purchase", 100L),
      (3L, t("2024-01-01 10:30:00"), "purchase", 200L))
    q.processAllAvailable()
    // batch 2: 23:00 traffic on both types (same-instant, joins
    // nothing) pushes both watermarks to 22:00 — past u3's purchase,
    // so no earlier click can still arrive and its null row must flush
    input.addData((2L, t("2024-01-01 23:00:00"), "click", 998L),
      (2L, t("2024-01-01 23:00:00"), "purchase", 999L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ij_outer").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // matched pair emitted eagerly; u3's null row after eviction; the
    // 23:00 pusher purchase is still inside the watermark, NOT emitted
    assert(got === Set((100L, 7L), (200L, -1L)), got.toString)
  }

  test("a click behind BOTH watermarks is dropped — the evicted pair never appears") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Long)]
    val events = input.toDF.toDF("user_id", "ts", "event_type", "event_id")
    val q = IntervalJoinStream.attributionJoin(events, delay = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ij_late_drop").start()
    // batch 1: the purchase plus 20:00 traffic on BOTH event types
    // (user 2's click/purchase at the same instant join nothing —
    // c_ts < p_ts is strict), pushing BOTH side watermarks to 19:00 —
    // far past the purchase's match window. One type alone would not
    // advance the query watermark: each side's node only sees its own
    // type (min-of-watermarks policy; see attributionJoin's scaladoc)
    input.addData((1L, t("2024-01-01 10:00:00"), "purchase", 100L),
      (2L, t("2024-01-01 20:00:00"), "click", 998L),
      (2L, t("2024-01-01 20:00:00"), "purchase", 999L))
    q.processAllAvailable()
    // batch 2: the 09:30 click is behind the 19:00 watermark — dropped
    // at ingestion; the purchase's state row is already evicted
    input.addData((1L, t("2024-01-01 09:30:00"), "click", 7L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ij_late_drop").count() === 0L)
    // the unwatermarked batch join over the IDENTICAL rows finds it
    val all = Seq((1L, t("2024-01-01 10:00:00"), "purchase", 100L),
      (2L, t("2024-01-01 20:00:00"), "click", 998L),
      (2L, t("2024-01-01 20:00:00"), "purchase", 999L),
      (1L, t("2024-01-01 09:30:00"), "click", 7L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val batch = IntervalJoinStream.intervalJoined(
      IntervalJoinStream.typedSide(all, "click", "c"),
      IntervalJoinStream.typedSide(all, "purchase", "p")).collect()
    assert(batch.length === 1)
  }
}
