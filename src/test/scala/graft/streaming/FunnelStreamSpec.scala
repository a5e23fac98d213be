package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class FunnelStreamSpec extends SparkSpecBase {

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("group logic: one stage per event, strict ordering, state carries") {
    val state = new TestGroupState[FunnelStream.FunnelState]
    // purchase before any click must not advance; view at the exact
    // signup instant must not advance (strictly-after contract)
    val out1 = FunnelStream.advanceGroup(7, Iterator(
      FunnelStream.FunnelEvent(7, ts(10), "purchase"),
      FunnelStream.FunnelEvent(7, ts(20), "signup"),
      FunnelStream.FunnelEvent(7, ts(20), "view"),
      FunnelStream.FunnelEvent(7, ts(30), "view")), state).toSeq
    assert(out1.map(a => (a.stage, a.ts)) === Seq((1, ts(20)), (2, ts(30))))
    assert(state.updated.contains(
      FunnelStream.FunnelState(20000000L, 30000000L, -1L, -1L)))
    // next batch: click then purchase complete the funnel
    val out2 = FunnelStream.advanceGroup(7, Iterator(
      FunnelStream.FunnelEvent(7, ts(40), "click"),
      FunnelStream.FunnelEvent(7, ts(50), "purchase")), state).toSeq
    assert(out2.map(_.stage) === Seq(3, 4))
    // monotone-final: nothing ever advances twice
    val out3 = FunnelStream.advanceGroup(7, Iterator(
      FunnelStream.FunnelEvent(7, ts(60), "signup"),
      FunnelStream.FunnelEvent(7, ts(61), "purchase")), state).toSeq
    assert(out3.isEmpty)
  }

  test("stream ≡ batch: advancement set equals funnelStageTimes cell-exact") {
    val streamed = FunnelStream.runOnce(spark, sf0001).toDF()
      .select(col("user_id"), col("stage"),
        col("ts").cast("timestamp_ntz").as("t"))
    val batch = graft.operators.EventOps
      .funnelStageTimes(graft.Tables.events(spark, sf0001))
      .zipWithIndex.map { case ((_, df), i) =>
        df.select(col("user_id"), lit(i + 1).as("stage"),
          col("t").cast("timestamp_ntz").as("t"))
      }.reduce(_.union(_))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty,
      "streamed advancements diverge from the batch stage times")
    // and the per-stage counts equal the q103 report
    val counts = streamed.groupBy("stage").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    graft.operators.EventOps.funnel(spark, sf0001).collect().foreach { r =>
      assert(counts(r.getInt(0)) === r.getLong(2))
    }
  }
}
