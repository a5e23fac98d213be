package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Stream ≡ batch gates for the live HLL distinct panel: EXACT
  * equality (HLL registers are a max-fold — a commutative idempotent
  * monoid, so micro-batch placement and duplicate redelivery cannot
  * move the estimate), plus the q42-style 3·rsd error envelope.
  */
class DistinctStreamSpec extends SparkSpecBase {

  private def panelOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet

  test("staged-file streaming distinct panel equals the batch panel cell-for-cell") {
    val streamed = panelOf(DistinctStream.runOnce(spark, sf0001,
      "distinct_stream_test"))
    val events = graft.Tables.events(spark, sf0001)
    val batch = panelOf(DistinctStream.distinctPanel(events))
    assert(streamed === batch)
    // the q42 contract holds through the streaming path too: estimate
    // within 3·rsd of the exact per-type distinct
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    streamed.foreach { case (t, est, _) =>
      val ex = exact(t).toDouble
      assert(math.abs(est - ex) <= 3 * 0.05 * ex + 1,
        s"type $t: est $est vs exact $ex")
    }
  }

  test("micro-batch placement and duplicate redelivery cannot move the panel") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ev(i: Long) = (i % 97, if (i % 3 == 0) "click" else "view")
    val all = (1L to 500L).map(ev)
    val input = MemoryStream[(Long, String)]
    val events = input.toDF.toDF("user_id", "event_type")
    val q = DistinctStream.distinctPanel(events)
      .writeStream.outputMode("complete").format("memory")
      .queryName("distinct_split_test").start()
    try {
      input.addData(all.take(13))
      q.processAllAvailable()
      input.addData(all.slice(13, 402))
      q.processAllAvailable()
      input.addData(all.drop(402))
      q.processAllAvailable()
      val afterSplit = panelOf(spark.table("distinct_split_test"))
      val batch = panelOf(DistinctStream.distinctPanel(
        all.toDF("user_id", "event_type")))
      assert(afterSplit === batch)
      // replay an entire earlier slice: HLL union is idempotent, the
      // panel's users_est must not move (n_events counts the replays —
      // the honest split between the sketch and the plain counter)
      input.addData(all.slice(13, 402))
      q.processAllAvailable()
      val afterReplay = spark.table("distinct_split_test")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(afterReplay === batch.map(t => (t._1, t._2)))
    } finally q.stop()
  }
}
