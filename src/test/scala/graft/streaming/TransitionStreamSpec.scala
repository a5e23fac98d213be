package graft.streaming

import graft.SparkSpecBase

/** Stream ≡ batch gate for the stateful transition feed: aggregating the
  * emitted (prev_type, event_type) records must reproduce the batch q126
  * transition counts EXACTLY — both sides pair each event with its
  * unique (ts, event_id) total-order predecessor.
  */
class TransitionStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming transition feed aggregates to the batch q126 counts") {
    val streamed = TransitionStream.runOnce(spark, sf0001)
      .groupByKey(t => (t.prev_type, t.event_type))
      .count().collect()
      .map { case ((p, e), n) => (p, e, n) }.toSet
    val batch = graft.operators.EventOps.eventTransitions(spark, sf0001)
      .select("prev_type", "event_type", "n")
      .as[(String, String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("state is one record per user: per-user feed count = events - 1") {
    val perUser = TransitionStream.runOnce(spark, sf0001,
        "transition_feed_counts")
      .groupByKey(_.user_id).count().collect().toMap
    val events = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    perUser.foreach { case (u, n) => assert(n === events(u) - 1) }
    assert(perUser.keySet === events.filter(_._2 > 1).keySet)
  }
}
