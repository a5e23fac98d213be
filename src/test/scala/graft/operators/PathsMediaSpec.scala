package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q134 user journey paths + q135 binary media dedup. */
class PathsMediaSpec extends SparkSpecBase {
  import spark.implicits._

  test("userPaths: hand-built sequences collapse to ordered signatures") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    val ev = Seq(
      (1L, t(1), 7L, "a", 0.0, "{}"), (2L, t(2), 7L, "b", 0.0, "{}"),
      (3L, t(1), 8L, "a", 0.0, "{}"), (4L, t(2), 8L, "b", 0.0, "{}"),
      (5L, t(1), 9L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.userPathsOn(ev).as[(String, Long)].collect().toSet
    assert(out === Set(("a->b", 2L), ("c", 1L)))
  }

  test("userPaths: same-timestamp events break ties by event_id") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq(
      (2L, ts, 7L, "b", 0.0, "{}"), (1L, ts, 7L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.userPathsOn(ev).as[(String, Long)].collect()
    assert(out.toSeq === Seq(("a->b", 1L)))
  }

  test("userPaths on testdata: path event count equals user event count") {
    val out = EventOps.userPaths(spark, sf0001, k = 1000000)
      .as[(String, Long)].collect()
    assert(out.nonEmpty)
    val totalEventsViaPaths = out.map { case (p, n) =>
      (p.split("->").length.toLong) * n
    }.sum
    assert(totalEventsViaPaths === graft.Tables.events(spark, sf0001).count())
  }

  test("mediaDedup: totals and waste agree with exact dedup") {
    val out = MultimodalOps.mediaDedup(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("mp4", "png", "wav"))
    val docs = graft.Tables.documents(spark, sf0001)
    assert(out.map(_._3).sum === docs.count())
    out.foreach { case (_, nDistinct, nTotal, wasted) =>
      assert(nDistinct <= nTotal)
      assert((wasted == 0L) === (nDistinct == nTotal))
    }
  }
}
