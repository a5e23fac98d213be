package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** MapState first-seen tracker ≡ batch twin, plus the cross-batch
  * dedupe that IS the MapState's job (an item seen in batch 1 must not
  * re-emit in batch 2, and ordinals must continue from persisted
  * state).
  */
class ItemNoveltyStreamSpec extends SparkSpecBase {

  private def key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))

  test("streamed first-seen feed equals the batch twin row-for-row") {
    val streamed = ItemNoveltyStream.runOnce(spark, sf0001, "novelty_vs_batch")
      .collect().map(key).toSet
    val batch = ItemNoveltyStream
      .firstSeenBatch(graft.Tables.events(spark, sf0001))
      .collect().map(key).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // feed sanity: one row per (user, item), ordinals dense per user
    val byUser = batch.groupBy(_._1)
    byUser.foreach { case (u, rows) =>
      assert(rows.map(_._2).size === rows.size, s"user $u repeated an item")
      assert(rows.map(_._4).toSeq.sorted === (1L to rows.size))
    }
  }

  test("cross-batch: a re-seen item stays silent, a new item continues the ordinal") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val events = input.toDF.toDF("event_id", "ts", "user_id", "props")
    val q = ItemNoveltyStream.firstSeen(events).toDF().writeStream
      .outputMode("append").format("memory").queryName("novelty_mem").start()
    // batch 1: user 7 sees items 5 then 9 (ordinals 1, 2)
    input.addData(
      (1L, t("2024-01-01 09:00:00"), 7L, """{"k": 5}"""),
      (2L, t("2024-01-01 09:10:00"), 7L, """{"k": 9}"""))
    q.processAllAvailable()
    // batch 2: item 5 AGAIN (must be silent — state remembers it) and
    // new item 3 (ordinal must continue at 3, not restart)
    input.addData(
      (3L, t("2024-01-01 10:00:00"), 7L, """{"k": 5}"""),
      (4L, t("2024-01-01 10:30:00"), 7L, """{"k": 3}"""))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("novelty_mem").collect()
      .map(r => (r.getLong(1), r.getLong(3))).sorted.toSeq
    assert(rows === Seq((3L, 3L), (5L, 1L), (9L, 2L)),
      s"got $rows — expected one emission per item with continuing ordinals")
  }
}
