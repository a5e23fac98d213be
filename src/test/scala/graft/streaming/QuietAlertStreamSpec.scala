package graft.streaming

import graft.SparkSpecBase

/** Event-time timer alerts: one QuietAlert per closed burst, fired by
  * watermark passage; re-arm on activity; in-batch fold pinned.
  */
class QuietAlertStreamSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  test("timer fires when the watermark passes last_seen + gap; re-arms on return") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF.toDF("user_id", "ts")
    val q = QuietAlertStream.quietAlerts(events).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("quiet_alerts").start()
    // burst 1: two u1 events; watermark (delay 0) lands at 10:01 —
    // u1's 10:31 timer is still in the future, no alert yet
    input.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:01:00")))
    q.processAllAvailable()
    assert(spark.table("quiet_alerts").count() === 0L)
    // u2 activity at 11:00 pushes the watermark past 10:31 — u1's
    // timer fires: one alert for the closed 2-event burst
    input.addData((2L, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    val a1 = spark.table("quiet_alerts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
    assert(a1.toSeq === Seq((1L, "2024-01-01 10:01:00.0", 2L)))
    // u1 returns at 12:00 (fresh state); a 13:00 pusher fires both the
    // new u1 timer (12:30) and u2's 11:30 timer
    input.addData((1L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    input.addData((3L, t("2024-01-01 13:00:00")))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("quiet_alerts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(all === Set(
      (1L, "2024-01-01 10:01:00.0", 2L),
      (2L, "2024-01-01 11:00:00.0", 1L),
      (1L, "2024-01-01 12:00:00.0", 1L)), all.toString)
  }

  test("activity before the gap elapses RE-ARMS instead of alerting") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF.toDF("user_id", "ts")
    val q = QuietAlertStream.quietAlerts(events).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("quiet_rearm").start()
    input.addData((1L, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // 10:20 < 10:00 + 30 min: the old timer must be DELETED, not fire
    input.addData((1L, t("2024-01-01 10:20:00")))
    q.processAllAvailable()
    // push watermark past the STALE 10:30 expiry but not the live
    // 10:50 one — nothing may fire
    input.addData((2L, t("2024-01-01 10:40:00")))
    q.processAllAvailable()
    assert(spark.table("quiet_rearm").count() === 0L)
    // past 10:50: exactly one alert for the merged 2-event burst
    input.addData((3L, t("2024-01-01 11:30:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quiet_rearm").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .filter(_._1 == 1L)
    assert(got.toSeq === Seq((1L, "2024-01-01 10:20:00.0", 2L)))
  }

  test("in-batch fold: a gap INSIDE one microbatch merges (documented trade)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF.toDF("user_id", "ts")
    val q = QuietAlertStream.quietAlerts(events).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("quiet_fold").start()
    // both bursts of u1 land in ONE batch, 3 h apart: the stream sees
    // them at once and folds them into one burst (no history buffer)
    input.addData((1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 13:00:00")))
    q.processAllAvailable()
    input.addData((2L, t("2024-01-01 15:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("quiet_fold").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .filter(_._1 == 1L)
    assert(got.toSeq === Seq((1L, "2024-01-01 13:00:00.0", 2L)))
  }
}
