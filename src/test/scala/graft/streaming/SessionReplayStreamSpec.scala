package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** ListState replay sessionizer: in-batch history SUBDIVIDES (the win
  * over QuietAlert's fixed-width fold), arrival batching cannot change
  * the emitted sessions, and both match the batch q58 assembly.
  */
class SessionReplayStreamSpec extends SparkSpecBase {
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import spark.implicits._

  private def t(s: String) = java.sql.Timestamp.valueOf(s)

  private val u1Rows = Seq(
    (1L, "2024-01-01 10:00:00", "purchase", 10.50),
    (1L, "2024-01-01 10:05:00", "view", 0.0),
    (1L, "2024-01-01 14:00:00", "click", 0.0),
    (1L, "2024-01-01 14:10:00", "purchase", 20.25))

  // (user, duration_us, n_events, n_purchases, total_c)
  private val expected = Set(
    (1L, 300000000L, 2L, 1L, 1050L),
    (1L, 600000000L, 2L, 1L, 2025L))

  private def summarize(table: String) =
    spark.table(table).collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(0), r.getLong(2) - r.getLong(1),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  private def drive(name: String)(
      batches: Seq[Seq[(Long, String, String, Double)]]): Unit = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    val input = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val events = input.toDF.toDF("user_id", "ts", "event_type", "value")
    val q = SessionReplayStream.sessions(events).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b =>
      input.addData(b.map(r => (r._1, t(r._2), r._3, r._4)))
      q.processAllAvailable()
    }
    q.stop()
  }

  test("one microbatch holding two sessions emits TWO sessions (the ListState win)") {
    // the same shape QuietAlertStreamSpec pins as a FOLD — here the
    // replay buffer subdivides it correctly at the 30-min gap
    drive("replay_subdiv")(Seq(
      u1Rows,
      Seq((9L, "2024-01-01 16:00:00", "view", 0.0)))) // watermark pusher
    assert(summarize("replay_subdiv") === expected)
  }

  test("arrival batching cannot change the emitted sessions") {
    drive("replay_batched")(Seq(
      u1Rows.take(1),  // 10:00 alone
      u1Rows.slice(1, 3), // 10:05 continues; 14:00 opens session 2
      u1Rows.drop(3),  // 14:10
      Seq((9L, "2024-01-01 16:00:00", "view", 0.0))))
    assert(summarize("replay_batched") === expected)
  }

  test("streamed sessions equal the shared batch assembly") {
    val ev = u1Rows.toDF("user_id", "s", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val batch = SessionReplayStream.sessionsBatch(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2) - r.getLong(1),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(batch === expected)
  }

  test("a quiet user flushes even while others stay active; open sessions stay silent") {
    drive("replay_open")(Seq(
      Seq((1L, "2024-01-01 10:00:00", "view", 0.0)),
      // u2 pushes the watermark past u1's 10:30 expiry → u1 flushes;
      // u2's own session is still open and must NOT emit
      Seq((2L, "2024-01-01 11:00:00", "view", 0.0))))
    val rows = spark.table("replay_open").collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(rows.toSeq === Seq((1L, 1L)))
  }
}
