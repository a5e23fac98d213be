package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention semantics on constructed event
  * logs where every cell is hand-computable, plus structural gates on
  * the real events table.
  */
class EventOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")

  test("funnel: ordering is enforced, not bag-of-events") {
    // u1 completes in order; u2's purchase precedes signup (counts to
    // stage 3 only); u3's view precedes signup (stage 1 only); u4 never
    // signs up (invisible)
    val events = ev(
      (1L, "signup", "2024-01-01 00:00:01"),
      (1L, "view", "2024-01-01 00:00:02"),
      (1L, "click", "2024-01-01 00:00:03"),
      (1L, "purchase", "2024-01-01 00:00:04"),
      (2L, "purchase", "2024-01-01 00:00:01"),
      (2L, "signup", "2024-01-01 00:00:02"),
      (2L, "view", "2024-01-01 00:00:03"),
      (2L, "click", "2024-01-01 00:00:04"),
      (3L, "view", "2024-01-01 00:00:01"),
      (3L, "signup", "2024-01-01 00:00:02"),
      (4L, "view", "2024-01-01 00:00:01"))
    val got = EventOps.funnelOn(events).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1, "signup", 3L, 1.0),
      (2, "view", 2L, 0.6667),
      (3, "click", 2L, 0.6667),
      (4, "purchase", 1L, 0.3333)))
  }

  test("funnel on the real events table: monotone, stage 1 = signup users") {
    val rows = EventOps.funnel(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3, 4))
    // monotone non-increasing survivors
    rows.sliding(2).foreach { case Array((_, a), (_, b)) => assert(a >= b) }
    val nSignup = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(rows.head._2 === nSignup)
  }

  test("cohortRetention: hand-computed triangle, offset-0 cells read 1.0") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"), // week 0
      (1L, "view", "2024-01-09 10:00:00"), // week 1
      (1L, "view", "2024-01-16 10:00:00"), // week 2
      (2L, "view", "2024-01-08 10:00:00"), // week 1 (cohort)
      (2L, "view", "2024-01-22 10:00:00"), // week 3 -> offset 2
      (3L, "view", "2024-01-02 10:00:00")) // week 0
    val got = EventOps.cohortRetentionOn(events).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (0, 0, 2L, 1.0), (0, 1, 1L, 0.5), (0, 2, 1L, 0.5),
      (1, 0, 1L, 1.0), (1, 2, 1L, 1.0)))
  }

  test("cohortRetention on the real events table: structural invariants") {
    val out = EventOps.cohortRetention(spark, sf0001).cache()
    // every cohort has an offset-0 row at exactly 1.0
    val zero = out.filter(col("week_offset") === 0)
    assert(zero.count() === out.select("cohort_week").distinct().count())
    assert(zero.filter(col("retention") =!= 1.0).count() === 0)
    // retention bounded (0, 1], offsets non-negative
    assert(out.filter(col("retention") <= 0 || col("retention") > 1 ||
      col("week_offset") < 0).count() === 0)
    out.unpersist()
  }
}
