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

  test("lastTouchAttribution: running last-click, nulls kept, exact µs") {
    val events = Seq(
      (10L, 1L, "click", "2024-01-01 00:00:01"),
      (11L, 1L, "view", "2024-01-01 00:00:02"),
      (12L, 1L, "purchase", "2024-01-01 00:00:03"), // -> click 10, 2s
      (13L, 1L, "click", "2024-01-01 00:00:04"),
      (14L, 1L, "purchase", "2024-01-01 00:00:05"), // -> click 13, 1s
      (20L, 2L, "purchase", "2024-01-01 00:00:01")) // no click -> nulls
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val got = EventOps.lastTouchAttributionOn(events).collect().map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got.toSeq === Seq(
      (12L, 1L, 10L, 2000000L),
      (14L, 1L, 13L, 1000000L),
      (20L, 2L, -1L, -1L)))
  }

  test("itemCooccurrence: support gate and a hand-zero PMI") {
    // 5 users share items {1,2}; one user has {1,3}. With minSupport=5
    // only (1,2) survives; n_1=6, n_2=5, n_12=5, N=6 users ->
    // pmi = ln(5*6 / (6*5)) = 0 exactly
    val rows = (1 to 5).flatMap(u => Seq(
        (u.toLong, """{"k": 1}"""), (u.toLong, """{"k": 2}"""))) ++
      Seq((6L, """{"k": 1}"""), (6L, """{"k": 3}"""))
    val ev = rows.toDF("user_id", "props")
    val got = EventOps.itemCooccurrenceOn(ev).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1, 2, 5L, 0.0)))
  }

  test("cappedUserItems: hot user is bounded, cap is deterministic") {
    // hot user 99 touches 30 distinct items; item 7 three times, item 3
    // twice, everything else once — the (n_ev DESC, item ASC) rank must
    // keep exactly {7, 3, 1, 2, 4} at cap=5
    val hot = (1 to 30).map(i => (99L, s"""{"k": $i}""")) ++
      Seq((99L, """{"k": 7}"""), (99L, """{"k": 7}"""),
        (99L, """{"k": 3}""")) ++
      (1 to 5).map(u => (u.toLong, """{"k": 1}"""))
    val ev = hot.toDF("user_id", "props")
    val capped = EventOps.cappedUserItems(ev, cap = 5)
    val hotItems = capped.filter(col("user_id") === 99L)
      .collect().map(_.getInt(1)).sorted
    assert(hotItems.toSeq === Seq(1, 2, 3, 4, 7))
    // cold users untouched
    assert(capped.filter(col("user_id") === 1L).count() === 1L)
    // a cap at-or-above activity is lossless: identical grid
    val full = EventOps.cappedUserItems(ev, cap = 30).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val naive = ev.select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
      .distinct().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(full === naive)
  }

  test("itemCooccurrence: hot-user pair fan-out is bounded by the cap") {
    // one bot with 40 items would emit C(40,2)=780 pairs uncapped; at
    // cap=5 it emits exactly C(5,2)=10 — and 5 normal users still push
    // their shared pair over minSupport
    val rows = (1 to 40).map(i => (999L, s"""{"k": $i}""")) ++
      (1 to 5).flatMap(u => Seq(
        (u.toLong, """{"k": 1}"""), (u.toLong, """{"k": 2}""")))
    val ev = rows.toDF("user_id", "props")
    // minSupport=1 exposes every generated pair; the bot contributes
    // only pairs among its top-5 items {1..5}
    val pairs = EventOps.itemCooccurrenceOn(ev, k = 1000, minSupport = 1,
      userItemCap = 5)
    val maxItem = pairs.agg(max(col("item_j"))).head().getInt(0)
    assert(maxItem <= 5, "pairs must only involve capped top-5 items")
    assert(pairs.count() === 10L)
  }

  test("rollingActiveUsers: hand-computed DAU/WAU7 on a tiny log") {
    // day 0: users {1,2}; day 3: {2}; day 8: {1,3}
    val events = ev(
      (1L, "view", "2024-01-01 05:00:00"),
      (2L, "view", "2024-01-01 06:00:00"),
      (2L, "view", "2024-01-04 05:00:00"),
      (1L, "view", "2024-01-09 05:00:00"),
      (3L, "view", "2024-01-09 06:00:00"))
    val got = EventOps.rollingActiveUsersOn(events).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // wau7(day d) counts users active in [d-6, d]: day 0 -> {1,2};
    // day 3 -> {1,2}; day 8 -> {1,2,3} (day 3 within window, day 0 not)
    assert(got.toSeq === Seq(
      (0, 2L, 2L, 1.0), (3, 1L, 2L, 0.5), (8, 2L, 3L, 0.6667)))
  }

  test("dailyAnomalies: hand-computed z, zero-variance yields null") {
    // days 0..6 counts (8,9,10,11,12,9,11): sum=70, sumsq=712,
    // num = 7*712-4900 = 84, var = 2, std = sqrt(2);
    // day 7 count 20 -> z = 10/sqrt(2) = 7.0711, anomaly
    val counts = Seq(8, 9, 10, 11, 12, 9, 11, 20)
    val events = counts.zipWithIndex.flatMap { case (n, d) =>
      (1 to n).map(i => (i.toLong, "view", f"2024-01-${d + 1}%02d 05:00:00"))
    }
    val out = EventOps.dailyAnomaliesOn(ev(events: _*)).collect()
    assert(out.length === 1) // only day 7 has a full 7-day baseline
    val r = out.head
    assert(r.getInt(0) === 7 && r.getLong(1) === 20L)
    assert(r.getDouble(2) === 7.0711 && r.getInt(3) === 1)
    // constant baseline -> zero variance -> null z, null flag
    val flat = (0 to 7).flatMap(d =>
      (1 to 10).map(i => (i.toLong, "view", f"2024-01-${d + 1}%02d 05:00:00")))
    val fr = EventOps.dailyAnomaliesOn(ev(flat: _*)).collect().head
    assert(fr.isNullAt(2) && fr.isNullAt(3))
  }

  test("q108/q109: exact integer revenue matches a double recompute") {
    val out108 = CoreQueries.q108ShipPriority(spark, sf0001).collect()
    assert(out108.length <= 10 && out108.nonEmpty)
    val revs = out108.map(_.getDouble(3))
    revs.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    // independent double-arithmetic recompute of the top order's revenue
    val top = out108.head
    val l = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_orderkey") === top.getLong(0) &&
        col("l_shipdate") > lit("1998-01-01"))
      .select(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(l - top.getDouble(3)) < 0.01)

    val out109 = CoreQueries.q109RegionalRevenue(spark, sf0001).collect()
    assert(out109.nonEmpty)
    // every nation reported is in ASIA
    val asia = graft.Tables.nation(spark, sf0001)
      .join(graft.Tables.region(spark, sf0001)
        .filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    out109.foreach(r => assert(asia.contains(r.getString(0))))
  }
}
