package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 event-analytics batch: RFM log2 bands (q149), inter-arrival
  * gaps (q150), dyadic EWMA (q151), integer day-of-week profile (q152) —
  * every expected cell hand-computed on constructed logs.
  */
class Round8EventSpec extends SparkSpecBase {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String, Double)*) =
    rows.toDF("event_id", "user_id", "event_type", "s", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .withColumn("props", lit(null).cast("string"))

  test("rfm: bands are log2-exact on a constructed ledger") {
    // corpus max day = 2024-01-10.
    // u1: last 2024-01-10 (recency 0 -> bin(1)=1 -> band 0), 3 events
    //     (bin(3)='11' -> band 1), cents 100+250+50=400 -> bin(401) has
    //     9 bits -> band 8
    // u2: last 2024-01-03 (recency 7 -> bin(8) -> band 3), 1 event
    //     (band 0), cents 0 -> bin(1) -> band 0
    val events = ev(
      (1L, 1L, "purchase", "2024-01-09 12:00:00", 1.00),
      (2L, 1L, "purchase", "2024-01-10 01:00:00", 2.50),
      (3L, 1L, "purchase", "2024-01-10 02:00:00", 0.50),
      (4L, 2L, "view", "2024-01-03 00:00:00", 0.00))
    val got = EventOps.rfmSegmentsOn(events)
      .as[(Int, Int, Int, Long)].collect().toSet
    assert(got === Set((0, 1, 8, 1L), (3, 0, 0, 1L)))
  }

  test("interarrival: later event claims the gap; users never mix") {
    // u1: a at t0, b at t0+2s, a at t0+5s -> gaps: b claims 2s, a claims 3s
    // u2: single event -> no gap
    val events = ev(
      (1L, 1L, "a", "2024-01-01 00:00:00", 0.0),
      (2L, 1L, "b", "2024-01-01 00:00:02", 0.0),
      (3L, 1L, "a", "2024-01-01 00:00:05", 0.0),
      (4L, 2L, "a", "2024-03-01 00:00:00", 0.0))
    val got = EventOps.interArrivalOn(events)
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 1L, 3000000L, 3000000L, 3.0),
      ("b", 1L, 2000000L, 2000000L, 2.0)))
  }

  test("ewma: dyadic 16-term smoothing is exact; missing lags read 0") {
    // one type, three days with counts 4, 8, 2:
    //   day1: 4/2                      = 2.0
    //   day2: 8/2 + 4/4                = 5.0
    //   day3: 2/2 + 8/4 + 4/8          = 3.5
    val events = ev((1 to 4).map(i =>
      (i.toLong, i.toLong, "t", "2024-01-01 00:00:00", 0.0)) ++
      (5 to 12).map(i => (i.toLong, i.toLong, "t", "2024-01-02 00:00:00", 0.0)) ++
      (13 to 14).map(i => (i.toLong, i.toLong, "t", "2024-01-03 00:00:00", 0.0)): _*)
    val got = EventOps.ewmaDailyOn(events)
      .select(col("day").cast("string"), col("cnt"), col("ewma16"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 4L, 2.0),
      ("2024-01-02", 8L, 5.0),
      ("2024-01-03", 2L, 3.5)))
  }

  test("dow: integer epoch arithmetic; 2024-01-07 is a Sunday (0)") {
    val events = ev(
      (1L, 1L, "t", "2024-01-07 10:00:00", 0.0), // Sunday
      (2L, 1L, "t", "2024-01-08 10:00:00", 0.0), // Monday
      (3L, 1L, "t", "2024-01-08 11:00:00", 0.0))
    val got = EventOps.dowProfileOn(events)
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got === Set(
      ("t", 0, 1L, 0.333333),
      ("t", 1, 2L, 0.666667)))
  }

  test("round-8 event ops: non-degenerate on the real table") {
    assert(EventOps.rfmSegments(spark, sf0001).count() > 0)
    assert(EventOps.interArrival(spark, sf0001).count() > 0)
    val ew = EventOps.ewmaDaily(spark, sf0001)
    assert(ew.filter(col("ewma16") > 0).count() > 0)
    val dp = EventOps.dowProfile(spark, sf0001)
    assert(dp.agg(max(col("dow"))).as[Int].head() <= 6)
  }
}
