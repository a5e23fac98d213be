package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 time-series/window batch: daily OHLC (q176), ship-latency
  * bands (q177), percent_rank/cume_dist top decile (q178).
  */
class OhlcWindowSpec extends SparkSpecBase {
  import spark.implicits._

  test("dailyOhlc: open/close picked by (ts, event_id), low/high exact") {
    def ts(h: Int) = new java.sql.Timestamp(
      java.time.Instant.parse(f"2024-03-01T$h%02d:00:00Z").toEpochMilli)
    val ev = Seq(
      (1L, ts(9), "click", 5.0),   // open (earliest ts)
      (2L, ts(12), "click", 99.0), // high
      (3L, ts(15), "click", 1.0),  // low
      (4L, ts(18), "click", 42.0), // close (latest ts)
      // ts tie at 18h: event_id 5 > 4, so 5 wins the close
      (5L, ts(18), "view", 7.0), (6L, ts(18), "view", 8.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.dailyOhlcOn(ev).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      ("click", 5.0, 42.0, 1.0, 99.0, 4L),
      // view: same ts — event_id breaks the tie: open=id5, close=id6
      ("view", 7.0, 8.0, 7.0, 8.0, 2L)))
  }

  test("q177: bands partition all lines; truncating div matches on negatives") {
    val out = CoreQueries.q177LatencyBands(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nLines = graft.Tables.lineitem(spark, sf0001).count()
    assert(out.map(_.getLong(2)).sum === nLines)
    // negative latencies exist in this synthetic data; the band rule is
    // truncation toward zero in BOTH engines — pin Spark's side here
    val bands = spark.range(1)
      .select(expr("CAST(-3 AS BIGINT) div 7").as("a"),
        expr("CAST(3 AS BIGINT) div 7").as("b")).head()
    assert(bands.getLong(0) === 0L && bands.getLong(1) === 0L)
  }

  test("q178: every nation's top decile, positions verified") {
    val out = CoreQueries.q178PercentRank(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(3) >= 0.9 && r.getDouble(3) <= 1.0
      && r.getDouble(4) <= 1.0))
    // recompute one nation's positions by sorting driver-side
    val nName = out.head.getString(0)
    val balances = graft.Tables.customer(spark, sf0001)
      .join(graft.Tables.nation(spark, sf0001)
        .filter(col("n_name") === nName),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_acctbal"), col("c_custkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).sorted
    val n = balances.length
    val expect = balances.zipWithIndex.collect {
      case ((_, sk), i) if n > 1 && i.toDouble / (n - 1) >= 0.9 =>
        (sk, BigDecimal(i.toDouble / (n - 1))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal((i + 1).toDouble / n)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = out.filter(_.getString(0) == nName)
      .map(r => (r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === expect.toSeq)
  }
}
