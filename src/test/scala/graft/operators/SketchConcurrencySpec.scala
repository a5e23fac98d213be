package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch F: CMS self-join-size estimate (q179), two-phase peak
  * concurrency (q180), CUBE grouping (q181).
  */
class SketchConcurrencySpec extends SparkSpecBase {
  import spark.implicits._

  test("q179: estimate over-bounds the exact F2; exact side recomputed") {
    val r = CoreQueries.q179SelfJoinSketch(spark, sf0001).collect().head
    val exact = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n"))).head().getLong(0)
    assert(r.getLong(1) === exact)
    assert(r.getLong(2) >= r.getLong(1)) // CMS inner product over-estimates
    assert(r.getInt(3) === 1)
    assert(r.getDouble(4) >= 1.0)
  }

  test("q180: two-phase peak equals the naive global running sum") {
    import org.apache.spark.sql.expressions.Window
    val out = EventOps.peakConcurrency(spark, sf0001).collect()
    assert(out.nonEmpty)
    // naive recompute: ONE global-order window (correct but unscalable)
    val sess = CoreQueries.sessionsOn(graft.Tables.events(spark, sf0001), 30)
    val bounds = sess.select(col("user_id"), col("session_seq"),
        unix_micros(col("session_start")).as("ts_us"), lit(1L).as("delta"))
      .union(sess.select(col("user_id"), col("session_seq"),
        unix_micros(col("session_end")).as("ts_us"), lit(-1L).as("delta")))
    val w = Window.orderBy(col("ts_us"), col("delta").desc,
        col("user_id"), col("session_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = bounds.withColumn("run", sum(col("delta")).over(w))
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      .groupBy(col("day")).agg(max(col("run")).as("peak"))
      .orderBy(col("day")).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    assert(out.map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
      === naive.toSeq)
    // peak is at least 1 on any day with a start, and starts==ends overall
    assert(out.map(_.getLong(2)).sum === out.map(_.getLong(3)).sum)
  }

  test("q180: overlapping and cross-midnight sessions hand-computed") {
    def ts(s: String) = new java.sql.Timestamp(
      java.time.Instant.parse(s).toEpochMilli)
    // u1 23:50–00:10 (crosses midnight), u2 23:55–23:58, u3 00:05–00:08
    val ev = Seq(
      (1L, ts("2024-01-01T23:50:00Z")), (1L, ts("2024-01-02T00:10:00Z")),
      (2L, ts("2024-01-01T23:55:00Z")), (2L, ts("2024-01-01T23:58:00Z")),
      (3L, ts("2024-01-02T00:05:00Z")), (3L, ts("2024-01-02T00:08:00Z")))
      .toDF("user_id", "ts")
    val got = EventOps.peakConcurrencyOn(ev, 30).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // day 1: u1+u2 overlap -> peak 2 (2 starts, 1 end);
    // day 2: u1 still open (carry 1) + u3 -> peak 2 (1 start, 2 ends)
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 1L), ("2024-01-02", 2L, 1L, 2L)))
  }

  test("q181: cube totals are consistent across grouping levels") {
    val out = CoreQueries.q181Cube(spark, sf0001).collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val nLines = graft.Tables.lineitem(spark, sf0001).count()
    assert(grand.head.getLong(2) === nLines)
    // the flag-marginal rows sum to the grand total (CUBE adds the
    // status marginals ROLLUP lacks)
    val flagMarginals = out.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    val statusMarginals = out.filter(r => r.isNullAt(0) && !r.isNullAt(1))
    assert(flagMarginals.map(_.getLong(2)).sum === nLines)
    assert(statusMarginals.map(_.getLong(2)).sum === nLines)
  }
}
