package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOf: most recent right row at or before left time, per key") {
    val left = Seq(
      (1L, ts("2020-01-05 00:00:00"), "e1"),
      (1L, ts("2020-01-10 00:00:00"), "e2"),
      (1L, ts("2020-01-02 00:00:00"), "e0"), // before any right row → null
      (2L, ts("2020-01-05 00:00:00"), "e3"), // key with no right rows
      (1L, ts("2020-01-03 00:00:00"), "eq")) // exactly at right time → inclusive
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, ts("2020-01-03 00:00:00"), 100),
      (1L, ts("2020-01-08 00:00:00"), 200))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t").collect()
      .map(r => r.getAs[String]("name") -> Option(r.getAs[Any]("v"))).toMap
    assert(got("e0") === None)
    assert(got("e1") === Some(100))
    assert(got("eq") === Some(100)) // inclusive ≤
    assert(got("e2") === Some(200))
    assert(got("e3") === None)
  }

  test("asOf ≡ naive join-filter-rank on testdata slice") {
    val q = AsOfJoin.q49EventsAsOfOrders(spark, sf0001)
    val events = graft.Tables.events(spark, sf0001)
      .filter(col("user_id") < 20)
      .select(col("user_id").as("k"),
        date_add(to_date(lit("1995-01-01")),
          pmod(col("event_id"), lit(2400)).cast("int")).cast("timestamp").as("t"),
        col("event_id"))
    val orders = graft.Tables.orders(spark, sf0001)
      .filter(col("o_custkey") < 20)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("ot"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    // naive: pair blow-up + rank (correct but unscalable reference impl)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("ot").desc)
    val naive = events.join(orders,
        events("k") === orders("k") && col("ot") <= col("t"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("o_orderkey"))
    val qPairs = q.select(col("event_id"), col("o_orderkey"))
    assert(qPairs.exceptAll(naive).isEmpty && naive.exceptAll(qPairs).isEmpty)
  }
}
