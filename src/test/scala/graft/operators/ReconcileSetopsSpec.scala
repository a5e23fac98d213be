package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch H: full-outer reconciliation (q185), INTERSECT/EXCEPT
  * churn (q186), RANGE-frame rolling revenue (q187).
  */
class ReconcileSetopsSpec extends SparkSpecBase {

  test("q185: statuses partition the day set; unmatched sides survive") {
    val out = CoreQueries.q185DailyReconcile(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byStatus = out.groupBy(_.getString(3)).view.mapValues(_.length).toMap
    // order dates and ship dates only partially overlap in this data
    assert(byStatus.getOrElse("both", 0) > 0)
    assert(byStatus.getOrElse("ship_only", 0) > 0)
    // full outer keeps every day from either side exactly once
    val oDays = graft.Tables.orders(spark, sf0001)
      .select(to_date(col("o_orderdate"))).distinct().count()
    val sDays = graft.Tables.lineitem(spark, sf0001)
      .select(to_date(col("l_shipdate"))).distinct().count()
    val bothDays = byStatus.getOrElse("both", 0).toLong
    assert(out.length.toLong === oDays + sDays - bothDays)
    // ship_only rows report zero orders; orders_only rows zero revenue
    out.filter(_.getString(3) == "ship_only")
      .foreach(r => assert(r.getLong(1) === 0L))
    out.filter(_.getString(3) == "orders_only")
      .foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("q186: cohorts reconcile with the distinct buyer sets") {
    val out = CoreQueries.q186ChurnSetops(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.keySet === Set("acquired", "churned", "retained"))
    def buyers(y: Int) = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit(s"$y-01-01") &&
        col("o_orderdate") < lit(s"${y + 1}-01-01"))
      .select(col("o_custkey")).distinct().count()
    assert(out("retained") + out("churned") === buyers(1996))
    assert(out("retained") + out("acquired") === buyers(1997))
  }

  test("q187: range frame narrows over calendar gaps; recompute one day") {
    val out = CoreQueries.q187RollingRevenue(spark, sf0001).collect()
    assert(out.nonEmpty)
    // the window never spans more than 7 calendar days
    out.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(3) <= 7L))
    // driver-side recompute of the trailing sum for the 10th day
    val days = out.map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
    val target = days(9)
    val expect = days.filter { case (d, _) =>
      !d.isAfter(target._1) && !d.isBefore(target._1.minusDays(6))
    }.map(_._2).sum
    // the recompute sums 2dp-DISPLAY values, so up to 7 half-cent
    // rounding residues separate it from the engine's exact-cent sum
    assert(math.abs(out(9).getDouble(2) - expect) < 0.05)
  }
}
