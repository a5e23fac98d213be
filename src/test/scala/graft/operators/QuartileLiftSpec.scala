package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch M: exact histogram quartiles (q196) and brand-basket
  * lift (q197).
  */
class QuartileLiftSpec extends SparkSpecBase {
  import spark.implicits._

  test("valueQuartiles: rank rules on even and odd group sizes") {
    // type A: values 1..4 (even n): p25=(1+2)/2? no — n=4: q=1: qn=4%4=0
    //   -> (v1+v2)/2 = 1.5; p50 -> (v2+v3)/2 = 2.5; p75 -> (v3+v4)/2=3.5
    // type B: values 10,20,30 (odd-ish): n=3: qn=3 -> ceil(3/4)=1 -> v1;
    //   p50: qn=6 -> ceil(6/4)=2 -> v2=20; p75: qn=9 -> ceil(9/4)=3 -> v3
    val ev = (1 to 4).map(i => ("A", i.toDouble)) ++
      Seq(("B", 10.0), ("B", 20.0), ("B", 30.0))
    val df = ev.toDF("event_type", "value")
    val got = EventOps.valueQuartilesOn(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq(
      ("A", 4L, 1.5, 2.5, 3.5),
      ("B", 3L, 10.0, 20.0, 30.0)))
  }

  test("valueQuartiles: agrees with driver-side exact quantiles on sf0.001") {
    val out = EventOps.valueQuartiles(spark, sf0001).collect()
    assert(out.nonEmpty)
    val rows = graft.Tables.events(spark, sf0001)
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    out.foreach { r =>
      val s = rows(r.getString(0)).map(_._2).sorted
      val n = s.length
      def quart(q: Int): Double = {
        val twice = if (n * q % 4 == 0) {
          val lo = s(n * q / 4 - 1)
          val hi = if (n * q / 4 < n) s(n * q / 4) else lo
          lo + hi
        } else 2L * s(math.ceil(n * q / 4.0).toInt - 1)
        BigDecimal(twice.toDouble / 200.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(r.getLong(1) === n.toLong)
      assert(r.getDouble(2) === quart(1))
      assert(r.getDouble(3) === quart(2))
      assert(r.getDouble(4) === quart(3))
    }
  }

  test("q197: lift recomputed for the top pair; ordering total") {
    val out = CoreQueries.q197BasketLift(spark, sf0001, minSupport = 1)
      .collect()
    assert(out.nonEmpty)
    val top = out.head
    val ob = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
    val nOrders = graft.Tables.orders(spark, sf0001).count()
    val nA = ob.filter(col("p_brand") === top.getString(0)).count()
    val nB = ob.filter(col("p_brand") === top.getString(1)).count()
    val nAB = ob.as("x").join(ob.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
        col("x.p_brand") === lit(top.getString(0)) &&
        col("y.p_brand") === lit(top.getString(1))).count()
    assert(top.getLong(2) === nAB)
    val expect = BigDecimal(nAB.toDouble * nOrders / (nA.toDouble * nB))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.getDouble(3) - expect) < 2e-6)
  }
}
