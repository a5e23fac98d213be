package graft.dq

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 DQ batch: generic column profile (q188) and FK cardinality
  * classes (q189).
  */
class ProfileCardinalitySpec extends SparkSpecBase {

  test("q188: per-column counts reconcile with direct queries") {
    val out = DataQuality.columnProfile(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("o_orderkey", "o_custkey", "o_orderstatus",
      "o_orderdate", "o_orderpriority"))
    val orders = graft.Tables.orders(spark, sf0001)
    val n = orders.count()
    out.values.foreach { r =>
      assert(r.getLong(1) === n)
      assert(r.getLong(2) === 0L) // this synthetic table has no nulls
    }
    assert(out("o_orderkey").getLong(3) === n) // PK: all distinct
    val nStatus = orders.select(col("o_orderstatus")).distinct().count()
    assert(out("o_orderstatus").getLong(3) === nStatus)
    // lexicographic min/max on the stringified key
    val keys = orders.select(col("o_orderkey").cast("string"))
      .collect().map(_.getString(0))
    assert(out("o_orderkey").getString(4) === keys.min)
    assert(out("o_orderkey").getString(5) === keys.max)
  }

  test("q189: PK-backed edges are N:1 with consistent totals") {
    val out = DataQuality.fkCardinality(spark, sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    val nLines = graft.Tables.lineitem(spark, sf0001).count()
    Seq("lineitem->orders", "lineitem->part", "lineitem->supplier")
      .foreach { e =>
        assert(out(e).getLong(1) === nLines)
        assert(out(e).getLong(2) <= out(e).getLong(1))
      }
    // orders per customer is many-to-one in this data
    assert(out("orders->customer").getString(4) === "N:1")
    // max_per_key is an actual observed maximum
    val maxOrd = graft.Tables.orders(spark, sf0001)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head().getLong(0)
    assert(out("orders->customer").getLong(3) === maxOrd)
  }
}
