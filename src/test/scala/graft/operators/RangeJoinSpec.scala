package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {

  test("bucketed range join ≡ naive inequality join; no nested-loop plan") {
    val events = graft.Tables.events(spark, sf0001)
      .filter(col("user_id") < 20)
      .select(col("user_id").as("k"),
        date_add(to_date(lit("1995-01-01")),
          pmod(col("event_id"), lit(2400)).cast("int")).cast("timestamp").as("t"),
        col("event_id"))
    val orders = graft.Tables.orders(spark, sf0001)
      .filter(col("o_custkey") < 20)
      .select(col("o_custkey").as("ok"), col("o_orderkey"),
        (col("o_orderdate") - expr("INTERVAL 3 DAYS")).as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("w_end"))

    val naive = events.join(orders,
        col("k") === col("ok") && col("t") >= col("w_start") && col("t") <= col("w_end"))
      .select(col("event_id"), col("o_orderkey"))
    val bucketed = RangeJoin.bucketedRangeJoin(
        events, orders.withColumnRenamed("ok", "k"), "k", "t", "w_start", "w_end")
      .select(col("event_id"), col("o_orderkey"))

    assert(bucketed.exceptAll(naive).isEmpty && naive.exceptAll(bucketed).isEmpty)
    assert(bucketed.count() > 0)

    // the bucketed plan must be a hash join, not a nested loop
    bucketed.collect()
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"), plan)
  }
}
