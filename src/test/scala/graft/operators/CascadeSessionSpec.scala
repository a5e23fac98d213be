package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** q133 delete cascade + native session_window ≡ custom sessionization
  * consistency.
  */
class CascadeSessionSpec extends SparkSpecBase {
  import spark.implicits._

  test("deleteCascade: counts agree with independent recomputation") {
    val out = CoreQueries.q133DeleteCascade(spark, sf0001)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.keySet === Set("customer", "orders", "lineitem"))
    val delCust = graft.Tables.customer(spark, sf0001)
      .filter($"c_custkey" % 97 === 0).select("c_custkey")
      .as[Long].collect().toSet
    assert(out("customer")._1 === delCust.size.toLong)
    val delOrders = graft.Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_custkey").as[(Long, Long)].collect()
      .filter(o => delCust(o._2))
    assert(out("orders")._1 === delOrders.length.toLong)
    assert(out("orders")._2 === delOrders.map(_._2).distinct.length.toLong)
    val delOrderKeys = delOrders.map(_._1).toSet
    val li = graft.Tables.lineitem(spark, sf0001)
      .select("l_orderkey").as[Long].collect().filter(delOrderKeys)
    assert(out("lineitem")._1 === li.length.toLong)
    // monotone blast radius: each level fans out
    assert(out("customer")._1 <= out("orders")._1 || out("orders")._1 === 0L)
  }

  test("native session_window agrees with the custom q58 sessionization") {
    // Spark's built-in session_window closes at gap >= 30min ([start,end)
    // windows); q58 splits at gap > 30min. Equal unless some user has a
    // gap of exactly 30:00.000000 — assert on this data they coincide.
    val native = graft.Tables.events(spark, sf0001)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("session_start"))
      .select($"user_id", $"session_start", $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    val custom = CoreQueries.q58SessionsBatch(spark, sf0001)
      .select($"user_id", $"session_start".cast("timestamp"), $"n_events")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    assert(native === custom)
    assert(native.nonEmpty)
  }
}
