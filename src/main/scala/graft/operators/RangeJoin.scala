package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows at time `t` matched to
  * right rows whose `[start, end]` interval contains `t`, per key.
  *
  * Spark plans a raw `t BETWEEN start AND end` predicate as a broadcast
  * nested-loop — quadratic at scale. The scalable composition: explode
  * each right interval into its covering day buckets, equi-join on
  * (key, day) — hash shuffle, codegen — then apply the exact containment
  * filter. Bucket fan-out = interval length in days, a small constant for
  * bounded intervals.
  */
object RangeJoin {

  /** `left(key, t, …)` ⋈ `right(key, start, end, …)` with
    * `start ≤ t ≤ end`. `t`, `start`, `end` are timestamp columns.
    */
  def bucketedRangeJoin(left: DataFrame, right: DataFrame,
      key: String, t: String, start: String, end: String): DataFrame = {
    val l = left.withColumn("__day", to_date(col(t)))
    val r = right.withColumn("__day",
      explode(sequence(to_date(col(start)), to_date(col(end)))))
    l.join(r, Seq(key, "__day"))
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__day")
  }

  /** q50: events (virtual 1995-era time, as in q49) matched to orders of
    * the same user within ±3 days — pair and distinct-order counts per
    * user.
    */
  def q50RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val events = graft.Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id").as("k"),
        date_add(to_date(lit("1995-01-01")),
          pmod(col("event_id"), lit(2400)).cast("int")).cast("timestamp").as("t"),
        col("event_id"))
    val orders = graft.Tables.orders(spark, dir)
      .filter(col("o_custkey") < 20)
      .select(col("o_custkey").as("k"), col("o_orderkey"),
        (col("o_orderdate") - expr("INTERVAL 3 DAYS")).as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 3 DAYS")).as("w_end"))
    bucketedRangeJoin(events, orders, "k", "t", "w_start", "w_end")
      .groupBy(col("k").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(col("user_id"))
  }
}
