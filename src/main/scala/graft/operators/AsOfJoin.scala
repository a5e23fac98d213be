package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: attach to each left row the most recent right row with the
  * same key and time ≤ the left time — the time-series/event-pipeline
  * operator Spark lacks natively.
  *
  * Implementation is the composed single-shuffle union+window plan
  * (preference (a) of the extension ladder — built-ins express the
  * semantics, so no custom LogicalPlan/Strategy is warranted): tag both
  * sides, union on a common schema, sort each key's timeline once, and
  * carry the latest right payload forward with `last(ignoreNulls)` over
  * the running frame. Right rows sort before left rows at equal
  * timestamps, giving inclusive (≤) semantics. One shuffle on the key —
  * this is the plan that survives 100 TB, vs. the naive
  * join-then-filter-then-rank which shuffles the full pair blow-up.
  */
object AsOfJoin {

  /** Left: (key, time, leftPayload...). Right: (key, time, rightPayload...).
    * Returns left rows + `rightPayload` columns of the as-of match (null
    * when no right row precedes the left row).
    */
  def asOf(left: DataFrame, right: DataFrame,
      key: String, time: String): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == time)
    val rightPayload = right.columns.filterNot(c => c == key || c == time)
    val clash = leftPayload.toSet intersect rightPayload.toSet
    require(clash.isEmpty,
      s"asOf payload columns must not collide across sides: ${clash.mkString(",")}")

    val l = left.select(
      Seq(col(key), col(time).as("__t"), lit(1).as("__side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right.select(
      Seq(col(key), col(time).as("__t"), lit(0).as("__side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = rightPayload.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop("__side")
      .withColumnRenamed("__t", time)
  }

  /** q49: each event joined to the user's most recent order at or before
    * the event time. Orders are first reduced to one row per
    * (custkey, orderdate) — both engines need that for a deterministic
    * tie-break. Output bounded to user_id < 20 for the dump.
    */
  def q49EventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    // events live in 2024, orders in 1995-2001 — derive a deterministic
    // virtual event time spread across the orders era so the as-of match
    // actually varies per event
    val events = graft.Tables.events(spark, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id").as("k"),
        date_add(to_date(lit("1995-01-01")),
          pmod(col("event_id"), lit(2400)).cast("int")).cast("timestamp").as("t"),
        col("event_id"))
    val orders = graft.Tables.orders(spark, dir)
      .filter(col("o_custkey") < 20)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    asOf(events, orders, "k", "t")
      .select(col("event_id"), col("k").as("user_id"),
        col("t").cast("date").as("event_date"), col("o_orderkey"))
      .orderBy(col("event_id"))
  }
}
