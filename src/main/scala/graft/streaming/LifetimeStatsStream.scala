package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-user lifetime running stats. */
case class UserLifetime(user_id: Long, n_events: Long, value_c: Long,
    max_value_c: Long)

/** The persisted per-key state behind [[UserLifetime]]. */
case class LifetimeState(n: Long, sum_c: Long, max_c: Long)

/** `transformWithState` lifetime tracker — the 12th streaming operator,
  * covering the arbitrary-stateful API the other eleven don't: Spark
  * 4's StatefulProcessor (transformWithState, the successor surface to
  * flatMapGroupsWithState used by Sessionize/DedupStream/FunnelStream)
  * with an explicit typed [[ValueState]] cell per user. Tracks each
  * user's lifetime event count, exact integer-cent value sum, and max
  * single-event value — the running customer-lifetime-value panel a
  * warehouse keeps hot.
  *
  * Stream ≡ batch holds on the FINAL per-user row: count/sum/max are
  * commutative-associative folds, so whatever microbatch placement
  * delivers the rows, the last Update-mode emission per user equals
  * the batch aggregate over the same landed file (the SketchStream
  * final-state protocol; spec gates it cell-for-cell and pins the
  * cross-batch carry with a two-batch MemoryStream fixture).
  *
  * Scale/ops notes: transformWithState REQUIRES the RocksDB state
  * store provider ([[rocksConf]] — the HDFS-backed default store
  * rejects the operator), which is also the store that keeps large
  * state off-heap in production. State is ONE fixed-width row per
  * user; [[TTLConfig]] is the retention knob (NONE here — lifetime
  * semantics — but a `TTLConfig(Duration.ofDays(90))` turns this into
  * a rolling-window CLV with zero code change, the reason to reach
  * for this API over flatMapGroupsWithState's manual timeout
  * bookkeeping).
  */
object LifetimeStatsStream {

  /** The conf pair a session needs before starting this query. */
  val rocksConf: (String, String) =
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private class LifetimeProcessor
      extends StatefulProcessor[Long, (Long, Long), UserLifetime] {
    @transient private var state: ValueState[LifetimeState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[LifetimeState]("lifetime",
        Encoders.product[LifetimeState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[UserLifetime] = {
      val prev =
        if (state.exists()) state.get() else LifetimeState(0L, 0L, Long.MinValue)
      var (n, sum, mx) = (prev.n, prev.sum_c, prev.max_c)
      rows.foreach { case (_, v) =>
        n += 1L; sum += v; if (v > mx) mx = v
      }
      state.update(LifetimeState(n, sum, mx))
      Iterator.single(UserLifetime(key, n, sum, mx))
    }
  }

  /** The running per-user panel over any events frame (streaming).
    * Update mode: each microbatch re-emits the users it touched; the
    * latest row per user is the panel.
    */
  def lifetimeStats(events: DataFrame): Dataset[UserLifetime] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("value_c"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new LifetimeProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** The batch twin: the same integer-cent folds as one aggregate. */
  def lifetimeStatsBatch(events: DataFrame): DataFrame =
    events
      .select(col("user_id"),
        round(col("value") * 100, 0).cast("long").as("value_c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value_c")).as("value_c"),
        max(col("value_c")).as("max_value_c"))

  /** Drive synchronously over the staged events landing zone. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "lifetime_stats"): DataFrame = {
    spark.conf.set(rocksConf._1, rocksConf._2)
    EventsStream.runToMemoryTable(spark,
      lifetimeStats(
        EventsStream.stagedEventsStream(spark, dir, "graft-lifetime-stream"))
        .toDF(),
      queryName, "update")
  }
}
