package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** A user's first encounter with an item: emitted exactly once per
  * (user, item) across the whole stream, with the per-user novelty
  * ordinal (1st distinct item, 2nd, …).
  */
case class ItemFirstSeen(user_id: Long, item: Long, first_ts_us: Long,
    item_index: Long)

/** `transformWithState` item-novelty tracker — the 16th streaming
  * operator, covering the one state-store surface the other fifteen
  * don't: Spark 4's typed [[MapState]] (a keyed sub-map per stream
  * key), composed with a [[ValueState]] counter. Each user's seen-item
  * set lives in the map; an event whose item is already present emits
  * nothing, a first encounter emits exactly one append row with the
  * user's running distinct-item count as its ordinal — streaming
  * catalog-discovery / recommendation-novelty feed.
  *
  * Why MapState and not a ValueState[Set]: the map stores ONE state
  * row per (user, item) in RocksDB, so per-key updates are point
  * writes and state size is bounded by live (user, item) pairs — a
  * serialized Set would rewrite the whole blob per event and cap out
  * at the value-size limit exactly when a power user matters most.
  *
  * Determinism: within a microbatch the per-user rows are folded in
  * (ts, event_id) order, so batch placement cannot reorder novelty
  * ordinals; the spec pins stream ≡ batch row-exactly over the landed
  * file plus the cross-batch dedupe with a two-batch MemoryStream
  * fixture. Requires the RocksDB state store
  * ([[LifetimeStatsStream.rocksConf]]).
  */
object ItemNoveltyStream {

  private class NoveltyProcessor
      extends StatefulProcessor[Long, (Long, Long, Long, Long), ItemFirstSeen] {
    @transient private var seen: MapState[Long, Long] = _
    @transient private var nDistinct: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      seen = getHandle.getMapState[Long, Long]("seen",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      nDistinct = getHandle.getValueState[Long]("n_distinct",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        timerValues: TimerValues): Iterator[ItemFirstSeen] = {
      // (user_id, item, ts_us, event_id) — fold in event-time order so
      // ordinals are independent of microbatch-internal row order
      val sorted = rows.toSeq.sortBy(r => (r._3, r._4))
      var nd = if (nDistinct.exists()) nDistinct.get() else 0L
      val out = Seq.newBuilder[ItemFirstSeen]
      sorted.foreach { case (_, item, tsUs, _) =>
        if (!seen.containsKey(item)) {
          nd += 1L
          seen.updateValue(item, 1L)
          out += ItemFirstSeen(key, item, tsUs, nd)
        }
      }
      nDistinct.update(nd)
      out.result().iterator
    }
  }

  /** The first-seen feed over any events frame (streaming). Append
    * mode: each (user, item) row is emitted once, ever.
    */
  def firstSeen(events: DataFrame): Dataset[ItemFirstSeen] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new NoveltyProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Drive synchronously over the staged landing zone. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "item_novelty"): DataFrame = {
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    EventsStream.runToMemoryTable(spark,
      firstSeen(EventsStream.stagedEventsStream(spark, dir,
        "graft-novelty-stream")).toDF(),
      queryName, "append")
  }

  /** Batch twin: the same first-seen rows and ordinals relationally —
    * one user_id-partitioned window pair (first occurrence per
    * (user, item), then the per-user ordinal over the survivors).
    */
  def firstSeenBatch(ev: DataFrame): DataFrame = {
    val base = ev
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val wFirst = Window.partitionBy(col("user_id"), col("item"))
      .orderBy(col("ts_us"), col("event_id"))
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    base.withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .withColumn("item_index", row_number().over(wOrd).cast("long"))
      .select(col("user_id"), col("item"), col("ts_us").as("first_ts_us"),
        col("item_index"))
  }

  /** q255's gate surface: the batch twin bounded to the first
    * `maxUser` users (the full feed is corpus-sized; the gate pins
    * the semantics on a bounded slice).
    */
  def firstSeenGate(spark: SparkSession, dir: String,
      maxUser: Long = 20L): DataFrame =
    firstSeenBatch(graft.Tables.events(spark, dir))
      .filter(col("user_id") < maxUser)
      .orderBy(col("user_id"), col("item_index"))
}
