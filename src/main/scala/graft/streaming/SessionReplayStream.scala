package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** One closed session: exact event-time bounds (µs), size, and the
  * purchase rollup.
  */
case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
    n_events: Long, n_purchases: Long, total_c: Long)

/** One buffered event awaiting its session boundary. */
case class ReplayRow(ts_us: Long, is_purchase: Int, value_c: Long)

/** Per-key bookkeeping: the latest event time seen (µs) and the expiry
  * (ms) of the currently armed timer.
  */
case class ReplayMeta(last_us: Long, armed_ms: Long)

/** `transformWithState` gap-sessionizer with a typed [[ListState]]
  * replay buffer — the 17th streaming operator, completing the typed
  * state-store API matrix (ValueState: LifetimeStats, timers:
  * QuietAlert, MapState: ItemNovelty, ListState: here). Events buffer
  * per user; when the inactivity timer fires, the buffer is SPLIT on
  * >gap event-time differences and every closed session is emitted
  * with exact µs bounds and its purchase rollup.
  *
  * Why ListState earns its state: [[QuietAlertStream]]'s fixed-width
  * state documents the trade that one microbatch folding a user's
  * whole history emits ONE burst even across gaps — it cannot
  * subdivide history it sees at once. The replay buffer buys that
  * back: arrival batching CANNOT change the emitted sessions, which
  * the spec pins by driving identical events through a 1-batch and a
  * 2-batch MemoryStream and asserting both match the BATCH
  * sessionization ([[graft.operators.CoreQueries.sessionsOn]]'s
  * semantics, gap boundaries split on strictly-greater µs gaps).
  * ListState stores one RocksDB row per buffered event (point
  * appends, no whole-blob rewrite — the MapState argument applied to
  * an ordered log).
  *
  * Granularity note: timers live on the ms watermark clock while gap
  * splitting is exact µs — a timer can fire up to 1 ms early relative
  * to the µs gap edge, which only affects WHEN sessions flush, never
  * where they split (all closed chunks emit on any fire; an exactly
  * gap-aligned straggler would need sub-ms watermark resolution both
  * engines lack). State bound: buffered events of ACTIVE sessions
  * only — everything clears at flush, so steady-state size tracks
  * in-flight sessions × their length, bounded by watermark delay ×
  * arrival rate. Requires the RocksDB state store
  * ([[LifetimeStatsStream.rocksConf]]).
  */
object SessionReplayStream {

  private class ReplayProcessor(gapUs: Long)
      extends StatefulProcessor[Long, (Long, Long, Int, Long), SessionOut] {
    @transient private var buf: ListState[ReplayRow] = _
    @transient private var meta: ValueState[ReplayMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[ReplayRow]("buf",
        Encoders.product[ReplayRow], TTLConfig.NONE)
      meta = getHandle.getValueState[ReplayMeta]("meta",
        Encoders.product[ReplayMeta], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Long, Int, Long)],
        timerValues: TimerValues): Iterator[SessionOut] = {
      val add = rows.map { case (_, tsUs, isP, vc) =>
        ReplayRow(tsUs, isP, vc)
      }.toArray
      if (add.nonEmpty) {
        buf.appendList(add)
        val prev = if (meta.exists()) meta.get()
          else ReplayMeta(Long.MinValue, Long.MinValue)
        val last = math.max(prev.last_us, add.map(_.ts_us).max)
        val armed = last / 1000L + gapUs / 1000L
        if (prev.armed_ms != Long.MinValue && prev.armed_ms != armed)
          getHandle.deleteTimer(prev.armed_ms)
        if (prev.armed_ms != armed) getHandle.registerTimer(armed)
        meta.update(ReplayMeta(last, armed))
      }
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!meta.exists()) Iterator.empty
      else {
        // the fired timer is the armed one (re-arms delete stale
        // timers), so the user has been quiet past the gap: every
        // buffered chunk is closed — split on strict >gap µs
        // differences and emit each session
        val rows = buf.get().toArray.sortBy(_.ts_us)
        buf.clear()
        meta.clear()
        val out = Seq.newBuilder[SessionOut]
        var i = 0
        while (i < rows.length) {
          var j = i
          while (j + 1 < rows.length &&
            rows(j + 1).ts_us - rows(j).ts_us <= gapUs) j += 1
          val chunk = rows.slice(i, j + 1)
          out += SessionOut(key, chunk.head.ts_us, chunk.last.ts_us,
            chunk.length.toLong,
            chunk.count(_.is_purchase == 1).toLong,
            chunk.map(_.value_c).sum)
          i = j + 1
        }
        out.result().iterator
      }
    }
  }

  /** Live gap sessions over a watermarked events frame. */
  def sessions(events: DataFrame, delay: String = "0 seconds",
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "purchase").cast("int").as("is_purchase"),
        coalesce(round(col("value") * 100, 0).cast("long"), lit(0L))
          .as("value_c"))
      .as[(Long, Long, Int, Long)]
      .groupByKey(_._1)
      .transformWithState(new ReplayProcessor(gapMinutes * 60000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Batch twin: the SAME session summaries relationally, built on the
    * shared q58 session assembly so the definition cannot drift.
    */
  def sessionsBatch(ev: DataFrame, gapMinutes: Int = 30): DataFrame =
    graft.operators.CoreQueries.sessionEventsOn(ev, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long"))
          .as("n_purchases"),
        sum(coalesce(round(col("value") * 100, 0).cast("long"), lit(0L)))
          .as("total_c"))
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events"), col("n_purchases"), col("total_c"))

  /** Drive synchronously over the staged landing zone. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "session_replay"): DataFrame = {
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    EventsStream.runToMemoryTable(spark,
      sessions(EventsStream.stagedEventsStream(spark, dir,
        "graft-replay-stream")).toDF(),
      queryName, "append")
  }
}
