package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** One inactivity alert: the user fell silent at `last_seen` after
  * `n_events` events in the burst that just closed.
  */
case class QuietAlert(user_id: Long, last_seen: java.sql.Timestamp,
    n_events: Long)

/** Per-key timer bookkeeping: latest activity, burst size, and the
  * expiry of the CURRENTLY ARMED timer (needed to disarm it on new
  * activity — timers are addressed by their expiry timestamp).
  */
case class QuietState(last_ms: Long, n: Long, armed_ms: Long)

/** Event-time TIMER alerting — the StatefulProcessor surface
  * [[LifetimeStatsStream]] doesn't touch: `registerTimer` +
  * `handleExpiredTimer`. Each user's activity re-arms an inactivity
  * timer at `last_seen + gap`; when the WATERMARK passes that expiry
  * the timer fires, emits one [[QuietAlert]] for the closed burst, and
  * clears the state — the live "user went quiet" signal whose batch
  * counterpart is the q58/q220 session boundary (one alert per closed
  * session).
  *
  * Emission contract (spec-pinned): alerts fire per OBSERVED quiet
  * period — activity arriving in a later microbatch after an alert
  * starts a fresh burst (batch-exact when each session's rows arrive
  * before its gap elapses in watermark time, the live regime); rows of
  * one user landing in a single batch FOLD into one burst even if they
  * span an event-time gap (the stream cannot subdivide history it sees
  * at once without buffering it — the documented trade, pinned by its
  * own fixture). Late rows behind the watermark are dropped by the
  * operator before the processor sees them.
  *
  * State bound: one fixed-width row + one armed timer per ACTIVE user;
  * both clear at alert time, so steady-state size tracks
  * currently-active users, not lifetime users. Requires the RocksDB
  * state store ([[LifetimeStatsStream.rocksConf]]).
  */
object QuietAlertStream {

  private class QuietProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, java.sql.Timestamp), QuietAlert] {
    @transient private var state: ValueState[QuietState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QuietState]("quiet",
        Encoders.product[QuietState], TTLConfig.NONE)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[QuietAlert] = {
      val prev = if (state.exists()) state.get() else QuietState(Long.MinValue, 0L, Long.MinValue)
      var (last, n) = (prev.last_ms, prev.n)
      rows.foreach { case (_, ts) =>
        n += 1L; if (ts.getTime > last) last = ts.getTime
      }
      // re-arm: disarm the previous timer (timers are keyed by expiry)
      // and arm at the new quiet horizon
      if (prev.armed_ms != Long.MinValue) getHandle.deleteTimer(prev.armed_ms)
      getHandle.registerTimer(last + gapMs)
      state.update(QuietState(last, n, last + gapMs))
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[QuietAlert] = {
      // a fired timer is always the armed one (re-arms delete stale
      // timers), but guard against a cleared key anyway
      if (!state.exists()) Iterator.empty
      else {
        val s = state.get()
        state.clear()
        Iterator.single(
          QuietAlert(key, new java.sql.Timestamp(s.last_ms), s.n))
      }
    }
  }

  /** Live inactivity alerts over a watermarked events frame. `delay`
    * is the lateness allowance (watermark delay); `gap` the silence
    * that closes a burst.
    */
  def quietAlerts(events: DataFrame, delay: String = "0 seconds",
      gapMs: Long = 30L * 60L * 1000L): Dataset[QuietAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", delay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new QuietProcessor(gapMs), TimeMode.EventTime(),
        OutputMode.Append())
  }
}
