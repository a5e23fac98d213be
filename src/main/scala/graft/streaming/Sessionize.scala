package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Stateful streaming: gap-based sessionization of the events stream via
  * `flatMapGroupsWithState` — the custom-state surface (SURVEY.md §2.10)
  * the reference's batch-plus-append design cannot express. State is one
  * small record per live user; completed sessions are emitted as soon as
  * the in-stream gap is observed, and residual state is flushed on
  * event-time timeout past the watermark.
  */
object Sessionize {

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  def sessionizeGroup(gapMs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s =>
        UserSession(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    val closed = Seq.newBuilder[UserSession]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        // within one gap of the session interval on either side: merge,
        // extending the boundary (a late cross-batch event can legitimately
        // precede session_start)
        case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
          cur = Some(SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
        // after the gap: close the session, start a new one
        case Some(s) if t - s.last > gapMs =>
          closed += UserSession(userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        // late event more than a gap BEFORE the open session: it belongs
        // to an already-gone earlier session — emit it as its own closed
        // single-event session, keep the open one untouched
        case Some(_) =>
          closed += UserSession(userId, new java.sql.Timestamp(t),
            new java.sql.Timestamp(t), 1)
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    closed.result().iterator
  }

  /** Streaming sessionization over the events landing dir. */
  def sessions(spark: SparkSession, dir: String,
      gapMinutes: Int = 30): Dataset[UserSession] = {
    import spark.implicits._
    EventsStream.stagedEventsStream(spark, dir, "graft-sessionize")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionizeGroup(gapMinutes * 60000L))
  }

  /** Drive synchronously over the staged files; returns closed sessions. */
  def runOnce(spark: SparkSession, dir: String, gapMinutes: Int = 30,
      queryName: String = "sessions"): Dataset[UserSession] = {
    import spark.implicits._
    EventsStream.runToMemoryTable(spark,
      sessions(spark, dir, gapMinutes).toDF(), queryName, "append")
      .as[UserSession]
  }
}
