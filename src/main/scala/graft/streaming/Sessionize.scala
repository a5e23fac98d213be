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
  /** start/last are epoch MICROSECONDS — ms-truncated `Timestamp.getTime`
    * arithmetic would disagree with the batch q58 ground truth on
    * exact-boundary gaps.
    */
  case class SessionState(start: Long, last: Long, n: Int)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Int)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def sessionizeGroup(gapUs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[UserSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(s =>
        UserSession(userId, toTs(s.start), toTs(s.last), s.n)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => micros(e.ts))
    val closed = Seq.newBuilder[UserSession]
    var cur = state.getOption
    // late events (more than a gap BEFORE the open session) are gap-
    // sessionized among THEMSELVES before emission: two same-batch late
    // events of one pre-watermark session must come out as one session,
    // not two singletons (they still cannot merge with sessions emitted in
    // earlier batches — inherent to append-mode streaming)
    var lateCur: Option[SessionState] = None
    sorted.foreach { e =>
      val t = micros(e.ts)
      cur match {
        // within one gap of the session interval on either side: merge,
        // extending the boundary (a late cross-batch event can legitimately
        // precede session_start)
        case Some(s) if t >= s.start - gapUs && t - s.last <= gapUs =>
          var ns = SessionState(math.min(s.start, t), math.max(s.last, t), s.n + 1)
          // a late chain that reaches within one gap of the (possibly
          // extended) session start belongs to the same batch session
          lateCur match {
            case Some(ls) if ns.start - ls.last <= gapUs =>
              ns = SessionState(ls.start, ns.last, ns.n + ls.n)
              lateCur = None
            case _ => ()
          }
          cur = Some(ns)
        // after the gap: close the session, start a new one
        case Some(s) if t - s.last > gapUs =>
          closed += UserSession(userId, toTs(s.start), toTs(s.last), s.n)
          cur = Some(SessionState(t, t, 1))
        // late event: accumulate into the open late mini-session, closing
        // it whenever the within-late gap is exceeded
        case Some(_) =>
          lateCur match {
            case Some(ls) if t - ls.last <= gapUs =>
              lateCur = Some(SessionState(ls.start, math.max(ls.last, t), ls.n + 1))
            case Some(ls) =>
              closed += UserSession(userId, toTs(ls.start), toTs(ls.last), ls.n)
              lateCur = Some(SessionState(t, t, 1))
            case None =>
              lateCur = Some(SessionState(t, t, 1))
          }
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    // flush any late mini-session that never reached the open session
    lateCur.foreach { ls =>
      closed += UserSession(userId, toTs(ls.start), toTs(ls.last), ls.n)
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp((s.last + gapUs) / 1000L) // timeout API is ms
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
        sessionizeGroup(gapMinutes * 60000000L))
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
