package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-type transitions: the stateful dual of the batch
  * transition matrix (`EventOps.eventTransitions`, q126). Per-user state
  * is the single LAST event under the (ts, event_id) total order; each
  * arriving event emits one (prev_type, event_type) transition record
  * append-mode. Aggregating the emitted feed reproduces the batch
  * transition counts EXACTLY for an in-order feed (the spec gates
  * count-for-count equality on the staged events table), because both
  * sides pair each event with its unique total-order predecessor.
  *
  * State is one (ts µs, event_id, type) triple per live user — O(users)
  * and constant per user, the minimal sequence-mining state.
  */
object TransitionStream {

  case class TransEvent(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  case class LastEvent(tsMicros: Long, eventId: Long, eventType: String)
  case class Transition(user_id: Long, prev_type: String, event_type: String)

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def advanceGroup(userId: Long, events: Iterator[TransEvent],
      state: GroupState[LastEvent]): Iterator[Transition] = {
    var last = state.getOption.orNull
    val out = Seq.newBuilder[Transition]
    // order within the micro-batch by the same total order as the batch
    // window (ts, event_id) so chained transitions inside one batch
    // resolve identically
    events.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      if (last != null)
        out += Transition(userId, last.eventType, e.event_type)
      last = LastEvent(micros(e.ts), e.event_id, e.event_type)
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** The streaming transition feed over the staged events stream. */
  def transitions(spark: SparkSession, dir: String): Dataset[Transition] = {
    import spark.implicits._
    EventsStream.stagedEventsStream(spark, dir, "graft-transitions")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[TransEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advanceGroup)
  }

  /** Drive synchronously over the staged files; returns the feed. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "transition_feed"): Dataset[Transition] = {
    import spark.implicits._
    EventsStream.runToMemoryTable(spark,
      transitions(spark, dir).toDF(), queryName, "append")
      .as[Transition]
  }
}
