package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel: the stateful dual of the batch funnel
  * (`EventOps.funnel`, q103). Per-user state is the four
  * earliest-achievement times; each incoming event can advance the
  * user's funnel by at most one stage (stage n only strictly after
  * stage n−1), and every advancement is emitted immediately as an
  * append-mode record — the real-time view a growth dashboard tails,
  * where the batch report is the nightly rollup.
  *
  * Greedy processing in event-time order is EXACTLY the batch
  * semantics: the first eligible stage-n event in ascending ts is the
  * minimal one, so for an in-order feed the streamed advancement set
  * equals the batch `funnelStageTimes` cell-for-cell (the spec gates
  * this). State is four longs per live user — O(users) and bounded,
  * no timeout needed because progression is monotone and final.
  */
object FunnelStream {

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  /** Stage achievement times, epoch µs, -1 = not reached. */
  case class FunnelState(t1: Long, t2: Long, t3: Long, t4: Long)
  case class StageAdvance(user_id: Long, stage: Int, event_type: String,
      ts: java.sql.Timestamp)

  private val Stages = Vector("signup", "view", "click", "purchase")

  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def advanceGroup(userId: Long, events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[StageAdvance] = {
    var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L, -1L))
    val out = Seq.newBuilder[StageAdvance]
    // sort within the batch so greedy = batch-min even when one
    // micro-batch carries several of a user's events
    events.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
      val t = micros(e.ts)
      Stages.indexOf(e.event_type) match {
        case 0 if s.t1 < 0 =>
          s = s.copy(t1 = t); out += StageAdvance(userId, 1, e.event_type, e.ts)
        case 1 if s.t2 < 0 && s.t1 >= 0 && t > s.t1 =>
          s = s.copy(t2 = t); out += StageAdvance(userId, 2, e.event_type, e.ts)
        case 2 if s.t3 < 0 && s.t2 >= 0 && t > s.t2 =>
          s = s.copy(t3 = t); out += StageAdvance(userId, 3, e.event_type, e.ts)
        case 3 if s.t4 < 0 && s.t3 >= 0 && t > s.t3 =>
          s = s.copy(t4 = t); out += StageAdvance(userId, 4, e.event_type, e.ts)
        case _ => ()
      }
    }
    state.update(s)
    out.result().iterator
  }

  /** The streaming advancement feed over the staged events stream. */
  def advances(spark: SparkSession, dir: String): Dataset[StageAdvance] = {
    import spark.implicits._
    EventsStream.stagedEventsStream(spark, dir, "graft-funnel")
      .select(col("user_id"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        advanceGroup)
  }

  /** Drive synchronously over the staged files; returns all advancements. */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "funnel_advances"): Dataset[StageAdvance] = {
    import spark.implicits._
    EventsStream.runToMemoryTable(spark,
      advances(spark, dir).toDF(), queryName, "append")
      .as[StageAdvance]
  }
}
