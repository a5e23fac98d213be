package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Stream ≡ batch gate for the NATIVE session_window aggregation — the
  * state-store sessions over the landed file must equal the batch
  * session_window over the same rows (append mode emits only
  * watermark-closed sessions; AvailableNow over one staged file closes
  * everything).
  */
class SessionWindowStreamSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming session_window equals batch up to the open tail") {
    val streamed = EventsStream.runToMemoryTable(spark,
      EventsStream.sessionCounts(spark, sf0001),
      "session_window_stream", "append")
      .as[(Long, java.sql.Timestamp, Long)].collect().toSet
    // append mode emits only WATERMARK-CLOSED sessions: with a 1-day
    // delay over one staged file, sessions ending within the last day
    // of event time legitimately stay open — the batch side models that
    // cutoff explicitly so the gate is exact, not approximate
    val maxTs = graft.Tables.events(spark, sf0001)
      .agg(max($"ts")).as[java.sql.Timestamp].head()
    val cutoff = new java.sql.Timestamp(
      maxTs.getTime - 24L * 3600 * 1000)
    val batchAll = graft.Tables.events(spark, sf0001)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("session_start"))
      .select($"user_id", $"session_start", $"n_events",
        $"session_window.end".as("session_end"))
      .as[(Long, java.sql.Timestamp, Long, java.sql.Timestamp)].collect()
    val closed = batchAll.filter(_._4.getTime <= cutoff.getTime)
      .map(r => (r._1, r._2, r._3)).toSet
    val open = batchAll.filter(_._4.getTime > cutoff.getTime)
      .map(r => (r._1, r._2, r._3)).toSet
    // every watermark-closed batch session streamed, nothing else did
    assert(closed.subsetOf(streamed), "closed sessions missing from stream")
    assert((streamed -- closed).subsetOf(open),
      "stream emitted a session batch doesn't have")
    assert(streamed.nonEmpty && closed.nonEmpty)
  }
}
