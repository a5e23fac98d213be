package graft.streaming

import graft.SparkSpecBase

class SessionizeSpec extends SparkSpecBase {

  test("group logic: gap splits sessions, counts and bounds correct") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Iterator(
      Sessionize.SessionEvent(7, ts(0), "view"),
      Sessionize.SessionEvent(7, ts(10), "click"),
      Sessionize.SessionEvent(7, ts(100), "view"), // > 30min gap → new session
      Sessionize.SessionEvent(7, ts(105), "purchase"))
    val state = new TestGroupState[Sessionize.SessionState]
    val closed = Sessionize.sessionizeGroup(30 * 60000000L)(7, events, state).toSeq
    assert(closed.map(s => (s.session_start, s.session_end, s.n_events))
      === Seq((ts(0), ts(10), 2)))
    assert(state.updated.exists(_.n == 2)) // open session carried in state
  }

  test("late cross-batch events: within-gap merges backwards, beyond-gap isolates") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    def us(min: Long) = min * 60000000L // state tracks epoch micros
    val state = new TestGroupState[Sessionize.SessionState]
    state.update(Sessionize.SessionState(us(100), us(110), 3))
    // one event 20min before start (within gap → merge + extend start),
    // one event 90min before start (beyond gap → own closed session)
    val closed = Sessionize.sessionizeGroup(30 * 60000000L)(7, Iterator(
      Sessionize.SessionEvent(7, ts(80), "late-merge"),
      Sessionize.SessionEvent(7, ts(10), "late-isolated")), state).toSeq
    assert(closed.map(s => (s.session_start, s.session_end, s.n_events))
      === Seq((ts(10), ts(10), 1)))
    assert(state.updated.contains(Sessionize.SessionState(us(80), us(110), 4)))
  }

  test("same-batch late events of one pre-watermark session emit as ONE session") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    def us(min: Long) = min * 60000000L
    val state = new TestGroupState[Sessionize.SessionState]
    state.update(Sessionize.SessionState(us(200), us(210), 3))
    // three late events: 10 and 25 are one gap-chained session; 100 is a
    // separate late singleton (75min after 25, >30min gap)
    val closed = Sessionize.sessionizeGroup(30 * 60000000L)(7, Iterator(
      Sessionize.SessionEvent(7, ts(25), "late-b"),
      Sessionize.SessionEvent(7, ts(100), "late-solo"),
      Sessionize.SessionEvent(7, ts(10), "late-a")), state).toSeq
    assert(closed.map(s => (s.session_start, s.session_end, s.n_events)).toSet
      === Set((ts(10), ts(25), 2), (ts(100), ts(100), 1)))
    // open session untouched
    assert(state.updated.contains(Sessionize.SessionState(us(200), us(210), 3)))
  }

  test("late chain reaching within one gap of the open session merges into it") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    def us(min: Long) = min * 60000000L
    val state = new TestGroupState[Sessionize.SessionState]
    state.update(Sessionize.SessionState(us(100), us(110), 2))
    // 45 is >gap before start(100); 75 chains to 45 (30min) AND is within
    // one gap of start → the whole chain belongs to the open session
    val closed = Sessionize.sessionizeGroup(30 * 60000000L)(7, Iterator(
      Sessionize.SessionEvent(7, ts(45), "chain-a"),
      Sessionize.SessionEvent(7, ts(75), "chain-b")), state).toSeq
    assert(closed.isEmpty, closed.mkString(","))
    assert(state.updated.contains(Sessionize.SessionState(us(45), us(110), 4)))
  }

  test("streaming closed sessions ⊆ batch-windowed ground truth") {
    import org.apache.spark.sql.functions._
    val streamed = Sessionize.runOnce(spark, sf0001, queryName = "sess_vs_batch")
      .toDF().select(col("user_id"), col("session_start").cast("timestamp_ntz"),
        col("session_end").cast("timestamp_ntz"), col("n_events"))
    val batch = graft.operators.CoreQueries.q58SessionsBatch(spark, sf0001)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
    // every closed streaming session must exist verbatim in the batch result
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty,
      "streaming emitted a session absent from the batch ground truth")
  }

  test("streaming sessionization over events emits closed sessions") {
    val got = Sessionize.runOnce(spark, sf0001).collect()
    assert(got.nonEmpty) // inter-event gaps exceed 30min routinely
    assert(got.forall(s => !s.session_end.before(s.session_start)))
    assert(got.forall(_.n_events >= 1))
    // sessions of one user never overlap
    got.groupBy(_.user_id).values.foreach { ss =>
      val sorted = ss.sortBy(_.session_start.getTime)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.session_end.getTime < b.session_start.getTime)
      }
    }
  }
}

/** Minimal GroupState stub for unit-testing the group function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var updated: Option[S] = None
  var timeout: Option[Long] = None
  override def exists: Boolean = updated.isDefined
  override def get: S = updated.get
  override def getOption: Option[S] = updated
  override def update(s: S): Unit = updated = Some(s)
  override def remove(): Unit = updated = None
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = timeout = Some(t)
  override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
