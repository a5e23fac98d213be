package graft.streaming

import graft.SparkSpecBase

/** Streaming sliding-window counts ≡ batch, cell-exact: window
  * membership is a pure function of each event's own time and
  * per-window counts are commutative sums, so microbatch placement
  * cannot change any cell.
  */
class BurstStreamSpec extends SparkSpecBase {

  test("streamed sliding counts equal the batch window() rows cell-for-cell") {
    val streamed = BurstStream.runOnce(spark, sf0001, "burst_vs_batch")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    val batch = BurstStream.slidingCounts(
        graft.Tables.events(spark, sf0001))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // the slide actually multiplies membership: some user has a window
    // pair covering the same event (two windows, 5 minutes apart)
    val perUser = batch.groupBy(_._1)
    assert(perUser.values.exists(_.size >= 2))
  }
}
