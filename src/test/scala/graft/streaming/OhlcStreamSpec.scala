package graft.streaming

import graft.SparkSpecBase

/** Streaming OHLC ≡ batch q176, cell-exact: struct min/max are
  * commutative associative folds, so microbatch placement cannot
  * change any bar.
  */
class OhlcStreamSpec extends SparkSpecBase {

  test("streamed bars equal the batch q176 rows cell-for-cell") {
    val streamed = OhlcStream.runOnce(spark, sf0001, "ohlc_vs_batch")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    val batch = graft.operators.EventOps.dailyOhlc(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSet
    assert(streamed === batch)
    assert(batch.nonEmpty)
  }
}
