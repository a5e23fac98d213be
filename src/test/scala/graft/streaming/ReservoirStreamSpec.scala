package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Stream ≡ batch gate for the live priority reservoir: row-for-row
  * EQUALITY — min-k-by-priority is a commutative idempotent monoid, so
  * micro-batch boundary placement must not move a single sampled row
  * (the q326 merge law, streamed).
  */
class ReservoirStreamSpec extends SparkSpecBase {

  test("staged-file streaming reservoir equals the batch reservoir row-for-row") {
    val streamed = ReservoirStream.runOnce(spark, sf0001,
        "reservoir_stream_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = ReservoirStream.reservoir(
        graft.Tables.events(spark, sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 100)
  }

  test("micro-batch split placement cannot move a sampled row (the merge law, streamed)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 300 synthetic events; k = 20 reservoir
    def ev(id: Long) = (id, id * 0.37)
    val all = (1L to 300L).map(ev)
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF.toDF("event_id", "value")
    val q = ReservoirStream.reservoir(events, k = 20)
      .writeStream.outputMode("complete").format("memory")
      .queryName("reservoir_split_test").start()
    try {
      // three uneven micro-batches — the boundary cuts the priority
      // order arbitrarily; the final sample must not notice
      input.addData(all.take(7))
      q.processAllAvailable()
      input.addData(all.slice(7, 211))
      q.processAllAvailable()
      input.addData(all.drop(211))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("reservoir_split_test")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batch = ReservoirStream.reservoir(
        all.toDF("event_id", "value"), k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(streamed.size === 20)
    // and the intermediate state never exceeded k rows by construction:
    // the aggregator's buffer IS the sample (fixed memory, no eviction
    // needed) — pin the output cardinality, the observable half
    assert(spark.table("reservoir_split_test").count() === 20)
  }
}
