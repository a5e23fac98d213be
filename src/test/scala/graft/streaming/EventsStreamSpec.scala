package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class EventsStreamSpec extends SparkSpecBase {

  test("streaming daily counts match the batch q25 aggregation") {
    val streamed = EventsStream.runOnce(spark, sf0001, "events_daily_test")
      .select(col("day"), col("event_type"), col("cnt"))
    val batch = graft.operators.CoreQueries.q25EventsDaily(spark, sf0001)
      .select(col("day"), col("event_type"), col("cnt"))
    assert(streamed.count() > 0)
    // stream (complete mode over all files) ≡ batch group-by
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
