package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** transformWithState lifetime panel ≡ batch on the final per-user row
  * (count/sum/max are commutative folds), plus the cross-batch state
  * carry pinned with a two-batch MemoryStream fixture.
  */
class LifetimeStatsStreamSpec extends SparkSpecBase {

  test("final per-user panel equals the batch aggregate cell-for-cell") {
    val streamed = LifetimeStatsStream.runOnce(spark, sf0001, "clv_vs_batch")
    // Update mode re-emits touched users per batch; the PANEL is the
    // highest-n row per user (n_events grows monotonically)
    val fin = streamed.collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._1) }
    val batch = LifetimeStatsStream
      .lifetimeStatsBatch(graft.Tables.events(spark, sf0001))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(fin.nonEmpty)
    assert(fin === batch)
  }

  test("ValueState carries across microbatches; each batch re-emits its users") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.conf.set(LifetimeStatsStream.rocksConf._1,
      LifetimeStatsStream.rocksConf._2)
    val input = MemoryStream[(Long, Double)]
    val events = input.toDF.toDF("user_id", "value")
    val q = LifetimeStatsStream.lifetimeStats(events).toDF()
      .writeStream.outputMode("update").format("memory")
      .queryName("clv_carry").start()
    input.addData((1L, 1.50), (1L, 2.25), (2L, 10.00))
    q.processAllAvailable()
    val afterB1 = spark.table("clv_carry").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(afterB1 === Map(1L -> ((2L, 375L, 225L)), 2L -> ((1L, 1000L, 1000L))))
    // batch 2 touches only user 1: its state must FOLD (not reset), and
    // user 2 must not re-emit
    input.addData((1L, 0.25))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("clv_carry").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.count(_._1 == 2L) === 1)
    assert(rows.filter(_._1 == 1L).map(_._2).max === 3L)
    assert(rows.exists(_ == ((1L, 3L, 400L, 225L))), rows.mkString(", "))
  }
}
