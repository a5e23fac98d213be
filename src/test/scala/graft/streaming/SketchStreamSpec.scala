package graft.streaming

import graft.SparkSpecBase

/** Stream ≡ batch gate for the live Count-Min sketch: cell-for-cell
  * EQUALITY (not an envelope) — CMS cells are order- and
  * partition-independent sums, so microbatching must not move a single
  * count.
  */
class SketchStreamSpec extends SparkSpecBase {

  test("streaming CMS sketch equals the batch sketch cell-for-cell") {
    val streamed = EventsStream.runToMemoryTable(spark,
      SketchStream.cmsStream(spark, sf0001), "cms_stream_test", "complete")
      .collect()
    assert(streamed.length === 1)
    val batch = SketchStream.cmsBatch(
      graft.Tables.documents(spark, sf0001)).collect()
    val sCells = streamed.head.getSeq[Long](
      streamed.head.fieldIndex("cells")).toList
    val bCells = batch.head.getSeq[Long](
      batch.head.fieldIndex("cells")).toList
    assert(sCells === bCells)
    assert(streamed.head.getAs[Long]("total") ===
      batch.head.getAs[Long]("total"))
    // non-vacuous: the sketch actually counted something
    assert(streamed.head.getAs[Long]("total") > 0)
    assert(sCells.exists(_ > 0))
  }

  test("watermarked daily cells DROP late tokens; batch cells keep them") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val events = input.toDF.toDF("ts", "props")
    val q = SketchStream.cmsDailyCells(events, "1 hour", d = 2, w = 8)
      .writeStream.outputMode("update").format("memory")
      .queryName("cms_late").start()
    // batch 1: two day-1 items + a day-3 watermark pusher
    input.addData(
      (t("2024-01-01 09:00:00"), """{"k": 1}"""),
      (t("2024-01-01 15:00:00"), """{"k": 2}"""),
      (t("2024-01-03 00:00:00"), """{"k": 3}"""))
    q.processAllAvailable()
    // batch 2: a late day-1 item behind the watermark — dropped
    input.addData((t("2024-01-01 12:00:00"), """{"k": 1}"""))
    q.processAllAvailable()
    q.stop()
    val streamDay1 = spark.table("cms_late")
      .filter(col("day") === lit("2024-01-01").cast("date"))
      .groupBy(col("r"), col("c")).agg(max(col("cnt")).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    // the stream's day-1 grid equals the batch grid over batch-1's
    // day-1 rows ONLY — the late token never bumped a cell
    val batch1Only = Seq(
      (t("2024-01-01 09:00:00"), """{"k": 1}"""),
      (t("2024-01-01 15:00:00"), """{"k": 2}""")).toDF("ts", "props")
    val expected = SketchStream.cmsDailyCellsBatch(batch1Only, d = 2, w = 8)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(streamDay1 === expected)
    assert(streamDay1.nonEmpty)
    // per sketch row, day-1 counted exactly 2 tokens (not 3)
    assert(streamDay1.toSeq.groupBy(_._1).forall(_._2.map(_._3).sum == 2L))
    // the unwatermarked batch over the IDENTICAL rows counts all 3
    val allRows = batch1Only.unionByName(
      Seq((t("2024-01-01 12:00:00"), """{"k": 1}""")).toDF("ts", "props"))
    val batchAll = SketchStream.cmsDailyCellsBatch(allRows, d = 2, w = 8)
      .collect().map(r => (r.getInt(1), r.getLong(3)))
    assert(batchAll.groupBy(_._1).forall(_._2.map(_._2).sum == 3L))
  }
}
