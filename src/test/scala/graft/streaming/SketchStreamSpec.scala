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
}
