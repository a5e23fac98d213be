package graft.streaming

import graft.SparkSpecBase

/** Stream ≡ batch gate for the stateless curation filter: the same
  * verdict expressions over the same input must produce identical
  * per-doc rows whether applied incrementally (file stream, append mode)
  * or as one batch.
  */
class DocsStreamSpec extends SparkSpecBase {

  test("streaming curation verdicts match the batch filter row-for-row") {
    val streamed = EventsStream.runToMemoryTable(spark,
      DocsStream.curationStream(spark, sf0001), "docs_curation_test", "append")
    val batch = DocsStream.withVerdict(
      graft.Tables.documents(spark, sf0001))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3), r.getInt(4))
    val s = streamed.collect().map(key).sorted
    val b = batch.collect().map(key).sorted
    assert(s.nonEmpty)
    assert(s.sameElements(b), s"stream/batch diverged: ${s.length} vs ${b.length}")
    // both verdict classes occur — the gate is not vacuous
    assert(s.exists(_._5 == 1) && s.exists(_._5 == 0))
  }
}
