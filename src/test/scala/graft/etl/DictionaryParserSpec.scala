package graft.etl

import graft.SparkSpecBase

class DictionaryParserSpec extends SparkSpecBase {

  test("countries section: k=v lines, first key wins, order kept") {
    val got = DictionaryParser.parse(Fixtures.dictionary, 2, 3)
    assert(got === Seq("101" -> "ALBANIA", "102" -> "FRANCE", "103" -> "MEXICO"))
  }

  test("ports section: quote strip + comment line without '=' skipped") {
    val got = DictionaryParser.parse(Fixtures.dictionary, 3, 4).toMap
    assert(got("NYC") === "NEW YORK, NY")
    assert(got("GEN") === "GEN M. ESCOBEDO, Monterrey, MX")
    assert(got.size === 4)
  }

  test("all 5 sections produce non-empty tables with spec'd columns") {
    DictionaryParser.sections.foreach { s =>
      val df = DictionaryParser.toDF(spark, Fixtures.dictionary, s)
      assert(df.columns.toSeq === Seq(s.indexName, s.colName), s.table)
      assert(df.count() > 0, s.table)
    }
  }

  test("port_state_mapping: rsplit-once keeps embedded commas in city") {
    val rows = DictionaryParser.portStateMapping(spark, Fixtures.dictionary)
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(rows("NYC") === ("NEW YORK", " NY"))
    assert(rows("GEN") === ("GEN M. ESCOBEDO, Monterrey", " MX"))
  }
}
