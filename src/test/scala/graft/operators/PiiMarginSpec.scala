package graft.operators

import graft.SparkSpecBase

/** Round-8 batch K: PII density (q191) and lang-ID margins (q192). */
class PiiMarginSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
      text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("piiDensity: planted + natural hits counted per source") {
    val d = docs(
      (1L, "mail me at a.b@test.org now", "en", "s"), // 1 natural email
      (2L, "call 12345678 soon", "en", "s"),          // 1 natural digit run
      (3L, "clean text", "en", "t"))
    val got = PipelineOps.piiDensityOn(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every doc gets 1 planted email + 1 planted phone on top
    assert(got.toSeq === Seq(("s", 2L, 3L, 3L), ("t", 1L, 1L, 1L)))
  }

  test("langMargins: decisive vs coin-flip docs band correctly") {
    val d = docs(
      (1L, "the the the of and", "en", "s"),  // en=5, others 0 -> band 4
      (2L, "the la", "en", "s"),              // en=1, es=1, fr=1 tie ->
                                              // margin 0, pred en (tiebreak)
      (3L, "zz qq", "en", "s"))               // no hits -> und, band 0
    val got = TextAnalysisOps.langMarginsOn(d)
      .as[(String, Long, Long)].collect().toSet
    assert(got === Set(("en", 4L, 1L), ("en", 0L, 1L), ("und", 0L, 1L)))
  }
}
