package graft.operators

import graft.SparkSpecBase

/** Round-8 text-quality batch: TTR bands (q162), readability (q163),
  * casing profile (q164), hapax rate (q165). Hand-computed fixtures.
  */
class Round8QualitySpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
      text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("ttrBands: integer band rule and micro-averaged ratio") {
    val d = docs(
      (1L, "a a a a a a a a a a", "en", "s"),   // d=1 t=10 -> band 1
      (2L, "a b c d e", "en", "s"),             // d=5 t=5  -> 10 -> band 9
      (3L, "a a b b c", "en", "s"))             // d=3 t=5  -> band 6
    val got = TextAnalysisOps.ttrBandsOn(d)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got === Set(
      (1L, 1L, 10L, 1L, 0.1),
      (6L, 1L, 5L, 3L, 0.6),
      (9L, 1L, 5L, 5L, 1.0)))
  }

  test("readability: integer counts then the Flesch expression") {
    // doc: 4 words, 2 sentence runs, syllable runs from vowel groups
    val d = docs((1L, "See the cat. Run now!", "en", "s"))
    val row = TextAnalysisOps.readabilityOn(d).collect().head
    // words: "see the cat. run now!" -> 5 tokens
    assert(row.getLong(2) === 5L)
    assert(row.getLong(3) === 2L)  // ". " and "!" -> two [.!?]+ runs
    // vowel runs in "see the cat. run now!": ee, e, a, u, o -> 5
    assert(row.getLong(4) === 5L)
    val expect = BigDecimal(206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(5) === expect)
  }

  test("readability: zero-sentence doc floors at one sentence") {
    val d = docs((1L, "no terminator here", "en", "s"))
    val row = TextAnalysisOps.readabilityOn(d).collect().head
    assert(row.getLong(3) === 1L)
  }

  test("caseProfile: shouting and nocase doc counts") {
    val d = docs(
      (1L, "WARNING ALL CAPS HERE", "en", "a"),  // all upper -> shouting
      (2L, "gentle lower text", "en", "a"),      // no upper -> nocase
      (3L, "Mixed Case Text", "en", "a"))        // 3/13 upper -> not shouting
    val row = TextAnalysisOps.caseProfileOn(d).collect().head
    val letters1 = "WARNINGALLCAPSHERE".length.toLong
    val letters2 = "gentlelowertext".length.toLong
    val letters3 = "MixedCaseText".length.toLong
    assert(row.getLong(1) === 3L)
    assert(row.getLong(2) === letters1 + letters2 + letters3)
    assert(row.getLong(3) === letters1 + 3L)
    assert(row.getLong(4) === 1L)  // only doc 1 shouts
    assert(row.getLong(5) === 1L)  // only doc 2 has zero uppercase
  }

  test("hapaxRate: exactly-once vocabulary fraction per source") {
    val d = docs(
      (1L, "a a b c", "en", "s"),   // a:2 b:1 c:1
      (2L, "b d", "en", "s"),       // b -> 2 total, d:1
      (3L, "x x", "en", "t"))       // x:2
    val got = TextAnalysisOps.hapaxRateOn(d)
      .as[(String, Long, Long, Double)].collect().toSet
    // source s vocab: a(2) b(2) c(1) d(1) -> 4 vocab, 2 hapax
    assert(got === Set(("s", 4L, 2L, 0.5), ("t", 1L, 0L, 0.0)))
  }
}
