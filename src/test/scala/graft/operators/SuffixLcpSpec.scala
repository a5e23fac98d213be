package graft.operators

import graft.SparkSpecBase

/** Planted-phrase gates for the q354 suffix-LCP panel. */
class SuffixLcpSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], minLcp: Int = 3) =
    DedupOps.suffixLcpOn(
      rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      maxLcp = 12, minLcp = minLcp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("a planted 5-token phrase shared by two docs surfaces at lcp 5 with its suffix ladder") {
    // the shared run 'p q r s t' sits mid-document in both docs. Its
    // own suffixes are shared too ('q r s t…' diverges after 4,
    // 'r s t…' after 3) — the classic suffix-array ladder; the MAX
    // band (5) is the phrase length, and nothing exceeds it
    val out = run(Seq(
      (1L, "a1 b1 p q r s t c1 d1"),
      (2L, "a2 p q r s t b2 c2")))
    assert(out.toSeq === Seq((3L, 1L, 1L), (4L, 1L, 1L), (5L, 1L, 1L)))
  }

  test("identical docs saturate at the maxLcp cap and a within-doc repeat is NOT cross-doc") {
    // two identical 14-token docs: suffixes 0..2 share 12-token
    // (capped) prefixes cross-doc
    val t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14"
    val dup = run(Seq((1L, t), (2L, t)))
    val at12 = dup.find(_._1 == 12L).get
    assert(at12._2 >= 3L && at12._3 === at12._2,
      s"capped band should be all cross-doc: $at12")
    // within-ONE-doc phrase repeat: pairs exist but cross-doc = 0
    val solo = run(Seq((1L, "x y z m1 x y z m2")))
    assert(solo.toSeq === Seq((3L, 1L, 0L)))
  }

  test("no repeated phrase above minLcp -> empty panel") {
    val out = run(Seq((1L, "a b c d"), (2L, "e f g h")))
    assert(out.isEmpty)
  }

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("two-token key is lossless: hash-identical to one-token on fixtures AND the real corpus") {
    // the de-skew contract (VERDICT r15 item 1): for minLcp >= 2 the
    // 2-token partition key must change NOTHING — a k-token prefix
    // range is contiguous in the global sort, so only LCP < k boundary
    // pairs differ, all below the filter
    val fixtures = Seq(
      Seq((1L, "a1 b1 p q r s t c1 d1"), (2L, "a2 p q r s t b2 c2")),
      // Zipf-flavoured: 'the' opens many suffixes, incl. doc-final
      // 1-token suffixes (the t2 = '' sentinel partition)
      Seq((1L, "the cat sat on the mat near the dog and the"),
        (2L, "a dog saw the cat sat on the mat and fled the"),
        (3L, "the the the cat sat on the mat the")))
    for (rows <- fixtures; minLcp <- Seq(2, 3)) {
      val df = docsDf(rows)
      val one = DedupOps.suffixLcpOn(df, 12, minLcp, keyTokens = 1)
        .collect().map(_.toSeq).toSeq
      val two = DedupOps.suffixLcpOn(df, 12, minLcp, keyTokens = 2)
        .collect().map(_.toSeq).toSeq
      assert(one === two, s"key widths diverge at minLcp=$minLcp")
    }
    val docs = graft.Tables.documents(spark, sf0001)
    val one = DedupOps.suffixLcpOn(docs, 12, 3, keyTokens = 1)
      .collect().map(_.toSeq).toSeq
    val two = DedupOps.suffixLcpOn(docs, 12, 3, keyTokens = 2)
      .collect().map(_.toSeq).toSeq
    assert(one === two && one.nonEmpty,
      "real-corpus panels diverge between key widths")
  }

  test("a key wider than minLcp is rejected (it would drop LCP < keyTokens pairs)") {
    val df = docsDf(Seq((1L, "a b c")))
    val e = intercept[IllegalArgumentException](
      DedupOps.suffixLcpOn(df, 12, minLcp = 1, keyTokens = 2))
    assert(e.getMessage.contains("lossless"))
  }
}
