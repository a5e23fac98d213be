package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 text batch: language confusion (q155), encoding-health scan
  * (q156), vocabulary-bounded collocation PMI (q157).
  */
class Round8TextSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
      text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("langConfusion: off-diagonal cells appear where declared ≠ predicted") {
    val d = docs(
      (1L, "the cat of the house is a cat", "en", "s"), // en -> en
      (2L, "el gato de la casa es que", "es", "s"),     // es -> es
      (3L, "the dog of the yard", "es", "s"),           // declared es, reads en
      (4L, "zz qq xx", "en", "s"))                      // no stopwords -> und
    val got = TextAnalysisOps.langConfusionOn(d)
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("en", "en", 1L), ("en", "und", 1L),
      ("es", "es", 1L), ("es", "en", 1L)))
  }

  test("encodingScan: counts replacement chars, control bytes, non-ASCII") {
    val d = docs(
      (1L, "plain ascii text", "en", "a"),
      (2L, "bad � byte", "en", "a"),         // replacement char
      (3L, "ctrl\u0001here", "en", "b"),          // C0 control
      (4L, "中文四字", "zh", "b"))                 // 4 non-ASCII chars
    val got = TextAnalysisOps.encodingScanOn(d)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    // source a: 2 docs, 1 repl doc, 0 ctrl, 1 non-ascii char (the
    // replacement char itself is non-ASCII)
    val aChars = "plain ascii text".length + "bad � byte".length
    val aRatio = BigDecimal(1.0 - 1.0 / aChars)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // source b: 2 docs, 0 repl, 1 ctrl doc, 4 non-ascii chars
    val bChars = "ctrl\u0001here".length + 4
    val bRatio = BigDecimal(1.0 - 4.0 / bChars)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Set(
      ("a", 2L, 1L, 0L, 1L, aRatio),
      ("b", 2L, 0L, 1L, 4L, bRatio)))
  }

  test("collocations: hand-computed PMI on a planted pair") {
    val d = docs(
      (1L, "p q", "en", "s"), (2L, "p q", "en", "s"),
      (3L, "p q", "en", "s"), (4L, "p q", "en", "s"),
      (5L, "p q", "en", "s"),
      (6L, "p", "en", "s"), (7L, "q", "en", "s"),
      (8L, "z z z", "en", "s"))
    val got = TextAnalysisOps.collocationsOn(d, v = 10, k = 5,
        minSupport = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    // N=8, df_p=df_q=6, n_pq=5 -> pmi = ln(5*8 / 36) = ln(10/9)
    val want = BigDecimal(math.log(40.0 / 36.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(("p", "q", 5L, want)))
  }

  test("collocations: support threshold prunes rare pairs") {
    val d = docs(
      (1L, "p q", "en", "s"), (2L, "p q", "en", "s"),
      (3L, "x y", "en", "s"))
    assert(TextAnalysisOps.collocationsOn(d, v = 10, k = 5,
      minSupport = 3).count() === 0L)
  }

  test("round-8 text ops: non-degenerate on the real corpus") {
    val conf = TextAnalysisOps.langConfusion(spark, sf0001)
    assert(conf.agg(sum("n_docs")).as[Long].head() ===
      graft.Tables.documents(spark, sf0001).count())
    assert(TextAnalysisOps.encodingScan(spark, sf0001).count() > 0)
    assert(TextAnalysisOps.collocations(spark, sf0001).count() > 0)
  }
}
