package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch G: vocab budget curve (q182), source novelty (q183),
  * dedup threshold sweep (q184).
  */
class BudgetNoveltySweepSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
      text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("vocabBudgetCurve: coverage at hand-picked budgets") {
    // counts: a:4, b:2, c:1, d:1 -> rank a,b,c,d (ties broken by token)
    val d = docs((1L, "a a a a b b c d", "en", "s"))
    val got = TextAnalysisOps.vocabBudgetCurveOn(d, Seq(1, 2, 4))
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(got(0) === ((1, 4L, 8L, 4L, 0.5)))
    assert(got(1) === ((2, 4L, 8L, 6L, 0.25)))
    assert(got(2) === ((4, 4L, 8L, 8L, 0.0)))
  }

  test("sourceNovelty: shared vs unique grams across sources") {
    val shared = "one two three"           // the single 3-gram both share
    val d = docs(
      (1L, shared + " four", "en", "A"),   // grams: (one two three), (two three four)
      (2L, shared, "en", "B"),             // gram:  (one two three)
      (3L, "x y z w", "en", "B"))          // grams: (x y z), (y z w)
    val got = TextAnalysisOps.sourceNoveltyOn(d, 3)
      .as[(String, Long, Long, Double)].collect().toSet
    // A: 2 grams, 1 unique; B: 3 grams, 2 unique
    assert(got === Set(("A", 2L, 1L, 0.5),
      ("B", 3L, 2L, BigDecimal(2.0 / 3.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("thresholdSweep: counts are monotone and anchored by q121") {
    val sweep = DedupOps.thresholdSweep(spark, sf0001)
      .as[(String, Long)].collect().toMap
    assert(sweep.keySet === Set("0.5", "0.6", "0.7", "0.8"))
    assert(sweep("0.5") >= sweep("0.6"))
    assert(sweep("0.6") >= sweep("0.7"))
    assert(sweep("0.7") >= sweep("0.8"))
    // the 0.6 point must equal the lossless q121 join's pair count
    val q121 = DedupOps.prefixJaccardJoin(spark, sf0001).count()
    assert(sweep("0.6") === q121)
  }

  test("thresholdSweep: planted pairs land in the right buckets") {
    // 10-token docs, 8-shingles => 3 distinct shingles per doc pair off
    // by one token => small fixtures: use identical docs (J=1) and a
    // disjoint doc (J=0 with others)
    val t1 = "a b c d e f g h i j"
    val d = docs(
      (1L, t1, "en", "s"), (2L, t1, "en", "s"),       // J = 1 pair
      (3L, "z y x w v u t s r q", "en", "s"))          // no overlap
    val got = DedupOps.thresholdSweepOn(d, 8)
      .as[(String, Long)].collect().toMap
    assert(got === Map("0.5" -> 1L, "0.6" -> 1L, "0.7" -> 1L, "0.8" -> 1L))
  }
}
