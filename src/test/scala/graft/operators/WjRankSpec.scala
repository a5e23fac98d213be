package graft.operators

import graft.SparkSpecBase

/** q144 weighted-Jaccard rescoring + q145 rank correlation. */
class WjRankSpec extends SparkSpecBase {
  import spark.implicits._

  test("weightedJaccard: bounded by set Jaccard, identical pairs = 1.0") {
    val wj = DedupOps.weightedJaccard(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(wj.nonEmpty)
    wj.foreach { case (a, b, w) =>
      assert(a < b && w > 0.0 && w <= 1.0)
    }
    // multiset Jaccard over TOKENS vs set Jaccard over 8-gram shingles
    // are different measures; check the exact-copy invariant instead:
    // any exact-duplicate pair among candidates must score exactly 1.0
    val texts = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    wj.foreach { case (a, b, w) =>
      if (texts(a) == texts(b)) assert(w === 1.0)
    }
  }

  test("rankCorrelation: tau in [-1,1], pair counts consistent") {
    val out = SimilarityOps.rankCorrelation(spark, sf0001)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, n, c, d, tau) =>
      assert(n >= 2 && c + d === n * (n - 1) / 2)
      assert(tau >= -1.0 && tau <= 1.0)
      val expect = BigDecimal((c - d).toDouble / (n * (n - 1) / 2).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(tau === expect)
    }
  }

  test("rankCorrelation: identical rankings give tau = 1") {
    // self-comparison sanity via the same machinery: cosine vs cosine
    val a = SimilarityOps.bruteForceTopK(spark, sf0001, 4, 10)
      .select($"query_id", $"neighbor_id", $"rk".as("ra"))
    val common = a.join(
      a.select($"query_id", $"neighbor_id", $"ra".as("rb")),
      Seq("query_id", "neighbor_id"))
    val pairs = common.as("x").join(common.as("y"),
        $"x.query_id" === $"y.query_id" &&
          $"x.neighbor_id" < $"y.neighbor_id")
      .select($"x.query_id",
        (($"x.ra" - $"y.ra") * ($"x.rb" - $"y.rb") > 0).as("conc"))
    val disc = pairs.filter(!$"conc").count()
    assert(disc === 0L)
  }
}
