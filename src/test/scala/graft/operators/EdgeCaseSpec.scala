package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Degenerate-input behavior of the corpus operators: null text, empty
  * text, sub-shingle-length docs, and single-doc corpora must neither
  * crash nor emit spurious pairs — the inputs a real 100 TB crawl corpus
  * contains in bulk.
  */
class EdgeCaseSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val degenerate = Seq(
    (0L, null.asInstanceOf[String]), // null text
    (1L, ""),                        // empty
    (2L, "   "),                     // whitespace only
    (3L, "one"),                     // below shingle arity
    (4L, "two tokens"),              // still below 3-gram arity
    (5L, "alpha beta gamma delta"),  // one real doc
    (6L, "alpha beta gamma delta")   // its exact duplicate
  ).toDF("doc_id", "text")

  test("dedup pipelines survive null/empty/short docs; exact dup still found") {
    // null/short docs produce no shingles -> excluded from pair space
    val exact = DedupOps.ngramJaccardPairsDF(degenerate).collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((5L, 6L)))
    assert(exact.head.getAs[Double]("jaccard") === 1.0)
    val mh = DedupOps.minhashNearDupDF(degenerate).collect()
    assert(mh.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((5L, 6L)))
    val sh = DedupOps.simhashNearDupDF(degenerate).collect()
    assert(sh.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((5L, 6L)))
  }

  test("connected components on an empty edge set returns no labels") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupOps.connectedComponents(empty).collect().isEmpty)
  }

  test("single-doc corpus: no pairs anywhere, no crash") {
    val one = Seq((0L, "just one lonely document here")).toDF("doc_id", "text")
    assert(DedupOps.ngramJaccardPairsDF(one).collect().isEmpty)
    assert(DedupOps.minhashNearDupDF(one).collect().isEmpty)
    assert(DedupOps.simhashChunkCandidates(one).collect().isEmpty)
  }
}
