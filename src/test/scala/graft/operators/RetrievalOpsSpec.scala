package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** BM25 retrieval (q89): ranking structure on a constructed corpus where
  * the correct ordering is known from the scoring function's shape —
  * idf discrimination (rare term beats stopword-grade term), tf
  * saturation direction, and length normalization — plus the output
  * contract on the real testdata corpus.
  */
class RetrievalOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], nQueries: Int = 1,
      nTerms: Int = 3, k: Int = 10) =
    RetrievalOps.bm25TopKOn(rows.toDF("doc_id", "text"),
      nQueries, nTerms, k)

  test("idf discrimination: matching a rare term outranks matching a ubiquitous one") {
    // query doc 0 = "rare common": 'common' is in every doc (df = 6,
    // idf ~ 0), 'rare' only in docs 0 and 3. Doc 3 (rare hit) must beat
    // docs 4/5 (common-only hits) despite identical lengths.
    val corpus = Seq[(Long, String)](
      (0L, "rare common"),
      (3L, "rare common filler filler"),
      (4L, "common filler filler filler"),
      (5L, "common filler filler filler"))
    val hits = run(corpus).where(col("qid") === 0).orderBy(col("rk"))
      .select(col("hit_id")).as[Long].collect()
    assert(hits.head === 0L) // the query doc itself: both terms, shortest
    assert(hits(1) === 3L)   // rare-term match beats common-only matches
  }

  test("tf direction: more occurrences of the query term rank higher at equal length") {
    val corpus = Seq[(Long, String)](
      (0L, "target"),
      (1L, "target target target pad"),
      (2L, "target pad pad pad"))
    val hits = run(corpus).where(col("qid") === 0).orderBy(col("rk"))
      .select(col("hit_id")).as[Long].collect()
    // doc 1 (tf = 3, dl = 4) over doc 2 (tf = 1, dl = 4)
    assert(hits.indexOf(1L) < hits.indexOf(2L))
  }

  test("length normalization: same tf, shorter doc ranks higher") {
    val corpus = Seq[(Long, String)](
      (0L, "target"),
      (1L, "target pad"),
      (2L, "target pad pad pad pad pad pad pad"))
    val hits = run(corpus).where(col("qid") === 0).orderBy(col("rk"))
      .select(col("hit_id")).as[Long].collect()
    assert(hits.indexOf(1L) < hits.indexOf(2L))
  }

  test("oracle operating point: q89 SQL is generated from bm25TopK's own defaults") {
    // the r7 ADVICE guard: the oracle's QUALIFY bound and its fixed-order
    // CASE slots interpolate from RetrievalOps' constants, so a default
    // change regenerates both sides together — pinned by checking the
    // rendered SQL embeds the generated slot list and the bounds
    val sql = graft.SparkEntry.oracleSql("q89_bm25_topk")
    assert(sql.contains(
      RetrievalOps.oracleSlotSql(RetrievalOps.DefaultNTerms)))
    assert(sql.contains(s"doc_id < ${RetrievalOps.DefaultNQueries}"))
    assert(sql.contains(s"tok) <= ${RetrievalOps.DefaultNTerms}"))
    assert(sql.contains(s"rk <= ${RetrievalOps.DefaultK}"))
    // the slot renderer itself: one slot per rank, written order
    val s4 = RetrievalOps.oracleSlotSql(4)
    assert((1 to 4).forall(i => s4.contains(s"t_rank = $i")))
    assert(!s4.contains("t_rank = 5"))
  }

  test("non-default nTerms: fold covers all ranks (runs, rk dense, no oracle claim)") {
    // nTerms != default diverges from the q89 oracle BY DESIGN; what must
    // hold is the Spark-side contract alone — it runs, and widening the
    // term set can only add score mass (more candidate terms per query)
    val corpus = Seq[(Long, String)](
      (0L, "alpha beta gamma delta alpha beta gamma alpha beta alpha"),
      (1L, "alpha beta gamma delta"), (2L, "alpha beta"), (3L, "gamma delta"),
      (4L, "delta epsilon"), (5L, "epsilon zeta"))
    val k2 = RetrievalOps.bm25TopKOn(corpus.toDF("doc_id", "text"),
      nQueries = 1, nTerms = 2, k = 3).collect()
    val k5 = RetrievalOps.bm25TopKOn(corpus.toDF("doc_id", "text"),
      nQueries = 1, nTerms = 5, k = 3).collect()
    assert(k2.nonEmpty && k5.nonEmpty)
    assert(k2.map(_.getInt(3)).toSeq === (1 to k2.length))
    assert(k5.map(_.getInt(3)).toSeq === (1 to k5.length))
  }

  test("output contract on testdata: 5 queries x top-5, scores non-increasing, rk dense") {
    val out = RetrievalOps.bm25TopK(spark, sf0001).cache()
    assert(out.count() === 25)
    assert(out.groupBy("qid").count().where(col("count") =!= 5).count() === 0)
    // rk dense 1..5 and scores non-increasing within each query
    val bad = out.selectExpr("qid", "score", "rk",
        "lag(score) over (partition by qid order by rk) as prev")
      .where(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() === 0)
    assert(out.agg(min("rk"), max("rk")).as[(Int, Int)].head() === ((1, 5)))
    out.unpersist()
  }

  test("NULL text behaves exactly like empty text (corpus stats count every doc)") {
    // the index-derived n_docs/sum_dl invariant must not depend on
    // non-null data: a NULL-text doc tokenizes to [""] (dl = 1), stays
    // in the postings, and so stays in the corpus stats. Scores over
    // the non-null docs must be IDENTICAL whether the extra doc's text
    // is NULL or '' — if the NULL row silently dropped out of the
    // index, n_docs/sum_dl would shrink and every idf/norm would move.
    val base = Seq[(Long, String)](
      (0L, "rare common"),
      (3L, "rare common filler filler"),
      (4L, "common filler filler filler"))
    val withEmpty = run(base :+ (9L -> ""), k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    val withNull = RetrievalOps.bm25TopKOn(
        (base.map { case (i, t) => (i, Option(t)) } :+ (9L -> None))
          .toDF("doc_id", "text"),
        nQueries = 1, nTerms = 3, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(withEmpty === withNull)
    assert(withEmpty.nonEmpty)
  }

}
