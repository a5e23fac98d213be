package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 batch L: shingle df profile (q193), IVF list balance
  * (q194), quality-by-language matrix (q195).
  */
class DfBalanceQualitySpec extends SparkSpecBase {

  test("q193: bands partition the shingle space; postings reconcile") {
    val out = DedupOps.shingleDfProfile(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nShingles = out.map(_.getLong(1)).sum
    val nPostings = out.map(_.getLong(2)).sum
    // postings total = distinct (doc, 8-gram) rows
    val direct = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        explode(graft.functions.Text.wordShingles(col("text"), 8)).as("g"))
      .distinct()
    assert(nPostings === direct.count())
    assert(nShingles === direct.select(col("g")).distinct().count())
    // band 0 is df=1 singles: n_shingles == n_postings there
    out.find(_.getLong(0) == 0L).foreach(r =>
      assert(r.getLong(1) === r.getLong(2)))
  }

  test("q194: totals reconcile; imbalance is the integer ratio") {
    val r = SimilarityOps.ivfListBalance(spark, sf0001).collect().head
    val nVecs = graft.Tables.embeddings(spark, sf0001).count()
    assert(r.getLong(1) === nVecs)
    assert(r.getLong(2) <= r.getLong(3))
    assert(r.getLong(4) === r.getLong(3) * r.getLong(0) * 1000L / nVecs)
    assert(r.getLong(4) >= 1000L) // max >= mean always
  }

  test("q195: matrix marginals reconcile with corpus totals") {
    val out = TextAnalysisOps.qualityByLang(spark, sf0001).collect()
    assert(out.nonEmpty)
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(out.map(_.getLong(2)).sum === nDocs)
    out.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 4L))
    // language marginals match the documents table
    val byLang = graft.Tables.documents(spark, sf0001)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getLong(2)).sum === byLang(lang))
    }
  }
}
