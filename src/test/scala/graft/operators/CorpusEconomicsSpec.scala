package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-8 corpus-economics batch: basket bands (q169), truncation
  * loss (q170), quality-token survival curve (q171), dup-cluster size
  * histogram (q172).
  */
class CorpusEconomicsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*) =
    rows.map { case (id, text, lang, src) => (id, text, lang, src,
      text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("q169: band doc counts and revenue agree with a per-order recompute") {
    val out = CoreQueries.q169BasketBands(spark, sf0001).collect()
    assert(out.nonEmpty)
    val bands = out.map(_.getLong(0))
    assert(bands.sorted.sameElements(bands))
    // total orders across bands == distinct orderkeys in lineitem
    val nOrders = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct().count()
    assert(out.map(_.getLong(1)).sum === nOrders)
    // revenue recompute for the smallest band via double arithmetic
    val b0 = out.head
    val keys = graft.Tables.lineitem(spark, sf0001)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .filter(col("n") === b0.getLong(0))
    val rev = graft.Tables.lineitem(spark, sf0001)
      .join(keys, "l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
      .head().getDouble(0)
    assert(math.abs(rev - b0.getDouble(2)) < 0.01)
  }

  test("truncationLoss: hand-computed kept/over sums at each length") {
    val d = docs(
      (1L, Seq.fill(100)("w").mkString(" "), "en", "s"),   // 100 tokens
      (2L, Seq.fill(600)("w").mkString(" "), "en", "s"),   // 600
      (3L, Seq.fill(3000)("w").mkString(" "), "en", "s"))  // 3000
    val got = PipelineOps.truncationLossOn(d)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    val total = 3700L
    def frac(kept: Long) = BigDecimal(1.0 - kept.toDouble / total.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((128, 3L, 2L, total, 100L + 128L + 128L,
      frac(356L))))
    assert(got(1) === ((512, 3L, 2L, total, 100L + 512L + 512L,
      frac(1124L))))
    assert(got(2) === ((2048, 3L, 1L, total, 100L + 600L + 2048L,
      frac(2748L))))
  }

  test("q171: curve is monotone, ends at fraction 1, totals match") {
    val out = PipelineOps.qualityTokenCurve(spark, sf0001).collect()
    assert(out.nonEmpty)
    // quality strictly descending, cumulatives strictly ascending
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(0) > b.getDouble(0))
        assert(a.getLong(3) < b.getLong(3) && a.getLong(4) < b.getLong(4))
      case _ =>
    }
    val last = out.last
    assert(last.getDouble(5) === 1.0)
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(last.getLong(3) === nDocs)
    // per-score rows sum to the cumulative tail
    assert(out.map(_.getLong(1)).sum === nDocs)
    assert(out.map(_.getLong(2)).sum === last.getLong(4))
  }

  test("clusterSizeHist: planted multiplicities") {
    val d = docs(
      (1L, "same text", "en", "s"), (2L, "same  text", "en", "s"),
      (3L, "same text ", "en", "s"),                  // 3 copies (normText)
      (4L, "pair", "en", "s"), (5L, "pair", "en", "s"), // 2 copies
      (6L, "unique one", "en", "s"))                  // singleton
    val got = DedupOps.clusterSizeHistOn(d)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)))
  }
}
