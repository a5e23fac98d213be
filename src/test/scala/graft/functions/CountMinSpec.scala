package graft.functions

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Count-Min sketch (q90): the approximation regime the 31-token
  * testdata vocabulary cannot exhibit — collision-heavy configurations
  * (distinct ≫ w), the deterministic est ≥ true guarantee under them,
  * merge-order independence (the property that lets q90 hash-gate raw
  * estimates), the fixed memory bound, and JVM-vs-Catalyst bucket
  * agreement (the cross-engine contract the oracle replay rests on).
  */
class CountMinSpec extends SparkSpecBase {
  import spark.implicits._

  private def sketchOf(toks: Seq[String], d: Int, w: Int,
      parts: Int): CMSBuf =
    toks.toDF("tok").repartition(parts).as[String]
      .select(new CountMinAggregator(d, w).toColumn).head()

  test("JVM bucket = Catalyst instr-decode bucket for every row") {
    val toks = (0 until 200).map(i => s"tok_$i")
    val w = 16
    val bucketCols = (0 until 3).map { i =>
      ((expr(s"instr('0123456789abcdef', substring(md5(concat(tok, '_', $i)), 1, 1)) - 1") * lit(256)
        + expr(s"instr('0123456789abcdef', substring(md5(concat(tok, '_', $i)), 2, 1)) - 1") * lit(16)
        + expr(s"instr('0123456789abcdef', substring(md5(concat(tok, '_', $i)), 3, 1)) - 1")) % lit(w))
        .as(s"b$i")
    }
    val rows = toks.toDF("tok").select(col("tok") +: bucketCols: _*).collect()
    rows.foreach { r =>
      val tok = r.getString(0)
      (0 until 3).foreach { i =>
        assert(r.getInt(i + 1) === CountMinAggregator.bucketOf(tok, i, w),
          s"bucket mismatch for $tok row $i")
      }
    }
  }

  test("collision regime: est >= true for every key, and collisions do occur") {
    // 500 distinct keys into w = 16 buckets: pigeonhole guarantees heavy
    // collisions; the CMS one-sided guarantee must still hold everywhere
    val d = 2; val w = 16
    val toks = (0 until 500).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val buf = sketchOf(toks, d, w, parts = 8)
    assert(buf.cells.length === d * w)
    assert(buf.total === toks.size.toLong)
    val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ests = exact.keys.map { tok =>
      val est = (0 until d).map(i =>
        buf.cells(i * w + CountMinAggregator.bucketOf(tok, i, w))).min
      assert(est >= exact(tok), s"undercount for $tok")
      tok -> est
    }.toMap
    // the approximation regime is actually exhibited, not vacuous
    assert(ests.exists { case (t, e) => e > exact(t) })
  }

  test("merge-order independence: identical cells at 1, 3, and 16 partitions") {
    val toks = (0 until 300).flatMap(i => Seq.fill(i % 5 + 1)(s"m$i"))
    val ref = sketchOf(toks, d = 3, w = 32, parts = 1)
    Seq(3, 16).foreach { p =>
      val buf = sketchOf(toks, d = 3, w = 32, parts = p)
      assert(buf.cells.toSeq === ref.cells.toSeq, s"cells differ at $p parts")
      assert(buf.total === ref.total)
    }
  }

  test("row sums: every sketch row conserves the processed count") {
    val toks = (0 until 100).map(i => s"s$i")
    val buf = sketchOf(toks, d = 4, w = 8, parts = 4)
    (0 until 4).foreach { i =>
      assert((0 until 8).map(b => buf.cells(i * 8 + b)).sum === buf.total)
    }
  }
}
