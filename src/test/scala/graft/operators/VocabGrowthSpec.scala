package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-7 fourth batch: vocab growth curve (q127), anti-entropy
  * fingerprint diff (q128), log2 length histogram (q129).
  */
class VocabGrowthSpec extends SparkSpecBase {
  import spark.implicits._

  test("vocabGrowth: cumulative equals per-source distinct shingles") {
    val out = TextAnalysisOps.vocabGrowth(spark, sf0001)
      .as[(String, Int, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, q, nNew, _) =>
      assert(q >= 0 && q <= 3 && nNew > 0)
    }
    // the last cumulative per source = total distinct shingles there
    val finalCum = out.groupBy(_._1).map { case (s, rows) =>
      s -> rows.maxBy(_._2)._4
    }
    val want = graft.Tables.documents(spark, sf0001)
      .select($"source",
        explode(graft.functions.Text.wordShingles($"text", 8)).as("g"))
      .groupBy("source").agg(countDistinct("g").as("n"))
      .as[(String, Long)].collect().toMap
    assert(finalCum === want)
    // growth curve is non-increasing in novelty for this corpus's
    // shape is NOT asserted (domain-dependent); monotone cumulative is
    out.groupBy(_._1).foreach { case (_, rows) =>
      val cums = rows.sortBy(_._2).map(_._4)
      assert(cums === cums.sorted)
    }
  }

  test("fingerprintDiff: only mutated buckets appear; identical snapshots diff empty") {
    val out = graft.operators.IncrementalOps.fingerprintDiff(spark, sf0001)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (b, n1, n2, fp1, fp2) =>
      assert(b >= 0 && b < 64)
      assert(fp1 != fp2 || n1 != n2)
    }
    // self-diff must be empty: same snapshot on both sides
    val v1 = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text")
    def bfp(nCol: String, fpCol: String) = v1
      .select(($"doc_id" % 64).cast("int").as("bucket"),
        conv(substring(md5(concat_ws("|", $"doc_id", $"text")), 18, 15),
          16, 10).cast("long").as("fp"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as(nCol), expr("bit_xor(fp)").as(fpCol))
    val self = bfp("n1", "fp1").join(bfp("n2", "fp2"), Seq("bucket"))
      .filter($"fp1" =!= $"fp2" || $"n1" =!= $"n2")
    assert(self.count() === 0L)
  }

  test("lengthHistogram: buckets are exact floor(log2); totals add up") {
    val out = TextAnalysisOps.lengthHistogram(spark, sf0001)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, b, n, _, lo, hi) =>
      assert(n > 0 && lo <= hi)
      // min/max of the bucket sit inside [2^b, 2^(b+1))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)))
    }
    val docs = graft.Tables.documents(spark, sf0001)
    assert(out.map(_._3).sum === docs.count())
    assert(out.map(_._4).sum === docs.agg(sum("n_chars")).as[Long].head())
  }
}
