package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-14 fixture specs: hand-checkable cases for the new operators
  * beyond their oracle gates.
  */
class Round14OpsSpec extends SparkSpecBase {

  test("q324 k-means|| init: deterministic, k rows, seeds spread across planted clusters") {
    import spark.implicits._
    // three tight planted clusters of different sizes along distinct
    // axes (4-dim, deterministic jitter on a non-dominant component):
    // the d2-proportional oversampling must place at least one seed in
    // EVERY cluster — the exact property a uniform sample lacks
    def cluster(axis: Int, n: Int, base: Long) =
      (0 until n).map { i =>
        val v = Array.fill(4)(0.001f * ((i % 7) + 1))
        v(axis) = 1.0f
        (base + i, v.toSeq)
      }
    val emb = (cluster(0, 30, 0L) ++ cluster(1, 20, 100L) ++
      cluster(2, 10, 200L)).toDF("vec_id", "embedding")

    val cb1 = SimilarityOps.kMeansParallelInit(emb, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val cb2 = SimilarityOps.kMeansParallelInit(emb, k = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    assert(cb1.length === 3)
    assert(cb1.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // pure function of the input: two independent builds agree exactly
    assert(cb1.toSeq === cb2.toSeq)
    // each picked centroid is a corpus vector — identify its planted
    // cluster by the dominant component; all three clusters seeded
    val clustersHit = cb1.map { case (_, cv) =>
      cv.zipWithIndex.maxBy(_._1)._2
    }.toSet
    assert(clustersHit === Set(0, 1, 2),
      s"seeds collapsed onto clusters $clustersHit")

    // the weighted reduction orders by attracted population: the seed
    // with clabel 1 must come from the LARGEST cluster
    assert(cb1.find(_._1 == 1L).get._2.zipWithIndex.maxBy(_._1)._2 === 0)
  }

  test("q324 profile halves agree with their own operators on the same codebook") {
    // the comparison query's balance half must equal q194's formula on
    // the identical assignment (internal consistency, not oracle parity)
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = SimilarityOps.kFor(emb.count(), 100L)
    val got = SimilarityOps.q324InitCompare(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(got.keySet === Set("kmeans_par", "sampled"))
    got.values.foreach { case (nLists, nVecs, maxSize, imb, hits) =>
      assert(nLists === k.toLong)
      assert(nVecs === emb.count())
      assert(maxSize >= nVecs / nLists && maxSize <= nVecs)
      assert(imb === maxSize * nLists * 1000L / nVecs)
      assert(hits >= 0L && hits <= 40L) // 8 queries x k=5
    }
  }
}
