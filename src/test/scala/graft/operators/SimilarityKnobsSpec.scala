package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the scale-knob arithmetic the round-4 overflow fix depends on:
  * `planesFor`'s 62 clamp and `bucketCapFrame`'s overflow-safe divisor
  * (a `1L << nPlanes` regression at nPlanes ≥ 63 goes negative and the
  * cap silently degrades to the floor), plus `kFor`'s sizing contract.
  */
class SimilarityKnobsSpec extends SparkSpecBase {

  test("ndcgByLabel: IDCG truncates at k, so k=1 scores are exactly 0 or 1") {
    // at k=1, DCG is either discount(1) (top-1 neighbor shares the
    // query label) or 0, and IDCG must be idcgCum(min(n_rel, 1)) =
    // discount(1) — so every query with n_rel >= 1 scores exactly 0.0
    // or 1.0. The ADVICE-r9 bug (IDCG indexed min(n_rel, 10) regardless
    // of k) made the hit branch fractional (~0.22 at n_rel >= 10).
    // nQueries=12: queries 8 and 11 are the sf0.001 fixture's top-1
    // label hits (DuckDB-probed), so the hit branch is exercised
    val out = SimilarityOps.ndcgByLabel(spark, sf0001, nQueries = 12, k = 1)
      .collect()
      .map(r => (r.getAs[Long]("n_rel"), r.getAs[Double]("ndcg")))
    out.filter(_._1 >= 1L).foreach { case (_, nd) =>
      assert(nd === 0.0 || nd === 1.0, s"k=1 ndcg must be 0 or 1, got $nd")
    }
    // teeth: the fixture must exercise the hit branch
    assert(out.exists(_._2 === 1.0), out.mkString(", "))
  }

  test("planesFor: clamped to 62 at any corpus size (Long shift overflow guard)") {
    // the clamp binds where the raw log2 exceeds it (targetBucket = 1 ⇒
    // ceil(log2(2^63)) = 63 → 62); at the default targetBucket = 32 the
    // raw value at Long.MaxValue is 59 — pinned exactly so any change to
    // the formula OR the clamp shows up here
    assert(SimilarityOps.planesFor(Long.MaxValue, targetBucket = 1L) === 62)
    assert(SimilarityOps.planesFor(Long.MaxValue) === 59)
    assert(Seq(1L, 2L, 32L).forall(t =>
      SimilarityOps.planesFor(Long.MaxValue, t) <= 62))
    // floor at 4 for tiny corpora, exact log2 sizing in between
    assert(SimilarityOps.planesFor(1L) === 4)
    assert(SimilarityOps.planesFor(32L * 1024) === 10)
    assert(SimilarityOps.planesFor(32L * 1024 + 1) === 11) // ceil, not floor
    // monotone in n
    val ns = Seq(1L, 1000L, 1000000L, 1000000000L, Long.MaxValue)
    val planes = ns.map(SimilarityOps.planesFor(_))
    assert(planes === planes.sorted)
  }

  test("bucketCapFrame: strictly positive at nPlanes = 62, monotone vs corpus size") {
    def capOf(n: Long, nPlanes: Int): Long = {
      val emb = spark.range(n).toDF("vec_id")
      SimilarityOps.bucketCapFrame(emb, nPlanes).head.getAs[Long]("cap")
    }
    // at 62 planes the expected population underflows to ~0 and the floor
    // carries the cap — with the Long-shift bug the divisor is garbage and
    // this is the assertion that catches it coming back
    val at62 = capOf(100000L, 62)
    assert(at62 > 0)
    assert(at62 === SimilarityOps.BucketCapFloor)
    // monotone in corpus size at fixed planes, exact at the 4-plane
    // production config: cap = max(32, ceil(4n/16)) = n/4
    assert(capOf(1000L, 4) === 250L)
    assert(capOf(10000L, 4) === 2500L)
    assert(capOf(16L, 4) === SimilarityOps.BucketCapFloor)
  }

  test("kFor: sizes the codebook to the corpus, clamped to [2, 2^20]") {
    assert(SimilarityOps.kFor(500L, targetList = 100) === 5)
    assert(SimilarityOps.kFor(501L, targetList = 100) === 6) // ceil
    assert(SimilarityOps.kFor(1L) === 2)                     // floor
    assert(SimilarityOps.kFor(Long.MaxValue) === (1 << 20))  // broadcast guard
    // the invariant the knob exists for: expected list population stays
    // near targetList as the corpus grows 100×
    val n1 = 1000000L
    val pop1 = n1.toDouble / SimilarityOps.kFor(n1)
    val pop100 = (100 * n1).toDouble / SimilarityOps.kFor(100 * n1)
    assert(math.abs(pop1 - pop100) / pop1 < 0.01)
  }

  test("semanticCapped list cap: codebook-cardinality denominator, floor carries degenerate k") {
    import spark.implicits._
    // 200 vectors, codebook cardinality 16 ⇒ cap = max(32, ceil(4·200/16))
    // = 50. Everything in ONE list (pop 200 > 50): over cap. The same
    // corpus spread uniformly (pop ≈ 13): in cap. With k mistakenly taken
    // from countDistinct(ivf_list) = 1 of the degenerate assignment the
    // cap would be 800 and never fire — the blindness this pins against.
    val k16 = spark.range(1).select(lit(16L).as("k"))
    val megaList = (0L until 200L)
      .map(i => (i, Array(1.0f), 0L)).toDF("vec_id", "embedding", "ivf_list")
    val capped = SimilarityOps.semanticCapped(megaList, k16)
    assert(capped.filter(col("in_cap")).count() === 0)
    assert(capped.filter(!col("in_cap")).count() === 200)
    val spread = (0L until 200L)
      .map(i => (i, Array(1.0f), i % 16)).toDF("vec_id", "embedding", "ivf_list")
    assert(SimilarityOps.semanticCapped(spread, k16)
      .filter(col("in_cap")).count() === 200)
    // floor: the cap never drops below ListCapFloor, so a tiny corpus
    // whose one list (pop 30) is under the floor stays in cap even though
    // the relative formula would cap it at ceil(4·30/16) = 8
    val tiny = (0L until 30L)
      .map(i => (i, Array(1.0f), 0L)).toDF("vec_id", "embedding", "ivf_list")
    assert(SimilarityOps.semanticCapped(tiny, k16)
      .filter(col("in_cap")).count() === 30)
  }
}
