package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Adversarial-scale behavior of the dedup pipelines: degenerate corpora
  * (thousands of identical documents) must not send the LSH self-joins
  * quadratic, and the connected-components fixpoint must survive deep
  * chains without plan-depth blowup.
  */
class DedupScaleSpec extends SparkSpecBase {
  import spark.implicits._

  // 1000 identical docs (the classic bucket-exploder) + one planted
  // near-dup pair with rare shingles (ids 2000/2001, 3-gram jaccard 0.6)
  private lazy val adversarial = {
    val hot = (0L until 1000L).map(i =>
      (i, "lorem ipsum dolor sit amet consectetur adipiscing elit repeated"))
    val planted = Seq(
      (2000L, "alpha beta gamma delta epsilon zeta"),
      (2001L, "alpha beta gamma delta epsilon eta"))
    (hot ++ planted).toDF("doc_id", "text")
  }

  test("simhash chunk cap bounds candidates on 1k identical docs") {
    // uncapped: every identical doc shares every chunk -> ~C(1000,2) pairs
    val uncapped = DedupOps.simhashChunkCandidates(adversarial,
      bucketCap = Long.MaxValue).count()
    assert(uncapped >= 1000L * 999 / 2, s"uncapped=$uncapped")
    // capped: the hot chunks (population 1000 > 50) are dropped; only the
    // planted pair (chunk population 2) survives as a candidate
    val capped = DedupOps.simhashChunkCandidates(adversarial).collect()
    assert(capped.length < 10, s"capped=${capped.length}")
    assert(!capped.exists(r =>
      r.getAs[Long]("id_a") < 1000 && r.getAs[Long]("id_b") < 1000))
  }

  test("minhash df+bucket caps exclude the identical-doc cluster, keep the planted pair") {
    val pairs = DedupOps.minhashNearDupDF(adversarial).collect()
    // identical docs' shingles have df=1000 > cap(50) -> dropped from the
    // postings entirely (they are exactDedup's job), so no pair can have
    // both ends in the hot cluster
    assert(!pairs.exists(r =>
      r.getAs[Long]("id_a") < 1000 && r.getAs[Long]("id_b") < 1000))
    val planted = pairs.find(r =>
      r.getAs[Long]("id_a") == 2000L && r.getAs[Long]("id_b") == 2001L)
    assert(planted.isDefined, pairs.mkString(","))
    // shared shingles 3 of union 5
    assert(planted.get.getAs[Double]("jaccard") === 0.6)
  }

  test("exact jaccard also drops the hot cluster but keeps the planted pair") {
    val pairs = DedupOps.ngramJaccardPairsDF(adversarial).collect()
    assert(!pairs.exists(r =>
      r.getAs[Long]("id_a") < 1000 && r.getAs[Long]("id_b") < 1000))
    assert(pairs.exists(r =>
      r.getAs[Long]("id_a") == 2000L && r.getAs[Long]("id_b") == 2001L))
  }

  test("connectedComponents converges a 50-hop chain (lineage truncated)") {
    val edges = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedComponents(edges, maxIter = 60)
    val got = labels.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
    assert(got.length === 51)
    assert(got.forall(_._2 === 0L), got.filter(_._2 != 0L).take(5).mkString(","))
  }
}
