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

  test("large-star/small-star: a 10k-hop chain converges within the O(log n) budget " +
      "that min-label propagation provably cannot meet") {
    import org.apache.spark.sql.functions._
    val n = 10000L
    val edges = spark.range(n)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    // 30 rounds ≪ the 10k rounds an O(diameter) algorithm needs here
    val labels = DedupOps.connectedComponents(edges, maxIter = 30)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label"))
    assert(labels.length === n + 1)
    assert(labels.forall(_._2 === 0L),
      labels.filter(_._2 != 0L).take(5).mkString(","))
    // why the old algorithm is out: min-label propagation moves the
    // correct label ONE hop per round (node i holds max(0, i−k) after k
    // rounds) — demonstrate the front after 5 rounds sits at exactly
    // n−5 on the far end, so ANY fixed budget b labels node n wrongly
    // for a chain longer than b
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    var lp = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    for (_ <- 1 to 5) {
      val nm = sym.join(lp, sym("src") === lp("id"))
        .groupBy(col("dst").as("id2")).agg(min(col("label")).as("nl"))
      lp = lp.join(nm, lp("id") === col("id2"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
        .localCheckpoint(true)
    }
    val farEnd = lp.filter(col("id") === n).head().getAs[Long]("label")
    assert(farEnd === n - 5L,
      s"label front moved ${n - farEnd} hops in 5 rounds — expected exactly 5")
  }

  test("star rounds: multi-component, reversed/duplicate edges, self-loops") {
    // two components sharing no nodes, edges given in both orders with
    // dups, plus a self-loop-only node that must keep its own label
    val edges = Seq((7L, 3L), (3L, 7L), (3L, 5L), (5L, 9L), (7L, 3L),
      (20L, 21L), (42L, 42L)).toDF("id_a", "id_b")
    val got = DedupOps.connectedComponents(edges)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("label")).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 9L -> 3L,
      20L -> 20L, 21L -> 20L, 42L -> 42L))
  }
}
