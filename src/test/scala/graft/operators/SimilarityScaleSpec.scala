package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Adversarial-scale behavior of the embedding-LSH pipelines, mirroring
  * DedupScaleSpec for text: a corpus with a mass-duplicated vector (the
  * scraped-data degenerate case) must not send the bucket self/probe joins
  * quadratic, while planted near-neighbors outside the mass still surface.
  */
class SimilarityScaleSpec extends SparkSpecBase {
  import spark.implicits._

  private val Dim = 8
  private val rnd = new scala.util.Random(7L)
  private def randVec(): Array[Float] =
    Array.fill(Dim)(rnd.nextGaussian().toFloat)

  // 1000 identical vectors (ids 3000+), 50 distinct background vectors
  // (ids 0-49 — the first 8 double as lshTopK's query set), and one
  // planted near-pair (ids 1000/1001, cosine ~0.999) distinct from the mass
  private lazy val adversarial = {
    val massVec = Array.fill(Dim)(0.5f)
    val mass = (0L until 1000L).map(i => (3000L + i, massVec))
    val background = (0L until 50L).map(i => (i, randVec()))
    val base = randVec()
    val nearA = base
    val nearB = base.zipWithIndex.map { case (x, i) =>
      x + (if (i == 0) 0.01f else 0f)
    }
    val planted = Seq((1000L, nearA), (1001L, nearB))
    (mass ++ background ++ planted).toDF("vec_id", "embedding")
  }

  private def inMass(id: Long): Boolean = id >= 3000L

  test("lshNearDup candidates: population cap excludes the duplicated mass, keeps the planted pair") {
    // uncapped: the mass shares every table's bucket -> ~C(1000,2) pairs
    val uncapped = SimilarityOps.lshNearDupCandidates(
      adversarial.select(col("vec_id"), col("embedding")),
      bucketCap = Long.MaxValue).count()
    assert(uncapped >= 1000L * 999 / 2, s"uncapped=$uncapped")
    // capped (corpus-relative default): mass buckets (pop >= 1000, cap
    // ~= 4*1052/16 = 263) are dropped in EVERY table, so no pair has both
    // ends in the mass; candidate volume collapses by orders of magnitude
    val capped = SimilarityOps.lshNearDupCandidates(
      adversarial.select(col("vec_id"), col("embedding"))).collect()
    assert(capped.length < uncapped / 100, s"capped=${capped.length}")
    assert(!capped.exists(r =>
      inMass(r.getAs[Long]("id_a")) && inMass(r.getAs[Long]("id_b"))))
    // the planted near-pair still surfaces through the full pipeline with
    // its exact cosine
    val pairs = SimilarityOps.lshNearDupDF(adversarial, threshold = 0.9).collect()
    val planted = pairs.find(r =>
      r.getAs[Long]("id_a") == 1000L && r.getAs[Long]("id_b") == 1001L)
    assert(planted.isDefined, pairs.take(5).mkString(","))
    assert(planted.get.getAs[Double]("cos") >= 0.99)
  }

  test("lshTopK candidates: corpus-side cap keeps probe volume bounded, queries keep other tables") {
    val candidates = SimilarityOps.lshTopKCandidates(adversarial,
      nQueries = 8, nPlanes = 4, nTables = 32).collect()
    // mass vectors live only in over-cap buckets -> never candidates
    assert(!candidates.exists(r => inMass(r.getAs[Long]("vec_id"))),
      candidates.count(r => inMass(r.getAs[Long]("vec_id"))).toString)
    // bounded: at most (background + planted) per query, not 1000+ per query
    assert(candidates.length <= 8 * 52, s"n=${candidates.length}")
    // queries still get real candidates from their surviving tables
    val perQuery = candidates.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length)
    assert(perQuery.size == 8, perQuery.toMap.toString)
    assert(perQuery.values.forall(_ > 0), perQuery.toMap.toString)
  }

  test("semanticDedup list cap: mega-list skips pairwise, exact-collapse backstop still dedups it") {
    // hand-built assignment isolating the cap mechanics from codebook
    // choice: one mega list (the 1000-copy mass), the planted near-pair in
    // list 1, backgrounds spread over lists 1-7; codebook cardinality 8
    // ⇒ corpus-relative cap = max(32, ceil(4·1052/8)) = 526 < 1000, so
    // ONLY the mass list is over cap
    val assigned = adversarial.select(col("vec_id"), col("embedding"),
      when(col("vec_id") >= 3000L, lit(0L))
        .when(col("vec_id").isin(1000L, 1001L), lit(1L))
        .otherwise(pmod(col("vec_id"), lit(7)) + 1).as("ivf_list"))
    val kDf = spark.range(1).select(lit(8L).as("k"))
    // uncapped: the mega list alone contributes C(1000,2) pairs
    val uncapped = SimilarityOps.semanticListPairs(
      SimilarityOps.semanticCapped(assigned, kDf, listCap = Long.MaxValue)).count()
    assert(uncapped >= 1000L * 999 / 2, s"uncapped=$uncapped")
    // corpus-relative cap: mass pairs never materialize
    val capped = SimilarityOps.semanticListPairs(
      SimilarityOps.semanticCapped(assigned, kDf)).collect()
    assert(capped.length < uncapped / 100, s"capped=${capped.length}")
    assert(!capped.exists(r =>
      inMass(r.getAs[Long]("id_a")) && inMass(r.getAs[Long]("id_b"))))
    // end-to-end verdicts: the mass still dedups (exact-collapse backstop
    // keeps only its min id), the planted near-pair still resolves through
    // the in-cap pairwise (1000 kept, 1001 dropped), backgrounds survive
    val verdicts = SimilarityOps.semanticDedupOn(assigned, kDf, threshold = 0.9)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("kept")).toMap
    assert(verdicts(3000L) === 1)
    assert((3001L until 4000L).forall(verdicts(_) === 0))
    assert(verdicts(1000L) === 1)
    assert(verdicts(1001L) === 0)
    assert((0L until 50L).forall(verdicts(_) === 1))
  }

  test("semanticDedup corpus-relative cap never fires on healthy testdata: capped == uncapped") {
    // the q75 regression pin: at the default cap (4× expected list
    // population) the oracle-gated label-codebook output is bit-identical
    // to a fully uncapped run on the driver-provided testdata
    val emb = graft.Tables.embeddings(spark, sf0001)
    val assigned = SimilarityOps.ivfAssign(emb, SimilarityOps.labelCentroids(emb))
    val kDf = emb.agg(countDistinct(col("label")).as("k"))
    val capped = SimilarityOps.semanticDedupOn(assigned, kDf, 0.35).collect()
    val uncapped = SimilarityOps.semanticDedupOn(assigned, kDf, 0.35,
      listCap = Long.MaxValue).collect()
    assert(capped.length > 0)
    assert(capped.map(_.toSeq).toSeq === uncapped.map(_.toSeq).toSeq)
  }

  test("sized codebook (kFor + sampledCentroids): healthy corpus verdicts match uncapped; structure holds") {
    // healthy corpus: the 50 distinct backgrounds + the planted near-pair
    val healthy = adversarial.filter(col("vec_id") < 3000L)
    val k = SimilarityOps.kFor(52, targetList = 16) // = 4 lists
    assert(k === 4)
    val cvec = SimilarityOps.sampledCentroids(healthy, k)
    assert(cvec.count() === k)
    val assigned = SimilarityOps.ivfAssign(healthy, cvec)
    // every vector assigned exactly once, to a sampled centroid id
    assert(assigned.count() === 52)
    assert(assigned.agg(countDistinct(col("vec_id"))).head.getLong(0) === 52)
    val kDf = spark.range(1).select(lit(k.toLong).as("k"))
    val capped = SimilarityOps.semanticDedupOn(assigned, kDf, 0.9).collect()
    val uncapped = SimilarityOps.semanticDedupOn(assigned, kDf, 0.9,
      listCap = Long.MaxValue).collect()
    assert(capped.map(_.toSeq).toSeq === uncapped.map(_.toSeq).toSeq)
    // the planted near-pair shares a list (near-identical vectors argmax to
    // the same centroid) and resolves: 1000 kept, 1001 dropped
    val verdicts = capped.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Int]("kept")).toMap
    assert(verdicts(1000L) === 1)
    assert(verdicts(1001L) === 0)
  }

  test("vectorExactDedup collapses the duplicated mass at linear cost") {
    val rows = SimilarityOps.vectorExactDedupDF(adversarial).collect()
    val mass = rows.find(_.getAs[Long]("canonical_id") == 3000L)
    assert(mass.isDefined)
    assert(mass.get.getAs[Long]("n_copies") === 1000L)
    // everything else is unique
    assert(rows.count(_.getAs[Long]("n_copies") == 1L) === 52)
    assert(rows.length === 53)
  }
}
