package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the r7 ADVICE fix: [[SimilarityOps.ivfPqTopK]]'s fused-scorer
  * LUT slots are assigned by RANK over query vec_id, and the ADC read
  * must go through that same rank (`qkey`), not the raw vec_id. With
  * dense ids 0..nQ−1 the two coincide — the q88 gate can never tell
  * them apart — so this spec remaps vec_id onto a sparse lattice
  * (vec_id × 3) where raw-id indexing reads the wrong (or absent) slot,
  * and requires the result to be EXACTLY the dense run modulo the id
  * mapping: every part of the pipeline (coarse assignment, residual
  * codebook, ADC scores, tiebreaks) is id-free or rank/monotone-based,
  * so ×3 must change ids and nothing else.
  */
class IvfPqSparseIdSpec extends SparkSpecBase {

  test("ivfPqTopK: sparse (non-dense) query vec_ids score from the right LUT slots") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sparse_emb").toString
    // same 500 vectors, ids on the ×3 lattice; nQueries = 22 selects
    // {0,3,…,21} — exactly the dense run's 8 query vectors
    graft.Tables.embeddings(spark, sf0001)
      .withColumn("vec_id", col("vec_id") * 3)
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val dense = SimilarityOps.ivfPqTopK(spark, sf0001, nQueries = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3)))
    val sparse = SimilarityOps.ivfPqTopK(spark, tmp, nQueries = 22)
      .collect().map(r => (r.getLong(0) / 3, r.getLong(1) / 3,
        r.getDouble(2), r.getInt(3)))
    assert(dense.nonEmpty)
    assert(sparse.toSeq === dense.toSeq)
  }
}
