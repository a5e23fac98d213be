package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents whose shingle
  * sets overlap a held-out "benchmark" set — the pre-training hygiene pass
  * that keeps eval data out of the training corpus.
  *
  * Scale stance: the benchmark side is small by construction (eval suites
  * are thousands of docs, not billions) → its distinct shingles broadcast;
  * the corpus side is one scan + explode + broadcast semi-join + groupBy
  * (doc_id). No shuffle touches the corpus until the per-doc aggregation,
  * and that one is partial-agg reduced.
  */
object ContaminationOps {

  /** Per-doc contamination ratio vs the benchmark docs (deterministic
    * stand-in: every doc_id ≡ 0 (mod benchMod)): |shingles ∩ benchmark| /
    * |shingles|, emitted for non-benchmark docs at or above `threshold`.
    * Integer counts + one rounded division keep cross-engine hash parity.
    */
  def contamination(spark: SparkSession, dir: String,
      benchMod: Int = 100, threshold: Double = 0.5): DataFrame = {
    // the dedup family's shingle stage, WITHOUT the df cap: hot shingles
    // are precisely the contamination signal here, and the benchmark join
    // is bounded by the (small) benchmark side, not shingle frequency.
    // Session-cached — q61 and q65 share it with the dedup pipelines.
    val shingles = DedupOps.cachedDistinctShingles(spark, dir)
    val benchShingles = shingles
      .filter(pmod(col("doc_id"), lit(benchMod)) === 0)
      .select(col("tok")).distinct()
    val corpus = shingles.filter(pmod(col("doc_id"), lit(benchMod)) =!= 0)
    val perDoc = corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(benchShingles), "tok")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_contaminated"))
    perDoc.join(hits, Seq("doc_id"))
      .withColumn("ratio",
        round(col("n_contaminated").cast("double") / col("n_shingles").cast("double"), 4))
      .filter(col("ratio") >= threshold)
      .select(col("doc_id"), col("n_shingles"), col("n_contaminated"), col("ratio"))
      .orderBy(col("doc_id"))
  }
}
