package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    val docs = Tables.documents(spark, dir)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val shingles = docs
      .select(col("doc_id"), posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("t1", lead(col("tok"), 1).over(wDoc))
      .withColumn("t2", lead(col("tok"), 2).over(wDoc))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("tok"))
      .dropDuplicates("doc_id", "tok")
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
