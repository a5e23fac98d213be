package graft.operators

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataSketches KLL quantiles over a column — the industry-standard
  * mergeable quantile sketch (Karnin–Lang–Liberty, FOCS'16;
  * datasketches-java ships on the Spark classpath), A/B'd against
  * q327's deterministic rank-strided coreset by KllQuantileSpec.
  *
  * Where q327's coreset is cross-engine deterministic (its purpose: a
  * DuckDB-replayable gate with a PROVEN Σ-strides bound), KLL is the
  * production sketch: provable (ε, δ) rank error at O(k·log n) space
  * with RANDOMIZED compaction — the same corpus can yield different
  * (all within-bound) sketches, so it can never sit behind a
  * cell-exact oracle gate; it lives here as a spec-measured operator.
  *
  * Scale shape: one sketch per partition (mapPartitions — the
  * canonical per-partition imperative case), merged pairwise in a
  * reduce. The merge is exactly what a 1000-executor aggregation
  * tree does with KLL registered as a typed aggregator; at test scale
  * the ≤ `spark.sparkContext.defaultParallelism` serialized sketches
  * (≈3 KB each at k=200) reduce on the driver, which is O(partitions),
  * never O(rows).
  */
object KllQuantiles {

  /** Merged KLL sketch of `valueCol` (double). NULLs are skipped — the
    * standard sketch convention (a NULL carries no rank information);
    * without the filter a null row would NPE inside mapPartitions'
    * Double decode instead of being handled.
    */
  def sketch(df: DataFrame, valueCol: String, k: Int = 200): KllDoublesSketch = {
    val spark = df.sparkSession
    import spark.implicits._
    val blobs = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double")).as[Double]
      .mapPartitions { it =>
        val sk = KllDoublesSketch.newHeapInstance(k)
        it.foreach(sk.update)
        Iterator.single(sk.toByteArray)
      }.collect()
    val merged = KllDoublesSketch.newHeapInstance(k)
    blobs.foreach(b =>
      merged.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
    merged
  }

  /** Quantile estimates at the given percentiles (inclusive rank). */
  def quantiles(df: DataFrame, valueCol: String,
      percentiles: Seq[Int], k: Int = 200): Map[Int, Double] = {
    val sk = sketch(df, valueCol, k)
    percentiles.map(p => p -> sk.getQuantile(p / 100.0)).toMap
  }
}
