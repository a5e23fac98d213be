package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway (not library surface): the SemDeDup quadratic, made visible.
  *
  * ScalingBench's 8× corpus (16k vectors) is too small for the fixed-k
  * codebook's Σ|list|² pair stage to dominate fixed overhead (measured
  * slope 0.74 there). This harness extends the same rotation-synthesized
  * corpus to 16×/32× (32k/64k vectors) and, next to wall-clock, counts
  * the WITHIN-LIST PAIR VOLUME directly — the quantity that is n²/k with
  * the label codebook and ~n·targetList/2 with the kFor-sized one. The
  * pair count is exact arithmetic, immune to JVM noise, so it shows the
  * quadratic even where timing still hides it.
  *
  *   runMain graft.operators.ScratchSemScale
  */
object ScratchSemScale {

  private def corpus(spark: SparkSession, k: Int): DataFrame = {
    val esrc = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    (0 until k).map { c =>
      // same remap as ScalingBench.synthDirs: rotate by c (mod 64)
      // preserves within-copy cosine structure without cross-copy dups
      val rot = c % 64
      esrc.select(
        (col("vec_id") * k + c).as("vec_id"),
        (if (rot == 0) col("embedding")
         else concat(slice(col("embedding"), rot + 1, 64 - rot),
           slice(col("embedding"), 1, rot))).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata parquet marks timestamps isAdjustedToUTC=false; read them as
      // TIMESTAMP (UTC session) like every engine-side consumer expects
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (mult <- Seq(8, 16, 32)) {
      val emb = corpus(spark, mult).persist()
      val n = emb.count()
      for ((name, cvec, kDf) <- Seq(
        ("label", SimilarityOps.labelCentroids(emb),
          emb.agg(countDistinct(col("label")).as("k"))),
        ("sized", SimilarityOps.sampledCentroids(emb,
            SimilarityOps.kFor(n, targetList = 500L)),
          spark.range(1).select(
            lit(SimilarityOps.kFor(n, targetList = 500L).toLong).as("k"))))) {
        val assigned = SimilarityOps.ivfAssign(emb, cvec).persist()
        assigned.count()
        // exact pair volume, uncapped: the Σ|list|²/2 the codebook choice
        // controls
        val pairs = SimilarityOps.semanticListPairs(
          SimilarityOps.semanticCapped(assigned, kDf,
            listCap = Long.MaxValue)).count()
        val t0 = System.nanoTime()
        SimilarityOps.semanticDedupOn(assigned, kDf, threshold = 0.35)
          .write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"SEMSCALE n=$n%6d codebook=$name%-5s pairs=$pairs%12d sec=$dt%7.2f")
        assigned.unpersist()
      }
      emb.unpersist()
    }
    spark.stop()
  }
}
