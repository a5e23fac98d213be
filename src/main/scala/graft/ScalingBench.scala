package graft

import org.apache.spark.sql.SparkSession

/** Empirical scaling probe for the dedup family (q27-q30, q53, q59): runs
  * each query across the available SF series and prints per-query times
  * plus the fitted log-log slope vs document count. A near-dup pipeline
  * that went quadratic shows a slope near 2 between the 10× steps; the
  * df-capped/bucket-capped pipelines should stay near (or below) 1 once
  * per-job fixed overhead is amortized. Results land in SCALING.md.
  *
  *   runMain graft.ScalingBench [sfDir ...]
  */
object ScalingBench {

  val family: Seq[String] = Seq("q27_dedup_exact", "q28_ngram_jaccard",
    "q29_minhash_neardup", "q30_simhash_neardup", "q53_dedup_clusters",
    "q59_dedup_keeplist")

  /** Build k-times-scaled corpora from sf0.1: copy c suffixes every token
    * with a copy marker, so each copy keeps the original's exact
    * token/shingle frequency DISTRIBUTION (same workload shape) while
    * sharing zero shingles across copies (no artificial cross-copy
    * near-dup pairs, no artificial hot shingles — an earlier interleaving
    * variant accidentally created unigram-like `cpN X cpN` shingles and
    * measured the degenerate-postings case instead of scale-up).
    * Scaling-probe artifacts only; correctness always runs on the
    * driver-provided testdata.
    */
  private def synthDirs(spark: SparkSession, base: String): Seq[String] = {
    import org.apache.spark.sql.functions._
    val src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    Seq(2, 4, 8).map { k =>
      val dir = s"$base/v2x$k"
      val out = s"$dir/documents.parquet"
      if (!graft.etl.HadoopIo.exists(spark, out)) {
        val copies = (0 until k).map { c =>
          src.select(
            (col("doc_id") * k + c).as("doc_id"),
            (if (c == 0) col("text")
             else regexp_replace(col("text"), "(\\S+)", s"$$1zq$c")).as("text"),
            col("lang"), col("source"), col("n_chars"))
        }
        copies.reduce(_ unionByName _).write.mode("overwrite").parquet(out)
      }
      dir
    }
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty && args.head != "synth") args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val allDirs =
      if (args.headOption.contains("synth"))
        Seq("/root/testdata/sf0.1") ++ synthDirs(spark, "/tmp/graft-scale")
      else dirs
    // validate BEFORE the expensive warm-up/count work
    require(allDirs.size >= 2,
      s"need at least 2 dirs to fit a scaling slope, got $allDirs")
    // warm-up: JIT + codegen caches, untimed
    SparkEntry.queries("q27_dedup_exact")(spark, allDirs.head)
      .write.mode("overwrite").format("noop").save()

    val nDocs = allDirs.map(d => d ->
      spark.read.parquet(s"$d/documents.parquet").count().toDouble).toMap
    val rows = family.map { q =>
      val times = allDirs.map { d =>
        // each timed run must measure the FULL pipeline: evict the dedup
        // session caches properly (clearCache() alone would leave the
        // cache maps serving unpersisted frames that silently recompute)
        graft.operators.DedupOps.clearSessionCaches(spark)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).write.mode("overwrite").format("noop").save()
        d -> (System.nanoTime() - t0) / 1e9
      }
      // slope of log(time) vs log(n_docs) over the largest step (least
      // fixed-overhead distortion)
      val (dA, tA) = times(times.length - 2)
      val (dB, tB) = times.last
      val slope = math.log(tB / tA) / math.log(nDocs(dB) / nDocs(dA))
      (q, times.map(_._2), slope)
    }
    val json = rows.map { case (q, ts, slope) =>
      s""""$q":{"sec":[${ts.map(t => f"$t%.2f").mkString(",")}],"slope":${f"$slope%.2f"}}"""
    }.mkString("{", ",", "}")
    val docsJson = allDirs.map(d => s""""$d":${nDocs(d).toLong}""").mkString("{", ",", "}")
    println(s"""{"metric":"dedup_scaling","n_docs":$docsJson,"queries":$json}""")
    spark.stop()
  }
}
