package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JIT/codegen + parquet footer reads, so the first
    // timed query doesn't absorb JVM startup
    try {
      SparkEntry.queries.get("q01_pricing_summary")
        .foreach(_(spark, sfDir).write.mode("overwrite").format("noop").save())
      SparkEntry.queries.get("q02_top_nations")
        .foreach(_(spark, sfDir).write.mode("overwrite").format("noop").save())
    } catch { case _: Throwable => () }
    val names = SparkEntry.queries.keys.toSeq.sorted
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      // noop sink forces full evaluation (count() would let Catalyst prune
      // projections/ordering and under-measure the query)
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          failed += name
          false
        }
      // a failing query reports a negative duration so it can never be
      // mistaken for a plausible measurement
      val dt = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) dt else -dt)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failed queries (negative markers) must not shrink the total — a run
    // with a broken expensive query would otherwise look FASTER
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    // compact summary AFTER the big per-query line: the driver captures the
    // TAIL of stdout, and round 2's full line was truncated mid-JSON,
    // losing the total — the last bytes must always carry the headline.
    // Distinct metric name so a consumer keying on "metric" never
    // double-counts the total.
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","n_queries":${names.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
