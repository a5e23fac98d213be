package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: EXECUTE the named queries (noop sink, the bench's timed
  * action) and dump the FINAL executed plan — with AQE on, the initial
  * `explain()` plan ([[Explain]]) hides runtime re-optimization
  * (ReusedExchange, AQEShuffleRead coalescing, join-strategy rewrites),
  * so plan-shape claims ("2 Exchange → 1", "this self-join re-evaluates
  * its input") must be checked against THIS output, not the initial
  * plan. Session config mirrors Bench (same cpus/shuffle-partition
  * knobs) so the captured shape is the shape the bench measures.
  *
  * Usage: runMain graft.ExplainExec <sfDir> [queryName ...]
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // r18: the default 100-entry codegen cache cannot hold a 360-query
      // registry — every bench rep re-ran Janino compilation for every
      // query (q101 spent ~3 s/rep compiling; back-to-back reps with a
      // warm cache ran the same query in 0.6 s). A warm session keeps
      // its compiled code; entries are weak-referenced classes, ~tens
      // of KB each. Static conf — must be set before session start.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "45s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            df.write.mode("overwrite").format("noop").save()
            // after execution the QueryExecution holds the final
            // adaptive plan; formatted mode prints it with details
            println(df.queryExecution.explainString(
              ExplainMode.fromString("formatted")))
          } catch { case e: Throwable =>
            println(s"FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
        case None => println(s"unknown query: $n")
      }
    }
    spark.stop()
  }
}
