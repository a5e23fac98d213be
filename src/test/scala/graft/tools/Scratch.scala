package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    // warm-up
    SparkEntry.queries("q27_dedup_exact")(spark, dir)
      .write.mode("overwrite").format("noop").save()
    for (name <- names) {
      graft.operators.DedupOps.clearSessionCaches(spark)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"SCRATCH $name cold ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"SCRATCH $name warm ${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
