package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage profile of the q30 simhash pipeline — signatures vs
  * chunk-candidate join vs exact verification.
  */
object ScratchSimhash {
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
    val docs = Tables.documents(spark, dir)
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SIMPROF $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm-up
    DedupOps.simhashNearDupDF(docs).write.mode("overwrite").format("noop").save()
    for (_ <- 1 to 3) {
      DedupOps.clearSessionCaches(spark)
      t("signatures") {
        DedupOps.simhashSignatures(docs).write.mode("overwrite").format("noop").save()
      }
      t("candidates") {
        DedupOps.simhashChunkCandidates(docs).write.mode("overwrite").format("noop").save()
      }
      t("full q30") {
        DedupOps.simhashNearDupDF(docs).write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
