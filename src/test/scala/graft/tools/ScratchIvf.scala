package graft.tools

import graft.operators.SimilarityOps
import org.apache.spark.sql.SparkSession

/** Throwaway: IVF recall across SFs (not part of the library surface). */
object ScratchIvf {
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
    import org.apache.spark.sql.functions._
    for (sf <- Seq("sf0.01"); np <- Seq(1, 2, 4, 8)) {
      val dir = s"/root/testdata/$sf"
      val exact = SimilarityOps.bruteForceTopK(spark, dir)
        .select(col("query_id"), col("neighbor_id"))
      val approx = SimilarityOps.ivfTopK(spark, dir, nProbe = np)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
      val tot = exact.count()
      println(s"IVFDBG $sf nProbe=$np hit=$hit/$tot")
    }
    // nProbe=8 should equal brute force — diff the row sets
    val dir = "/root/testdata/sf0.01"
    val bf = SimilarityOps.bruteForceTopK(spark, dir)
    val ivf8 = SimilarityOps.ivfTopK(spark, dir, nProbe = 8)
    println("IVFDBG only-in-bf:")
    bf.exceptAll(ivf8).collect().foreach(r => println(s"IVFDBG   $r"))
    println("IVFDBG only-in-ivf8:")
    ivf8.exceptAll(bf).collect().foreach(r => println(s"IVFDBG   $r"))
    spark.stop()
  }
}
