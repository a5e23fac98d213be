package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `Test/runMain graft.PlanProbe <query>...`
  * prints each registry query's EXECUTED plan (post-AQE) on sf0.001 —
  * the loop used while pinning plan shapes in PlanSpec. Not part of any
  * gate; a development tool like the python helpers under tools/.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      df.collect()
      println(s"===== $q =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
