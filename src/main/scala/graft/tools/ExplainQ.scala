package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-audit main (not part of the library surface): print the
  * formatted physical plan of named `SparkEntry.queries` entries —
  * the per-round "is this the plan you'd want at 100 TB" check
  * (broadcast vs shuffle joins, PushedFilters/ReadSchema on scans,
  * WholeStageCodegen span coverage).
  *
  * Usage: runMain graft.tools.ExplainQ <sfDir> <queryName> [more...]
  */
object ExplainQ {
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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    for (name <- args.drop(1)) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
