package graft.dq

import graft.sources.Readers
import org.apache.spark.sql.SparkSession

/** The DQ runner (SURVEY.md §3.2) as a plain main — the engine-side
  * replacement for `python i94_data_quality_check.py` + its Airflow
  * wrapper. Differences from the reference, on purpose: single evaluation
  * per table (the reference re-ran the null check up to 3×), and a
  * **nonzero exit code on failure** (the reference logged errors but
  * always exited 0 — i94_data_quality_check.py:291).
  *
  * Usage: runMain graft.dq.DqMain <dataDir> <table[:keyCol,keyCol...]> ...
  * e.g.:  runMain graft.dq.DqMain /tmp/etl_out i94_visa:visa_id i94_travel_mode:mode_id
  */
object DqMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DqMain <dataDir> <table[:keys]>...")
    val dataDir = args(0)
    val specs = args.drop(1).toSeq.map { a =>
      a.split(":", 2) match {
        case Array(t, ks) => t -> ks.split(",").toSeq.filter(_.nonEmpty)
        case Array(t)     => t -> Nil
      }
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val reports = specs.map { case (table, keys) =>
      val path = s"$dataDir/$table"
      // table-existence check (the reference's list-objects / isdir branch)
      if (!new java.io.File(path).isDirectory) {
        DataQuality.DqReport(table, 0, nonEmpty = false, Nil)
      } else {
        DataQuality.check(table, Readers.parquetOrCsv(spark, path), keys)
      }
    }
    reports.foreach { r =>
      val status = if (r.passed) "PASS" else "FAIL"
      val nulls = r.nullKeys.map(k => s"${k.column}=${k.nullCount}").mkString(",")
      println(s"[dq] $status ${r.table} rows=${r.rowCount}" +
        (if (nulls.nonEmpty) s" nullKeys[$nulls]" else ""))
    }
    spark.stop()
    if (reports.exists(!_.passed)) sys.exit(1)
  }
}
