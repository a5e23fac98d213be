package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (UTC, ANSI off — the
  * reference's pre-ANSI null-on-junk semantics).
  */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpecBase.session
  def sf0001 = "/root/testdata/sf0.001"
}

object SparkSpecBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // testdata parquet marks timestamps isAdjustedToUTC=false; read them as
    // TIMESTAMP (UTC session) like every engine-side consumer expects
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
