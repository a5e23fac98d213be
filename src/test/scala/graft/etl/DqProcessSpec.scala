package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.sys.process._

/** The DQ exit-code contract as a PROCESS (verdict-r8 item 5): the
  * reference's DQ logs failures but always exits 0
  * (`i94_data_quality_check.py:264-288`); this engine exits 1 — the
  * divergence is deliberate, and it must hold at the process boundary an
  * Airflow-style orchestrator actually observes, not just in the library
  * function ConfigRunSpec already gates. The table under test first
  * survives the two operational writes a production table sees between
  * loads and DQ runs — a dynamic-partition month re-load
  * ([[Sinks.overwritePartitions]]) and a compaction ([[Sinks.compact]]).
  */
class DqProcessSpec extends SparkSpecBase {

  private def codeDir(c: Class[_]): String =
    new java.io.File(c.getProtectionDomain.getCodeSource.getLocation.toURI).toString

  /** Fork `graft.dq.DqMain` in a fresh JVM and return its exit code —
    * the same two-JVM mechanism CatalogSpec uses for metastore isolation.
    */
  private def dqProcess(args: String*): Int = {
    val mainClasses = codeDir(classOf[EtlConfig])
    val sparkJars = new java.io.File(
      codeDir(classOf[org.apache.spark.sql.SparkSession])).getParent
    val cp = s"$mainClasses:$sparkJars/*"
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val opens = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq
    Process(Seq(javaBin) ++ opens ++ Seq("-Xmx2g", "-cp", cp,
      "graft.dq.DqMain") ++ args).!
  }

  test("DqMain exits 0 on clean output and 1 on an injected null key; " +
      "the table survives partition re-load + compaction first") {
    val base = Files.createTempDirectory("graft-dq-proc").toString
    val out = s"$base/output"
    val res = EtlPipeline.runAll(spark, Seq(Fixtures.rawI94(spark)),
      Fixtures.airports(spark), Fixtures.demographics(spark),
      Fixtures.dictionary, out)

    // operational write 1: re-load month 1 via dynamic partition
    // overwrite — idempotent, so the table is row-identical after
    val spec = Sinks.registry.find(_.name == "i94_trips").get
    val before = spark.read.parquet(s"$out/i94_trips").count()
    Sinks.overwritePartitions(
      res.tables("i94_trips").filter(col("i94_month") === 1), spec, out)
    assert(spark.read.parquet(s"$out/i94_trips").count() === before)

    // operational write 2: compact an unpartitioned copy down to 2 files
    val flat = s"$base/trips_flat"
    spark.read.parquet(s"$out/i94_trips").write.parquet(flat)
    val n = Sinks.compact(spark, flat, targetFiles = 2)
    assert(n === before)
    // coalesce can only lower parallelism: at most targetFiles files
    val nFiles = new java.io.File(flat).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 1 && nFiles <= 2)

    // process phase 1: clean output → exit 0 (trips keys + a dim)
    assert(dqProcess(out, "i94_trips:custom_client_id,admissions_number",
      "i94_visa:visa_id") === 0, "clean DQ run must exit 0")
    // the compacted standalone table is also DQ-clean through the same
    // process surface (bare parquet dir via the parquet-or-csv reader)
    assert(dqProcess(base, "trips_flat:custom_client_id") === 0)

    // inject a null-key violation: append one row with a null
    // custom_client_id into the live partitioned table
    val trips = spark.read.parquet(s"$out/i94_trips")
    trips.limit(1)
      .withColumn("custom_client_id",
        lit(null).cast(trips.schema("custom_client_id").dataType))
      .write.mode("append").partitionBy("i94_year", "i94_month")
      .parquet(s"$out/i94_trips")

    // process phase 2: the violation must surface as a NONZERO exit —
    // the reference's process exits 0 here; ours is the failure branch
    // an orchestrator can actually route on
    assert(dqProcess(out, "i94_trips:custom_client_id,admissions_number")
      === 1, "null-key violation must exit 1")
    // and the untouched dim still passes in the same output dir
    assert(dqProcess(out, "i94_visa:visa_id") === 0)
  }
}
