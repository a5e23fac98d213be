package graft.etl

import graft.SparkSpecBase
import java.nio.file.Files

class EtlPipelineSpec extends SparkSpecBase {

  test("runAll writes all 13 tables with the spec'd layout") {
    val out = Files.createTempDirectory("graft-etl").toString
    val res = EtlPipeline.runAll(spark,
      Seq(Fixtures.rawI94(spark)),
      Fixtures.airports(spark),
      Fixtures.demographics(spark),
      Fixtures.dictionary,
      out)
    assert(res.rowCounts.keySet === Sinks.registry.map(_.name).toSet)
    assert(res.rowCounts.values.forall(_ > 0))
    // partitioned parquet tables have Hive-style partition dirs
    val tripsDirs = new java.io.File(s"$out/i94_trips").list().toSeq
    assert(tripsDirs.exists(_.startsWith("i94_year=2016")))
    val monthDirs = new java.io.File(s"$out/i94_trips/i94_year=2016").list().toSeq
    assert(monthDirs.exists(_.startsWith("i94_month=4")))
    // CSV dims are plain csv
    assert(new java.io.File(s"$out/i94_visa").list().exists(_.endsWith(".csv")))
    // partition-pruned read round-trips
    val pruned = spark.read.parquet(s"$out/i94_trips")
      .filter(org.apache.spark.sql.functions.col("i94_month") === 4)
    assert(pruned.count() === res.rowCounts("i94_trips"))
    // the fact table's layout is PHYSICAL (WRITE_CONTRACT section 5):
    // arrival_date is range-clustered across files, so per-file zone
    // maps are mutually non-overlapping and a date window scans a
    // file subset (lenient stats read: the nullable key's all-null
    // leading chunk carries no min/max)
    val zm = ParquetZoneMaps.rowGroupStats(spark, s"$out/i94_trips",
      "arrival_date", requireStats = false).collect()
    assert(zm.nonEmpty)
    val ranges = zm.groupBy(_.file).values
      .map(rs => (rs.map(_.min_v).min, rs.map(_.max_v).max))
      .toSeq.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 <= b._1, s"overlapping file date ranges $a vs $b")
      case _ => ()
    }
  }

  test("union-by-name concat tolerates column order differences") {
    val a = Fixtures.rawI94(spark)
    val b = a.select(a.columns.reverse.map(org.apache.spark.sql.functions.col): _*)
    assert(EtlPipeline.concatRaw(Seq(a, b)).count() === a.count() * 2)
  }
}
