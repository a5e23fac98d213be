package graft.etl

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Volume integration: the full 13-table pipeline over ~15k synthetic raw
  * I94 rows derived deterministically from the orders testdata (four
  * months, planted duplicates, junk dates, nulls) — the fixture suite
  * checks semantics row-by-row; this checks the pipeline shape holds at
  * real volume.
  */
class EtlVolumeSpec extends SparkSpecBase {

  /** orders → pseudo-I94, shared with the main-scope ManifestRun (the
    * committed ETL_RUN.json is the same generator at the same SF). */
  private def syntheticRaw: DataFrame = SyntheticI94.raw(spark, "/root/testdata/sf0.01")

  test("13-table pipeline at 15k rows: dedup, counts, partition layout") {
    val out = Files.createTempDirectory("graft-etl-vol").toString
    val raw = spark.createDataFrame(syntheticRaw.rdd, Schemas.rawI94)
    val nRaw = raw.count()
    val res = EtlPipeline.runAll(spark, Seq(raw),
      Fixtures.airports(spark), Fixtures.demographics(spark),
      Fixtures.dictionary, out)

    // duplicates collapsed: trips = distinct cicids
    val nDistinct = raw.dropDuplicates().count()
    assert(nDistinct < nRaw)
    assert(res.rowCounts("i94_trips") === nDistinct)
    assert(res.rowCounts("i94_immigrations") === nDistinct)

    // four month partitions written
    val months = new java.io.File(s"$out/i94_trips/i94_year=2016").list().sorted
    assert(months.toSeq === Seq("i94_month=1", "i94_month=2", "i94_month=3", "i94_month=4"))

    // month-pruned read returns only that month's rows
    val m1 = spark.read.parquet(s"$out/i94_trips").filter(col("i94_month") === 1)
    val expected = res.tables("i94_trips").filter(col("i94_month") === 1).count()
    assert(m1.count() === expected && expected > 0)

    // flights: null fltno rows filtered, distinct airline+fltno pairs
    assert(res.rowCounts("i94_flights") > 0)

    // long-safe admnum: no nulls introduced by the bigint cast
    val nullAdm = res.tables("i94_trips")
      .filter(col("admissions_number").isNull).count()
    assert(nullAdm === 0)

    // DQ over the written output passes
    val rep = graft.dq.DataQuality.check("i94_trips",
      graft.sources.Readers.parquetOrCsv(spark, s"$out/i94_trips"),
      Seq("custom_client_id", "admissions_number"))
    assert(rep.passed)
  }

  test("amplified volume (x10, ~150k raw): row conservation holds — trips = amplify * base distinct, dup rate stays 10%") {
    val out = Files.createTempDirectory("graft-etl-vol10").toString
    val amp = SyntheticI94.raw(spark, "/root/testdata/sf0.01", amplify = 10)
    val raw = spark.createDataFrame(amp.rdd, Schemas.rawI94)
    val nRaw = raw.count()
    val baseDistinct = syntheticRaw.dropDuplicates().count()
    // amplification stretches the orderkey space bijectively: every
    // amplified copy is a DISTINCT trip and the planted 10% duplicate
    // rate is unchanged, so conservation is exact, not approximate
    val nDistinct = raw.dropDuplicates().count()
    assert(nDistinct === baseDistinct * 10,
      s"amplified distinct $nDistinct != 10 * base $baseDistinct")
    assert(nRaw === (nDistinct * 11) / 10,
      s"planted dup rate drifted: raw $nRaw vs distinct $nDistinct")
    val res = EtlPipeline.runAll(spark, Seq(raw),
      Fixtures.airports(spark), Fixtures.demographics(spark),
      Fixtures.dictionary, out)
    assert(res.rowCounts("i94_trips") === nDistinct)
    assert(res.rowCounts("i94_immigrations") === nDistinct)
    // the written table conserves rows through the partitioned sink
    assert(spark.read.parquet(s"$out/i94_trips").count() === nDistinct)
  }
}
