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

  /** orders → pseudo-I94: every column derived from order fields. */
  private def syntheticRaw: DataFrame = {
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.01")
    val base = o.select(
      col("o_orderkey").cast("double").as("cicid"),
      lit(2016.0).as("i94yr"),
      (pmod(col("o_orderkey"), lit(4)) + 1).cast("double").as("i94mon"),
      (pmod(col("o_custkey"), lit(200)) + 100).cast("double").as("i94cit"),
      (pmod(col("o_custkey"), lit(150)) + 100).cast("double").as("i94res"),
      element_at(array(lit("NYC"), lit("LAX"), lit("CHI")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("i94port"),
      when(col("o_orderkey") % 17 === 0, lit(null).cast("double"))
        .otherwise((lit(20545.0) + pmod(col("o_orderkey"), lit(120)))).as("arrdate"),
      (pmod(col("o_orderkey"), lit(3)) + 1).cast("double").as("i94mode"),
      element_at(array(lit("NY"), lit("CA"), lit("IL")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("i94addr"),
      when(col("o_orderkey") % 5 === 0, lit(null).cast("double"))
        .otherwise(lit(20600.0) + pmod(col("o_orderkey"), lit(60))).as("depdate"),
      (pmod(col("o_custkey"), lit(80)) + 18).cast("double").as("i94bir"),
      (pmod(col("o_orderkey"), lit(3)) + 1).cast("double").as("i94visa"),
      lit(1.0).as("count"),
      when(col("o_orderkey") % 11 === 0, lit("junk"))
        .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")).as("dtadfile"),
      lit("LND").as("visapost"),
      lit(null).cast("string").as("occup"),
      lit("G").as("entdepa"), lit("O").as("entdepd"),
      lit(null).cast("string").as("entdepu"), lit("M").as("matflag"),
      (lit(2016.0) - (pmod(col("o_custkey"), lit(80)) + 18)).as("biryear"),
      when(col("o_orderkey") % 7 === 0, lit("D/S"))
        .otherwise(date_format(col("o_orderdate"), "MMddyyyy")).as("dtaddto"),
      element_at(array(lit("F"), lit("M"), lit("U")),
        (pmod(col("o_custkey"), lit(3)) + 1).cast("int")).as("gender"),
      lit(null).cast("string").as("insnum"),
      element_at(array(lit("AA"), lit("DL"), lit("UA")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("airline"),
      (col("o_orderkey") * 100000L + 94953870030L).cast("double").as("admnum"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("FL"), pmod(col("o_orderkey"), lit(999)))).as("fltno"),
      lit("B2").as("visatype"))
    // plant exact duplicates: 10% of rows repeated
    base.unionAll(base.filter(col("cicid") % 10 === 0))
      .select(Schemas.rawI94.fieldNames.map(col): _*)
  }

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
}
