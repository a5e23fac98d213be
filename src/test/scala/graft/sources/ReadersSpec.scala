package graft.sources

import graft.SparkSpecBase
import graft.etl.Fixtures
import java.nio.file.Files

class ReadersSpec extends SparkSpecBase {

  test("csv readers: header + delimiter options, schema pinned all-string") {
    val dir = Files.createTempDirectory("graft-src").toString
    Fixtures.airports(spark).write.option("header", "true").csv(s"$dir/airports")
    Fixtures.demographics(spark).write
      .options(Map("header" -> "true", "delimiter" -> ";")).csv(s"$dir/demo")
    val a = Readers.airportsCsv(spark, s"$dir/airports")
    assert(a.count() === 2)
    assert(a.schema.fields.forall(_.dataType.typeName === "string"))
    val d = Readers.demographicsCsv(spark, s"$dir/demo")
    assert(d.count() === 3)
    assert(d.columns.contains("Median Age")) // space-named columns survive
  }

  test("parquetOrCsv: parquet first, csv fallback (the DQ re-read path)") {
    val dir = Files.createTempDirectory("graft-src2").toString
    Fixtures.airports(spark).write.parquet(s"$dir/p")
    Fixtures.airports(spark).write.option("header", "true").csv(s"$dir/c")
    assert(Readers.parquetOrCsv(spark, s"$dir/p").count() === 2)
    assert(Readers.parquetOrCsv(spark, s"$dir/c").count() === 2)
  }

  test("rawI94 parquet ingest round-trips the pinned 28-col schema") {
    val dir = Files.createTempDirectory("graft-src3").toString
    Fixtures.rawI94(spark).write.parquet(s"$dir/i94")
    val got = Readers.rawI94(spark, s"$dir/i94")
    assert(got.schema === graft.etl.Schemas.rawI94)
    assert(got.count() === 4)
  }
}
