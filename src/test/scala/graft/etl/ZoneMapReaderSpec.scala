package graft.etl

import graft.SparkSpecBase
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Read-side zone-map file pruning (VERDICT r15 item 3): the reader
  * must schedule ONLY the files whose footer min/max overlap the
  * window, the scan's own `numFiles` metric must agree with both the
  * reader's accounting and the relational zone-map prediction (q351's
  * `parts_scanned` device), and the pruned result must equal the
  * full-scan result exactly.
  */
class ZoneMapReaderSpec extends SparkSpecBase {

  private def numFilesMetric(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.map(_.metrics("numFiles").value).sum
  }

  test("sorted layout: files-read metric == reader accounting == relational zone-map prediction; result equals full scan") {
    val out = Files.createTempDirectory("graft-zmr").toString
    val spec = Sinks.TableSpec("zr_t", Sinks.Parquet,
      sortCols = Seq("k"), layoutFiles = 16)
    // pseudo-shuffled key so arrival order carries no accidental sort
    val data = spark.range(40000)
      .select((col("id") * 48271 % 40000).as("k"), col("id").as("payload"))
    Sinks.write(data, spec, out)

    val (lo, hi) = (1000L, 2000L)
    // the q351 device, relationally: which files SHOULD a window scan
    val predicted = ZoneMapReader.fileStats(spark, s"$out/zr_t", "k")
      .filter(col("min_v") <= hi && col("max_v") >= lo).count().toInt
    val pr = ZoneMapReader.readRange(spark, spec, out, "k", lo, hi)
    assert(pr.filesTotal >= 16)
    assert(pr.filesKept === predicted)
    assert(pr.filesKept <= 2,
      s"range-clustered window should live in <=2 of ${pr.filesTotal} files")
    // the scan's own metric: pruned files never became input splits
    assert(numFilesMetric(pr.df) === pr.filesKept.toLong)

    val full = spark.read.parquet(s"$out/zr_t")
      .filter(col("k").between(lo, hi))
    assert(pr.df.count() === full.count())
    assert(pr.df.exceptAll(full).isEmpty && full.exceptAll(pr.df).isEmpty)
  }

  test("ETL i94_trips date window: dailyArrivals over the pruned read equals the full read; files pruned") {
    val out = Files.createTempDirectory("graft-zmr-etl").toString
    // volume fixture (EtlVolumeSpec's generator): the 4-row unit fixture
    // lands in too few files for a pruning readout
    val raw = spark.createDataFrame(
      SyntheticI94.raw(spark, "/root/testdata/sf0.001").rdd, Schemas.rawI94)
    EtlPipeline.runAll(spark, Seq(raw),
      Fixtures.airports(spark),
      Fixtures.demographics(spark),
      Fixtures.dictionary,
      out)
    val spec = Sinks.registry.find(_.name == "i94_trips").get
    // pick a window from the physical footers: the first file's range
    // (so the test is robust to fixture date drift)
    val st = ZoneMapReader.fileStats(spark, s"$out/i94_trips", "arrival_date")
      .orderBy(col("min_v")).collect()
    assert(st.length >= 4, s"layout should split trips into files: ${st.length}")
    val (lo, hi) = (st.head.getLong(2), st.head.getLong(3))
    val pr = ZoneMapReader.readRange(spark, spec, out, "arrival_date", lo, hi)
    assert(pr.filesKept < pr.filesTotal,
      s"window [$lo,$hi] should prune: kept ${pr.filesKept} of ${pr.filesTotal}")
    assert(numFilesMetric(pr.df) === pr.filesKept.toLong)
    // hive partition columns survive the explicit-file read
    assert(pr.df.columns.contains("i94_year") && pr.df.columns.contains("i94_month"))

    val epoch = lit("1970-01-01").cast("date")
    val full = Sinks.readTable(spark, spec, out)
      .filter(col("arrival_date").between(
        date_add(epoch, lo.toInt), date_add(epoch, hi.toInt)))
    val a = graft.analytics.I94Analytics.dailyArrivals(pr.df).collect().toSeq
    val b = graft.analytics.I94Analytics.dailyArrivals(full).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("schema-evolved table: files written before the layout column existed are skipped, not a crash") {
    val out = Files.createTempDirectory("graft-zmr-evo").toString
    // partition p=0 written BEFORE the column 'k' existed (no chunk at
    // all); p=1 after — the add-column evolution shape Sinks.mergeInto
    // leaves behind
    spark.range(100).select(lit(0L).as("p"), col("id").as("payload"))
      .write.partitionBy("p").parquet(s"$out/evo_t")
    spark.range(100).select(lit(1L).as("p"), col("id").as("payload"),
        (col("id") * 2).as("k"))
      .write.mode("append").partitionBy("p").parquet(s"$out/evo_t")
    val spec = Sinks.TableSpec("evo_t", Sinks.Parquet, Seq("p"))
    val pr = ZoneMapReader.readRange(spark, spec, out, "k", 0L, 50L)
    // old files skipped (their rows are null under mergeSchema — null
    // never matches a range predicate), new files pruned normally
    assert(pr.filesKept < pr.filesTotal)
    val expect = Sinks.readTable(spark, spec, out)
      .filter(col("k").between(0L, 50L))
    assert(pr.df.count() === expect.count() && expect.count() === 26L)
    // the strict gate keeps failing loudly on the missing chunk
    intercept[Exception](ParquetZoneMaps
      .rowGroupStats(spark, s"$out/evo_t", "k").collect())
  }

  test("a window no file overlaps returns the empty frame on the full schema") {
    val out = Files.createTempDirectory("graft-zmr-empty").toString
    val spec = Sinks.TableSpec("zr_e", Sinks.Parquet,
      sortCols = Seq("k"), layoutFiles = 4)
    Sinks.write(spark.range(100).select(col("id").as("k")), spec, out)
    val pr = ZoneMapReader.readRange(spark, spec, out, "k", 5000L, 6000L)
    assert(pr.filesKept === 0)
    assert(pr.df.count() === 0L)
    assert(pr.df.columns.toSeq === Seq("k"))
  }
}
