package graft.etl

import graft.SparkSpecBase
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The write contract (WRITE_CONTRACT.md): partition-scoped overwrite is
  * idempotent and partition-isolated; compaction swaps atomically with
  * the row count verified before the swap.
  */
class AcidWriteSpec extends SparkSpecBase {
  import spark.implicits._

  private val spec = Sinks.TableSpec("acid_t", Sinks.Parquet,
    Seq("i94_year", "i94_month"))

  private def month(m: Int, rows: Seq[(Long, String)]) =
    rows.toDF("id", "v")
      .withColumn("i94_year", lit(2016))
      .withColumn("i94_month", lit(m))

  test("partition overwrite: re-running a month is idempotent, other months untouched") {
    val out = Files.createTempDirectory("graft-acid").toString
    Sinks.overwritePartitions(month(4, Seq(1L -> "a", 2L -> "b")), spec, out)
    Sinks.overwritePartitions(month(5, Seq(3L -> "c")), spec, out)

    def table() = spark.read.parquet(s"$out/${spec.name}")
    assert(table().count() === 3)

    // re-run month 4 twice: no duplication, no loss (idempotent)
    val m4 = month(4, Seq(1L -> "a", 2L -> "b"))
    Sinks.overwritePartitions(m4, spec, out)
    Sinks.overwritePartitions(m4, spec, out)
    assert(table().count() === 3)
    assert(table().filter(col("i94_month") === 4).count() === 2)

    // a CHANGED month-4 re-run replaces exactly that partition
    Sinks.overwritePartitions(month(4, Seq(9L -> "z")), spec, out)
    val after = table()
    assert(after.filter(col("i94_month") === 4).select("id")
      .as[Long].collect().toSeq === Seq(9L))
    // month 5 bytes never touched
    assert(after.filter(col("i94_month") === 5).select("id")
      .as[Long].collect().toSeq === Seq(3L))
  }

  test("partition overwrite refuses unpartitioned specs") {
    intercept[IllegalArgumentException] {
      Sinks.overwritePartitions(month(4, Seq(1L -> "a")),
        Sinks.TableSpec("flat", Sinks.Parquet), "/tmp/unused")
    }
  }

  test("compaction: staged swap preserves rows, hits target file count, leaves no staging dirs") {
    val out = Files.createTempDirectory("graft-acid-compact").toString
    val path = s"$out/events_compact"
    (1L to 1000L).toDF("id").repartition(16).write.parquet(path)
    assert(new java.io.File(path).list().count(_.endsWith(".parquet")) > 4)

    val n = Sinks.compact(spark, path, targetFiles = 2)
    assert(n === 1000L)
    val files = new java.io.File(path).list().toSeq
    assert(files.count(_.endsWith(".parquet")) === 2, files.toString)
    // the swap protocol left neither the staging nor the pre-compact copy
    val siblings = new java.io.File(out).list().toSeq
    assert(siblings === Seq("events_compact"), siblings.toString)
    // data equivalent, readable through the same path
    assert(spark.read.parquet(path).agg(sum("id")).as[Long].head() === 500500L)
  }
}
