package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Read-side zone-map pruning (VERDICT r15 "what's missing"): the
  * planning-level complement of parquet's row-group filter. The write
  * side ([[Sinks.TableSpec]] sortCols/zorderCols) produces real footer
  * min/max; Spark's scan consults them only AFTER a file is opened —
  * each task still pays an open+footer read per file. This reader takes
  * a range predicate on the layout key and prunes the FILE LIST before
  * the scan is planned, so pruned files never become input splits at
  * all: on a 100 TB table where a date window touches 2 of 10k files,
  * the job schedules 2 file-tasks, not 10k footer-probes.
  *
  * Scale shape: one distributed footer-only metadata job (O(files),
  * [[ParquetZoneMaps.rowGroupStats]]) + an O(kept-files) driver list —
  * the same order as Spark's own InMemoryFileIndex listing that every
  * read already pays. All-null files/chunks (legal for a nullable sort
  * key) carry no min/max and are SKIPPED, which is exact for a range
  * predicate: NULL never satisfies `BETWEEN lo AND hi`.
  */
object ZoneMapReader {

  /** A pruned read: the frame plus the kept-vs-total accounting the
    * gates assert on (AcidWriteSpec pins `filesKept` == the scan's own
    * `numFiles` metric == the relational zone-map prediction).
    */
  case class PrunedRead(df: DataFrame, filesKept: Int, filesTotal: Int)

  /** File-grain zone maps of `column`: (file, n_rows, min_v, max_v),
    * the aggregate of the row-group stats (a partition value's rows may
    * span several physical files; a file's chunks may split one range).
    */
  def fileStats(spark: SparkSession, path: String, column: String): DataFrame =
    ParquetZoneMaps.rowGroupStats(spark, path, column, requireStats = false)
      .toDF()
      .groupBy(col("file"))
      .agg(sum(col("n_rows")).as("n_rows"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))

  /** Read `spec`'s table restricted to `statsCol BETWEEN lo AND hi`
    * (lo/hi in the column's PHYSICAL integer domain — epoch days for
    * DATE columns), with the file list pre-pruned by the footer zone
    * maps. Hive partition columns survive via `basePath`; the range
    * filter is still applied to the kept rows (zone maps prune a
    * SUPERSET — a kept file can hold non-matching rows). A window no
    * file overlaps returns the empty frame on the table's full schema.
    */
  def readRange(spark: SparkSession, spec: Sinks.TableSpec,
      outputDir: String, statsCol: String, lo: Long, hi: Long): PrunedRead = {
    require(spec.format == Sinks.Parquet,
      s"${spec.name}: zone-map pruning needs parquet footers")
    val path = s"$outputDir/${spec.name}"
    val total = ParquetZoneMaps.listDataFiles(spark, path).size
    val kept = fileStats(spark, path, statsCol)
      .filter(col("min_v") <= hi && col("max_v") >= lo)
      .select(col("file")).collect().map(_.getString(0)).sorted
    val base = spark.read.option("mergeSchema", "true")
      .option("basePath", path)
    val df =
      if (kept.isEmpty)
        Sinks.readTable(spark, spec, outputDir).filter(lit(false))
      else base.parquet(kept.toIndexedSeq: _*)
    val bounded = df.schema(statsCol).dataType match {
      case DateType =>
        // physical INT32 date = days since 1970-01-01, the same domain
        // the footer statistics carry
        df.filter(col(statsCol)
          .between(date_add(lit("1970-01-01").cast("date"), lo.toInt),
            date_add(lit("1970-01-01").cast("date"), hi.toInt)))
      case ByteType | ShortType | IntegerType | LongType =>
        df.filter(col(statsCol).between(lo, hi))
      case other => throw new IllegalArgumentException(
        s"${spec.name}.$statsCol is $other — zone-map reads support " +
          "integer and date layout keys")
    }
    PrunedRead(bounded, kept.length, total)
  }
}
