package graft.sources

import graft.etl.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Try

/** Source readers (SURVEY.md §2.1): thin, schema-pinned wrappers with the
  * reference's exact options. `inferSchema` stays false everywhere — all
  * CSV columns arrive as string and are cast in the builders, preserving
  * the null-on-junk cast behavior (SURVEY.md §7.4-7).
  */
object Readers {

  /** S1 — raw I94 ingest. The sas7bdat connector isn't available offline
    * (SURVEY.md §7.4-4); raw ingest is parquet with the SAS-derived schema
    * pinned; SAS semantics (epoch dates) live in expressions.
    */
  def rawI94(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawI94).parquet(path)

  /** S2 — airport codes CSV: header, comma (etl.py:799-800). */
  def airportsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(Schemas.airports).csv(path)

  /** S3 — demographics CSV: header + `;` delimiter (etl.py:806-807). */
  def demographicsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.options(Map("header" -> "true", "delimiter" -> ";"))
      .schema(Schemas.demographics).csv(path)

  /** S4 — parquet scan with CSV fallback: the DQ checker re-reads output
    * tables written in either format (i94_data_quality_check.py:259-262,
    * 275-278).
    */
  def parquetOrCsv(spark: SparkSession, path: String): DataFrame =
    Try(spark.read.parquet(path)).filter(_.schema.nonEmpty).getOrElse(
      spark.read.option("header", "true").csv(path))
}
