package graft.etl

import org.apache.spark.sql.DataFrame

/** Write-side registry (SURVEY.md §2.2 K1-K4): each output table routed to
  * its format / partitioning / mode, mirroring the reference's dispatch
  * (/root/reference/Capstone/scripts/etl.py:434-491, 754-841).
  * `partitionBy(i94_year, i94_month)` is the data-model-level layout that
  * makes month-scoped reads prune at 100 TB.
  */
object Sinks {

  sealed trait Format
  case object Parquet extends Format
  case object Csv extends Format

  case class TableSpec(name: String, format: Format,
      partitionCols: Seq[String] = Nil, overwrite: Boolean = true)

  /** The 13-table routing (etl.py:754-841): big SAS-derived tables →
    * partitioned parquet; flights + CSV-derived + dictionary dims →
    * unpartitioned CSV.
    */
  val registry: Seq[TableSpec] = Seq(
    TableSpec("i94_immigrations", Parquet, Seq("i94_year", "i94_month")),
    TableSpec("i94_trips", Parquet, Seq("i94_year", "i94_month")),
    TableSpec("i94_visitors", Parquet, Seq("i94_year", "i94_month")),
    TableSpec("i94_dates", Parquet, Seq("i94_year", "i94_month")),
    TableSpec("i94_flights", Csv),
    TableSpec("i94_airports", Csv),
    TableSpec("i94_us_states_demographic", Csv),
    TableSpec("i94_us_cities_demographic", Csv),
    TableSpec("i94_countries", Csv),
    TableSpec("i94_port_state_mapping", Csv),
    TableSpec("i94_travel_mode", Csv),
    TableSpec("i94_state_mapping", Csv),
    TableSpec("i94_visa", Csv))

  /** Idempotent partition-scoped overwrite — the offline stand-in for a
    * Delta-style `replaceWhere` (see WRITE_CONTRACT.md; no Delta jar
    * exists in this environment). Dynamic partition-overwrite mode
    * replaces EXACTLY the partitions present in `df` and leaves every
    * other partition untouched, so re-running a month's load is
    * idempotent: the partition's files are swapped as a unit, never
    * appended to, and a failed attempt can simply be re-run. The mode is
    * set as a per-write option, not session config — callers' unrelated
    * overwrites keep static semantics.
    */
  def overwritePartitions(df: DataFrame, spec: TableSpec, outputDir: String): Unit = {
    require(spec.partitionCols.nonEmpty,
      s"${spec.name} is unpartitioned — partition-scoped overwrite needs partition columns")
    val w = df.write
      .option("partitionOverwriteMode", "dynamic")
      .option("header", "true")
      .mode("overwrite")
      .partitionBy(spec.partitionCols: _*)
    val path = s"$outputDir/${spec.name}"
    spec.format match {
      case Parquet => w.parquet(path)
      case Csv     => w.csv(path)
    }
  }

  /** Small-files compaction: rewrite an unpartitioned parquet table into
    * `targetFiles` files (stage to a sibling dir, then swap) — the
    * operational fix for append-mode accumulation at scale. Returns the
    * row count for verification.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      targetFiles: Int): Long = {
    val dst = new org.apache.hadoop.fs.Path(path)
    // resolve the filesystem FROM the path (FileSystem.get(conf) would hit
    // the default FS and fail or act on the wrong store for s3a/hdfs URIs);
    // derive staging paths from the NORMALIZED Path — string concat on a
    // trailing-slash input would nest them inside the dataset
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__compacting")
    val old = new org.apache.hadoop.fs.Path(dst.getParent, dst.getName + "__precompact")
    spark.read.parquet(path)
      .coalesce(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    // swap without a window where the live table is missing: move the old
    // data aside, move the compacted data in, only then drop the old copy
    fs.delete(old, true)
    require(fs.rename(dst, old), s"compact: failed to stage $dst aside")
    require(fs.rename(tmp, dst), s"compact: failed to install $tmp at $dst")
    fs.delete(old, true)
    n
  }

  def write(df: DataFrame, spec: TableSpec, outputDir: String): Unit = {
    val mode = if (spec.overwrite) "overwrite" else "append"
    val w0 = df.write.option("header", "true").mode(mode)
    val w = if (spec.partitionCols.nonEmpty) w0.partitionBy(spec.partitionCols: _*) else w0
    val path = s"$outputDir/${spec.name}"
    spec.format match {
      case Parquet => w.parquet(path)
      case Csv     => w.csv(path)
    }
  }
}
