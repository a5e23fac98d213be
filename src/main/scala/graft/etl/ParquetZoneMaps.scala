package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Row-group zone map of one integer column of a parquet table. */
case class ZoneMapRow(file: String, rowgroup: Int, n_rows: Long,
    min_v: Long, max_v: Long)

/** REAL parquet footer statistics — the physical zone maps that decide
  * whether a layout (Sinks.TableSpec sortCols/zorderCols) actually
  * prunes, as opposed to the relational simulations (q341/q143). Reads
  * ONLY footers via parquet-hadoop (the same metadata a query engine's
  * row-group filter consults), never data pages.
  *
  * Scale shape: one distributed footer-only job — the file listing
  * parallelized into a Dataset, one footer open per file per task.
  * O(number of files) like Sinks.readTable's mergeSchema pass; a
  * 100 TB table with 100k files is a 100k-row metadata job, never a
  * byte scan.
  */
object ParquetZoneMaps {

  /** Recursive data-file listing under `path` (parquet parts only; no
    * `_SUCCESS`/hidden paths) — the same O(files) driver-side walk
    * Spark's own InMemoryFileIndex performs. Shared by the footer jobs
    * and [[ZoneMapReader]]'s kept-vs-total accounting.
    */
  private[etl] def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(hconf)
    val it = fs.listFiles(root, true)
    Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next().getPath.toString)
      .filter(f => f.endsWith(".parquet") || f.contains("part-"))
      .filterNot(f => f.contains("_SUCCESS") || f.contains("/."))
      .toSeq.sorted
  }

  /** Per-row-group (file, rowgroup, rows, min, max) for `column`,
    * which must be a physical INT32 or INT64 parquet column (dates
    * land as INT32 days). Files with no statistics for the column
    * fail loudly — a layout gate reading absent zone maps would
    * otherwise report 100% pruning of nothing.
    */
  def rowGroupStats(spark: SparkSession, path: String, column: String)
      : Dataset[ZoneMapRow] = rowGroupStats(spark, path, column,
    requireStats = true)

  /** `requireStats = false` SKIPS row groups whose column chunk has no
    * non-null min/max (an all-null chunk — legal for nullable sort
    * keys, whose nulls range-cluster into the leading files) instead
    * of failing; a cross-engine gate should stay strict, a layout
    * inspection of nullable keys goes lenient.
    */
  def rowGroupStats(spark: SparkSession, path: String,
      column: String, requireStats: Boolean): Dataset[ZoneMapRow] = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val files = listDataFiles(spark, path)
    // serializable copies for the executor-side footer reads
    val confMap = {
      val m = scala.collection.mutable.Map[String, String]()
      val ci = hconf.iterator()
      while (ci.hasNext) { val e = ci.next(); m(e.getKey) = e.getValue }
      m.toMap
    }
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size, 32)))
      .flatMap { f =>
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks
          (0 until blocks.size()).flatMap { i =>
            val b = blocks.get(i)
            // a file written BEFORE an add-column evolution carries no
            // chunk for the column at all; its rows read back null
            // under mergeSchema, and null never matches a range
            // predicate — so the lenient mode treats the missing chunk
            // exactly like an all-null chunk (skip), while the strict
            // gates keep failing loudly
            val chunkOpt = (0 until b.getColumns.size())
              .map(b.getColumns.get)
              .find(_.getPath.toDotString == column)
            require(chunkOpt.nonEmpty || !requireStats,
              s"$f rowgroup $i: no column chunk named '$column'")
            val st = chunkOpt.map(_.getStatistics).orNull
            val usable = st != null && !st.isEmpty && st.hasNonNullValue
            require(usable || !requireStats,
              s"$f rowgroup $i: column '$column' carries no min/max " +
                "statistics — the layout gate cannot measure pruning")
            if (!usable) None else Some {
            val (mn, mx) = st match {
              case s: org.apache.parquet.column.statistics.IntStatistics =>
                (s.getMin.toLong, s.getMax.toLong)
              case s: org.apache.parquet.column.statistics.LongStatistics =>
                (s.getMin, s.getMax)
              case other => throw new IllegalArgumentException(
                s"$f: column '$column' is ${other.getClass.getSimpleName}" +
                  " — zone-map gate supports INT32/INT64 keys")
            }
            ZoneMapRow(f, i, b.getRowCount, mn, mx)
          }}
        } finally reader.close()
      }
  }

  /** File-grain zone maps with the hive partition value parsed from
    * the path (`partCol=<long>` directories): one row per partition
    * value — (part_id, n_rowgroups, n_rows, min_v, max_v). This is
    * the grain a cross-engine gate can replay relationally: partition
    * membership is decided by the writer's partitioning expression,
    * so min/max per PARTITION equals the relational range even when a
    * partition's rows span several physical files.
    */
  def partitionStats(spark: SparkSession, path: String,
      statsCol: String, partCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    rowGroupStats(spark, path, statsCol).toDF()
      .withColumn("part_id",
        regexp_extract(col("file"), s"$partCol=(-?\\d+)", 1).cast("long"))
      .groupBy(col("part_id"))
      .agg(count(lit(1)).as("n_rowgroups"), sum(col("n_rows")).as("n_rows"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }
}
