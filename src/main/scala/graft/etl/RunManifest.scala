package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** ETL run manifest: one JSON file per composed run recording, for every
  * written table, its row count, on-disk bytes, data-file count, and
  * partition-directory count, plus the run's wall-clock — the auditable
  * end-to-end artifact the reference only hints at via its unrecorded
  * "minutes taken" log line (`etl.py:844`). `RunAll` writes it to the
  * output dir after DQ; the committed `ETL_RUN.json` at the repo root is
  * the sf0.01 run of `ManifestRun`.
  */
object RunManifest {

  case class TableStat(name: String, format: String, rows: Long,
      bytes: Long, files: Int, partitionDirs: Int)

  /** Walk each registry table's output dir: bytes and file count over
    * data files (skipping `_SUCCESS`/dot files), and the number of leaf
    * partition directories (0 for unpartitioned layouts).
    */
  def stats(spark: SparkSession, outputDir: String,
      counts: Map[String, Long]): Seq[TableStat] = {
    val conf = spark.sparkContext.hadoopConfiguration
    Sinks.registry.filter(s => counts.contains(s.name)).map { spec =>
      val root = new Path(s"$outputDir/${spec.name}")
      val fs = root.getFileSystem(conf)
      var bytes = 0L
      var files = 0
      val dataDirs = scala.collection.mutable.Set[String]()
      def walk(p: Path): Unit =
        fs.listStatus(p).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory) walk(st.getPath)
          else if (!n.startsWith("_") && !n.startsWith(".")) {
            bytes += st.getLen
            files += 1
            dataDirs += st.getPath.getParent.toString
          }
        }
      if (fs.exists(root)) walk(root)
      val partDirs =
        if (spec.partitionCols.isEmpty) 0
        else dataDirs.count(_ != root.toString)
      TableStat(spec.name, spec.format.toString.toLowerCase,
        counts(spec.name), bytes, files, partDirs)
    }
  }

  def toJson(ts: Seq[TableStat], durationSec: Double, sfLabel: String): String = {
    val tables = ts.map { t =>
      s"""    "${t.name}": {"format": "${t.format}", "rows": ${t.rows}, """ +
        s""""bytes": ${t.bytes}, "files": ${t.files}, "partition_dirs": ${t.partitionDirs}}"""
    }.mkString(",\n")
    f"""{
  "sf": "$sfLabel",
  "duration_sec": $durationSec%.2f,
  "n_tables": ${ts.size},
  "total_rows": ${ts.map(_.rows).sum},
  "total_bytes": ${ts.map(_.bytes).sum},
  "tables": {
$tables
  }
}
"""
  }

  def write(spark: SparkSession, outputDir: String,
      counts: Map[String, Long], durationSec: Double,
      sfLabel: String): String = {
    val json = toJson(stats(spark, outputDir, counts), durationSec, sfLabel)
    HadoopIo.writeUtf8(spark, s"$outputDir/ETL_RUN.json", json)
    json
  }
}
