package graft.etl

import graft.sources.Readers
import org.apache.spark.sql.SparkSession

/** The `python etl.py` analog (SURVEY.md §3.1) as a runnable main:
  * raw I94 parquet (one path per month) + airports CSV + demographics CSV
  * + SAS dictionary text → the 13 output tables through the sink registry.
  *
  * Usage: runMain graft.etl.EtlMain <outDir> <airportsCsv> <demographicsCsv>
  *          <dictionaryFile> <rawMonthlyParquet> [more months ...]
  */
object EtlMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 5,
      "usage: EtlMain <outDir> <airportsCsv> <demographicsCsv> <dictFile> <raw...>")
    val Array(outDir, airportsPath, demoPath, dictPath) = args.take(4)
    val rawPaths = args.drop(4).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    // skip-missing semantics of the reference's monthly loop (etl.py:736-748);
    // existence resolved through Hadoop FS so URI-form paths (file://, s3a://)
    // work, not just bare local paths
    val hconf = spark.sparkContext.hadoopConfiguration
    val monthly = rawPaths.filter { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }.map(p => Readers.rawI94(spark, p))
    require(monthly.nonEmpty, s"no raw inputs exist among: $rawPaths")
    val dict = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dictPath)),
      java.nio.charset.StandardCharsets.UTF_8)
    val res = EtlPipeline.runAll(spark, monthly,
      Readers.airportsCsv(spark, airportsPath),
      Readers.demographicsCsv(spark, demoPath),
      dict, outDir)
    res.rowCounts.toSeq.sortBy(_._1).foreach { case (t, n) =>
      println(s"[etl] $t rows=$n")
    }
    println(f"[etl] completed in ${(System.nanoTime() - t0) / 6e10}%.2f minutes")
    spark.stop()
  }
}
