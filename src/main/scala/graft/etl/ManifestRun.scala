package graft.etl

import org.apache.spark.sql.SparkSession

/** Reproducible end-to-end ETL run at a stated SF, producing the
  * committed `ETL_RUN.json`: stages the deterministic [[SyntheticI94]]
  * inputs (raw derived from the SF's orders table) into a scratch dir,
  * drives the full composed `RunAll.run` (input gate → 13-table ETL →
  * catalog → DQ → manifest), and copies the manifest to the requested
  * path — the driver-auditable proof that the whole reference pipeline
  * runs, with per-table rows/bytes/files/partitions and wall-clock.
  *
  *   runMain graft.etl.ManifestRun [sfDir] [manifestOut] [amplify]
  *
  * `amplify` (default 1) stretches the raw volume by replicating each
  * order into that many distinct trips — `sf0.1 × 10` ≈ 1.65 M raw /
  * 1.5 M deduped trips, the reference's real monthly-file volume
  * (3–4 M rows at two months' worth; `Capstone/README.md:10`).
  */
object ManifestRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val manifestOut = args.lift(1).getOrElse("ETL_RUN.json")
    val amplify = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = EtlMain.session()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    val data = s"$base/data"
    SyntheticI94.raw(spark, sfDir, amplify).write.mode("overwrite")
      .parquet(s"$data/raw_2016.parquet")
    SyntheticI94.airports(spark).write.mode("overwrite")
      .option("header", "true").csv(s"$data/airports.csv")
    SyntheticI94.demographics(spark).write.mode("overwrite")
      .options(Map("header" -> "true", "delimiter" -> ";"))
      .csv(s"$data/demographics.csv")
    HadoopIo.writeUtf8(spark, s"$data/dict.sas", SyntheticI94.dictionary)
    val sfLabel = sfDir.split('/').last +
      (if (amplify > 1) s"x$amplify" else "")
    val cfg =
      s"""[PATHS]
         |base_dir = $base
         |data_dir = data
         |input_files = ["raw_2016.parquet"]
         |airports_file = airports.csv
         |us_demographics_file = demographics.csv
         |dictionary_file = dict.sas
         |output_dir = output
         |log_dir = log
         |sf_label = $sfLabel
         |
         |[DQ]
         |tables = '["i94_visa", "i94_travel_mode", "i94_trips"]'
         |table_col = '{"i94_visa": ["visa_id"], "i94_travel_mode": ["mode_id"], "i94_trips": ["trip_id", "custom_client_id"]}'
         |""".stripMargin
    val cfgPath = s"$base/etl_config.cfg"
    HadoopIo.writeUtf8(spark, cfgPath, cfg)
    val (counts, reports, _) = RunAll.run(spark, EtlConfig.load(spark, cfgPath))
    val json = HadoopIo.readUtf8(spark, s"$base/output/ETL_RUN.json")
    HadoopIo.writeUtf8(spark, manifestOut, json)
    println(s"[manifest] sf=$sfLabel tables=${counts.size} " +
      s"dq=${if (reports.forall(_.passed)) "pass" else "FAIL"} -> $manifestOut")
    println(json)
    spark.stop()
    if (reports.exists(!_.passed)) sys.exit(1)
  }
}
