package graft.etl

import org.apache.spark.sql.SparkSession

/** Composed run: ETL → catalog registration → DQ, the single-entry analog
  * of the reference DAG's sequencing
  * (`Capstone/airflow/dags/i94_run_etl_dag.py:466-468`:
  * bucket-check → etl → dq → logs). A DQ failure exits nonzero, which is
  * the branch the DAG routes to its failure path.
  *
  *   runMain graft.etl.RunAll --config <cfgFile> [--env LOCAL]
  */
object RunAll {

  /** Library-form composed run (no exit/stop), for specs and embedding:
    * returns (etl row counts, dq reports, registered tables).
    */
  def run(spark: SparkSession, cfg: EtlConfig):
      (Map[String, Long], Seq[graft.dq.DataQuality.DqReport], Seq[String]) = {
    val t0 = System.nanoTime()
    // stage 1: the input-existence gate (the DAG's bucket-check branch:
    // missing inputs fail the run before any write)
    require(cfg.inputFiles.exists(HadoopIo.exists(spark, _)),
      s"input gate: none of ${cfg.inputFiles} exist")
    // stage 2: ETL
    val counts = EtlMain.runFromConfig(spark, cfg)
    // stage 3: register the written layout in the session catalog so the
    // output is queryable by name (Hive-backed sessions persist this)
    val registered = Catalog.register(spark, cfg.outputDir)
    // stage 4: DQ over the written tables
    val reports = graft.dq.DqMain.runChecks(spark, cfg.outputDir, cfg.dqSpecs)
    // stage 5: the auditable end-to-end artifact — per-table rows/bytes/
    // files/partitions + wall-clock, written next to the tables
    RunManifest.write(spark, cfg.outputDir, counts,
      (System.nanoTime() - t0) / 1e9,
      cfg.get("PATHS", "sf_label").getOrElse("fixture"))
    (counts, reports, registered)
  }

  def main(args: Array[String]): Unit = {
    val (env, cfgPath) = EtlMain.parseFlags(args).getOrElse(
      throw new IllegalArgumentException("usage: RunAll --config <file> [--env LOCAL]"))
    val spark = EtlMain.session()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[runall] env=$env config=$cfgPath")
    val (_, reports, registered) = run(spark, EtlConfig.load(spark, cfgPath))
    println(s"[runall] registered tables: ${registered.mkString(", ")}")
    spark.stop()
    if (reports.exists(!_.passed)) sys.exit(1)
  }
}
