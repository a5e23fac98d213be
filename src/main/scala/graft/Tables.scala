package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata star schema (TESTDATA.md).
  *
  * Mirrors the reference's source layer (SURVEY.md §2.1): the reference reads
  * raw sas7bdat/CSV into DataFrames (`/root/reference/Capstone/scripts/etl.py:739-807`);
  * offline we ingest parquet with the same "schema known at read time" stance.
  * Every loader is a plain `spark.read.parquet` so Catalyst gets full
  * pushdown/pruning on the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark has no native type
    * for: read it as a long (legacy conf) and floor-convert ns→µs, exactly
    * what DuckDB does when it narrows nanos into its µs TIMESTAMP.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // nanosAsLong is an analyzer-level conf with no per-read equivalent, so
    // loading this table requires the session-level setting. Only touch the
    // conf when it is not already correct (avoid mutating on every call);
    // the mutation is documented behavior of this loader.
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
