package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-over-views surface (SURVEY.md §1.1: the reference's API is dual —
  * temp views + `spark.sql` alongside the DataFrame DSL; our engine keeps
  * both). Registers every testdata table as a temp view so any engine
  * query can be phrased in SQL.
  */
object Views {

  /** Register all testdata tables for `dir` as temp views (events goes
    * through its nanos-safe loader).
    */
  def register(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { name =>
      val df = if (name == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, name)
      df.createOrReplaceTempView(name)
    }

  /** Convenience: register + run one SQL statement. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
