package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** End-to-end ETL runner: the Scala equivalent of `python etl.py`
  * (SURVEY.md §3.1 stages 6-8). Pure function of input DataFrames +
  * dictionary text → the 13 output tables, written through the Sinks
  * registry.
  *
  * Deliberate improvement over the reference (SURVEY.md §4): the raw
  * union and the trips DataFrame are persisted — the reference recomputes
  * the whole upstream (including the source scan) for every count()+write
  * and for the dates dim chained off trips.
  */
object EtlPipeline {

  case class EtlResult(tables: Map[String, DataFrame], rowCounts: Map[String, Long])

  /** Union monthly raw files by name (SURVEY.md §2.7 U2 — the safer
    * variant of the reference's positional fold, etl.py:97-108).
    */
  def concatRaw(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  def runAll(spark: SparkSession,
      rawMonthly: Seq[DataFrame],
      airports: DataFrame,
      demographics: DataFrame,
      dictionaryContent: String,
      outputDir: String): EtlResult = {

    val raw = concatRaw(rawMonthly).persist(StorageLevel.MEMORY_AND_DISK)
    val trips = RefBuilders.i94Trips(spark, raw).persist(StorageLevel.MEMORY_AND_DISK)

    val dictTables = DictionaryParser.sections.map { s =>
      val df =
        if (s.table == "i94_port_state_mapping")
          DictionaryParser.portStateMapping(spark, dictionaryContent)
        else DictionaryParser.toDF(spark, dictionaryContent, s)
      s.table -> df
    }.toMap

    val tables: Map[String, DataFrame] = Map(
      "i94_immigrations" -> RefBuilders.i94Immigrations(raw),
      "i94_trips" -> trips,
      "i94_visitors" -> RefBuilders.i94Visitors(spark, raw),
      "i94_flights" -> RefBuilders.i94Flights(spark, raw),
      "i94_dates" -> RefBuilders.i94Dates(trips),
      "i94_airports" -> RefBuilders.i94Airports(spark, airports),
      "i94_us_states_demographic" -> RefBuilders.i94UsStatesDemographic(spark, demographics),
      "i94_us_cities_demographic" -> RefBuilders.i94UsCitiesDemographic(spark, demographics)
    ) ++ dictTables

    val counts = Sinks.registry.flatMap { spec =>
      tables.get(spec.name).map { df =>
        Sinks.write(df, spec, outputDir)
        spec.name -> df.count()
      }
    }.toMap

    raw.unpersist()
    trips.unpersist()
    EtlResult(tables, counts)
  }
}
