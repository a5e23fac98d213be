package graft.etl

import org.apache.spark.sql.types._

/** Static StructTypes for the reference-faithful tables (FIXTURES.md §A).
  * The reference infers schemas from SAS/CSV metadata
  * (/root/reference/Capstone/scripts/etl.py:739-740, 799-807); we pin them
  * statically and allow inference only at raw ingest (SURVEY.md §1.3).
  */
object Schemas {

  private def d(n: String) = StructField(n, DoubleType, nullable = true)
  private def s(n: String) = StructField(n, StringType, nullable = true)

  /** Raw I94 record, 28 columns — numerics double, chars string
    * (Explore_using_PySpark.ipynb cell 10).
    */
  val rawI94: StructType = StructType(Seq(
    d("cicid"), d("i94yr"), d("i94mon"), d("i94cit"), d("i94res"),
    s("i94port"), d("arrdate"), d("i94mode"), s("i94addr"), d("depdate"),
    d("i94bir"), d("i94visa"), d("count"), s("dtadfile"), s("visapost"),
    s("occup"), s("entdepa"), s("entdepd"), s("entdepu"), s("matflag"),
    d("biryear"), s("dtaddto"), s("gender"), s("insnum"), s("airline"),
    d("admnum"), s("fltno"), s("visatype")))

  /** Airport codes CSV — all string (cell 55). */
  val airports: StructType = StructType(Seq(
    s("ident"), s("type"), s("name"), s("elevation_ft"), s("continent"),
    s("iso_country"), s("iso_region"), s("municipality"), s("gps_code"),
    s("iata_code"), s("local_code"), s("coordinates")))

  /** US cities demographics CSV — all string, `;`-delimited (cell 63). */
  val demographics: StructType = StructType(Seq(
    s("City"), s("State"), s("Median Age"), s("Male Population"),
    s("Female Population"), s("Total Population"), s("Number of Veterans"),
    s("Foreign-born"), s("Average Household Size"), s("State Code"),
    s("Race"), s("Count")))

  private def i(n: String) = StructField(n, IntegerType, nullable = true)

  /** Static output schemas for the CSV-format tables in Sinks.registry,
    * pinned from the builders' output types (RefBuilders/DictionaryParser).
    * Catalog registration reads CSV THROUGH these instead of
    * `inferSchema=true`: SURVEY §7.4-7 pins inference as a correctness
    * risk — e.g. every dictionary id column (`country_id`, `visa_id`, …)
    * is a numeric STRING that inference silently retypes to INT, so a
    * catalog reader would see a different schema than the writer produced.
    * (Parquet tables carry their own schema and need no entry here.)
    */
  val csvOutputs: Map[String, StructType] = Map(
    "i94_flights" -> StructType(Seq(s("flight_id"), s("airline"))),
    "i94_airports" -> StructType(Seq(
      s("airport_id"), s("airport_type"), s("airpot_name"), s("elevation_ft"),
      s("continent"), s("iso_country"), s("iso_region"), s("us_cities"),
      s("municipality"), s("gps_code"), s("iata_code"), s("local_code"),
      d("latitude"), d("longitude"))),
    "i94_us_states_demographic" -> StructType(Seq(
      s("state"), d("median_age"), i("male_population"), i("female_population"),
      i("num_veterans"), i("num_foreign_born"), d("avg_household_size"),
      s("state_code"))),
    "i94_us_cities_demographic" -> StructType(Seq(
      s("city"), s("race"), i("population"))),
    "i94_countries" -> StructType(Seq(s("country_id"), s("country"))),
    "i94_port_state_mapping" -> StructType(Seq(
      s("i94_port"), s("city"), s("state"))),
    "i94_travel_mode" -> StructType(Seq(s("mode_id"), s("mode"))),
    "i94_state_mapping" -> StructType(Seq(s("state_id"), s("state"))),
    "i94_visa" -> StructType(Seq(s("visa_id"), s("visa_purpose"))))
}
