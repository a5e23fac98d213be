package graft.etl

import graft.functions.Dates
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's 13 table builders (SURVEY.md §1.4) as pure
  * `DataFrame => DataFrame` transforms. SQL-built tables keep the
  * SQL-over-temp-view surface for fidelity; DSL-built ones
  * (immigrations, dates) stay DSL — both compile to the same Catalyst
  * plans. Python UDFs are replaced by native expressions (SURVEY.md §2.9).
  *
  * Documented divergences from /root/reference/Capstone/scripts/etl.py:
  *  - `admnum` goes through LONG, not INT (etl.py:211 overflows int32 —
  *    SURVEY.md §7.4-1);
  *  - date parsing implements the *intended* semantics of the buggy
  *    `change_date_format` (etl.py:152-153 — §7.4-2);
  *  - `trip_id` is a deterministic `row_number` over (cicid, admnum), not
  *    `monotonically_increasing_id` (etl.py:204 — §7.4-5).
  */
object RefBuilders {

  /** Column subset the ETL selects for immigrations (etl.py:751-753). */
  val immigrationCols: Seq[String] = Seq(
    "cicid", "i94yr", "i94mon", "i94port", "i94mode", "visapost",
    "entdepa", "entdepd", "entdepu", "matflag", "dtadfile", "dtaddto")

  /** i94_immigrations — DSL builder (etl.py:161-193). */
  def i94Immigrations(df: DataFrame): DataFrame =
    df.select(immigrationCols.map(col): _*)
      .dropDuplicates()
      .withColumn("custom_client_id", col("cicid").cast("int").cast("string")).drop("cicid")
      .withColumn("i94_year", col("i94yr").cast("int")).drop("i94yr")
      .withColumn("i94_month", col("i94mon").cast("int")).drop("i94mon")
      .withColumnRenamed("i94port", "i94_port")
      .withColumn("mode_of_entry", col("i94mode").cast("int")).drop("i94mode")
      .withColumnRenamed("visapost", "visa_post")
      .withColumnRenamed("entdepa", "arrival_flag")
      .withColumnRenamed("entdepd", "depature_flag")
      .withColumnRenamed("entdepu", "update_flag")
      .withColumnRenamed("matflag", "match_flag")
      .withColumn("i94_entry_date", Dates.flexDate(col("dtadfile"))).drop("dtadfile")
      .withColumn("i94_valid_till", Dates.flexDate(col("dtaddto"))).drop("dtaddto")

  /** cicid range covered by one trip_id bucket. The fact table is the
    * one surface guaranteed to see full-corpus volume, so its surrogate
    * key CANNOT be a global-order window (`row_number().over(
    * Window.orderBy(...))` moves the whole table to ONE partition — the
    * canonical 100 TB scale-killer). 4096 keeps per-bucket row counts
    * task-sized at any SF while the bucket-count frame (rows ÷ 4096)
    * stays driver-trivial.
    */
  private[etl] val TripIdBucketWidth = 4096L

  /** i94_trips — SQL builder (etl.py:195-228). The fact table.
    *
    * trip_id is the global 1..n rank over the (cicid, admnum, <all
    * remaining columns>) total order, assigned WITHOUT a global-order
    * window via the q130 two-phase pattern
    * ([[graft.operators.CoreQueries.q130DenseIds]]): cicid-range
    * buckets get a per-bucket streaming rank (hash-partitioned window
    * over the full tie-break), and bucket OFFSETS come from a
    * cumulative sum over the bucket-COUNT frame — a window over
    * #buckets rows, not over the data. Because `floor(cicid / width)`
    * is monotone in the LEADING sort key (nulls bucket to null, which
    * sorts first exactly like cicid's nulls-first position), offset +
    * intra-rank equals the naive global row_number exactly
    * (RefBuildersSpec proves the equivalence on tied fixtures).
    */
  def i94Trips(spark: SparkSession, df: DataFrame): DataFrame = {
    // total order over every column: rows distinct after dropDuplicates
    // can still tie on (cicid, admnum) alone, which would make trip_id
    // partition-order-dependent again
    val tieBreak = (Seq("cicid", "admnum") ++
      df.columns.filterNot(Set("cicid", "admnum"))).map(col)
    // null cicid buckets to Long.MinValue (a plain null bucket would NOT
    // survive the equi-join below — NULL = NULL is false — silently
    // dropping those rows); MinValue sorts before every real bucket,
    // exactly the nulls-first position cicid holds in the naive order
    val bucketed = df.dropDuplicates()
      .withColumn("trip_bucket",
        coalesce(floor(col("cicid") / lit(TripIdBucketWidth)).cast("long"),
          lit(Long.MinValue)))
    val offsets = bucketed.groupBy(col("trip_bucket"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("trip_bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("trip_bucket"), col("offset"))
    val deduped = bucketed
      .withColumn("intra", row_number().over(
        Window.partitionBy(col("trip_bucket")).orderBy(tieBreak: _*)))
      .join(broadcast(offsets), Seq("trip_bucket"))
      .withColumn("trip_id", (col("offset") + col("intra")).cast("int"))
      .drop("trip_bucket", "intra", "offset")
    deduped.createOrReplaceTempView("i94_trips_raw")
    spark.sql("""
      SELECT DISTINCT
        STRING(trip_id) AS trip_id,
        STRING(INT(cicid)) AS custom_client_id,
        STRING(BIGINT(admnum)) AS admissions_number,
        INT(i94yr) AS i94_year,
        INT(i94mon) AS i94_month,
        STRING(INT(i94cit)) AS arrived_country_id,
        STRING(INT(i94res)) AS resident_country_id,
        DATE_ADD(DATE'1960-01-01', CAST(arrdate AS INT)) AS arrival_date,
        DATE_ADD(DATE'1960-01-01', CAST(depdate AS INT)) AS depature_date,
        STRING(fltno) AS flight_id,
        STRING(INT(i94visa)) AS visa_id,
        STRING(visatype) AS visa_category
      FROM i94_trips_raw""")
  }

  /** i94_visitors — SQL builder (etl.py:230-256). */
  def i94Visitors(spark: SparkSession, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("i94_visitors_raw")
    spark.sql("""
      SELECT DISTINCT
        STRING(BIGINT(admnum)) AS admissions_number,
        INT(i94yr) AS i94_year,
        INT(i94mon) AS i94_month,
        occup AS occupation,
        STRING(INT(i94res)) AS resident_country_id,
        INT(biryear) AS birth_year,
        gender
      FROM i94_visitors_raw""")
  }

  /** i94_flights — SQL builder with the not-null predicate (etl.py:258-281). */
  def i94Flights(spark: SparkSession, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("i94_flights_raw")
    spark.sql("""
      SELECT DISTINCT STRING(fltno) AS flight_id, airline
      FROM i94_flights_raw WHERE fltno IS NOT NULL""")
  }

  /** i94_airports — SQL builder (etl.py:283-311). Keeps the reference's
    * exact output column names, including the `airpot_name` typo and the
    * latitude=split[0] assignment, for drop-in compatibility.
    */
  def i94Airports(spark: SparkSession, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("i94_airports_raw")
    spark.sql("""
      SELECT DISTINCT
        STRING(ident) AS airport_id,
        type AS airport_type,
        name AS airpot_name,
        elevation_ft,
        continent,
        iso_country,
        iso_region,
        CASE WHEN iso_region LIKE 'US-%' THEN SPLIT(iso_region, '-')[1]
             ELSE NULL END AS us_cities,
        municipality,
        gps_code,
        iata_code,
        local_code,
        CAST(SPLIT(coordinates, ',')[0] AS DOUBLE) AS latitude,
        CAST(SPLIT(coordinates, ',')[1] AS DOUBLE) AS longitude
      FROM i94_airports_raw""")
  }

  /** i94_us_states_demographic — SQL builder (etl.py:313-335). */
  def i94UsStatesDemographic(spark: SparkSession, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("i94_us_states_demographics_raw")
    spark.sql("""
      SELECT DISTINCT
        State AS state,
        DOUBLE(`Median Age`) AS median_age,
        INT(`Male Population`) AS male_population,
        INT(`Female Population`) AS female_population,
        INT(`Number of Veterans`) AS num_veterans,
        INT(`Foreign-born`) AS num_foreign_born,
        DOUBLE(`Average Household Size`) AS avg_household_size,
        `State Code` AS state_code
      FROM i94_us_states_demographics_raw""")
  }

  /** i94_us_cities_demographic — SQL builder (etl.py:337-353). */
  def i94UsCitiesDemographic(spark: SparkSession, df: DataFrame): DataFrame = {
    df.createOrReplaceTempView("i94_us_cities_demographics_raw")
    spark.sql("""
      SELECT UPPER(City) AS city, Race AS race, INT(Count) AS population
      FROM i94_us_cities_demographics_raw""")
  }

  /** i94_dates — DSL builder chained off trips (etl.py:355-376, 784-792). */
  def i94Dates(df: DataFrame): DataFrame =
    df.select(
        col("i94_year"),
        col("i94_month"),
        col("arrival_date"),
        year(col("arrival_date")).as("year"),
        month(col("arrival_date")).as("month"),
        dayofmonth(col("arrival_date")).as("day"),
        dayofweek(col("arrival_date")).as("dayofweek"),
        Dates.weekendFlag(col("arrival_date")).as("is_weekend"))
      .dropDuplicates()
}
