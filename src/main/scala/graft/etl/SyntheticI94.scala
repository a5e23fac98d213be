package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic inputs for main-scope end-to-end ETL runs
  * (ManifestRun; EtlVolumeSpec reuses the raw generator). The raw I94
  * frame is derived row-for-row from the driver-provided orders table at
  * a chosen SF — no RNG, so every run of the same SF produces the same
  * bytes-modulo-parquet-metadata output. The real 2016 I94 SAS files are
  * not in this environment (SURVEY §7.4-4); this preserves their SHAPE
  * (28 columns, monthly partitioning, planted exact duplicates, junk
  * dates, nulls, int32-overflowing admnum) at testdata volume.
  */
object SyntheticI94 {

  /** orders → pseudo-I94: every column derived from order fields; four
    * months, 10% planted exact duplicates, ~9% junk dtadfile, ~14% 'D/S'
    * dtaddto, nulls in arrdate/depdate/fltno.
    *
    * `amplify` replicates each order into `amplify` distinct trips
    * (orderkey-space stretched by the factor, so cicid/admnum stay
    * unique and the planted-duplicate rate stays exactly 10%) —
    * the reference's REAL monthly file is 3–4 M rows
    * (`Capstone/README.md:10`), an order of magnitude past sf0.1's
    * 150 k orders, and the volume run (ETL_RUN_sf1.json, VERDICT r16
    * next-round 6) must exercise the pipeline at that shape, not
    * extrapolate it.
    */
  def raw(spark: SparkSession, sfDir: String, amplify: Int = 1): DataFrame = {
    require(amplify >= 1, s"amplify must be >= 1, got $amplify")
    val o0 = graft.Tables.orders(spark, sfDir)
    val o = if (amplify == 1) o0
      else o0
        .withColumn("_i",
          explode(sequence(lit(0L), lit(amplify - 1L))))
        .withColumn("o_orderkey",
          col("o_orderkey") * amplify + col("_i"))
        .drop("_i")
    val base = o.select(
      col("o_orderkey").cast("double").as("cicid"),
      lit(2016.0).as("i94yr"),
      (pmod(col("o_orderkey"), lit(4)) + 1).cast("double").as("i94mon"),
      (pmod(col("o_custkey"), lit(200)) + 100).cast("double").as("i94cit"),
      (pmod(col("o_custkey"), lit(150)) + 100).cast("double").as("i94res"),
      element_at(array(lit("NYC"), lit("LAX"), lit("CHI")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("i94port"),
      when(col("o_orderkey") % 17 === 0, lit(null).cast("double"))
        .otherwise(lit(20545.0) + pmod(col("o_orderkey"), lit(120))).as("arrdate"),
      (pmod(col("o_orderkey"), lit(3)) + 1).cast("double").as("i94mode"),
      element_at(array(lit("NY"), lit("CA"), lit("IL")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("i94addr"),
      when(col("o_orderkey") % 5 === 0, lit(null).cast("double"))
        .otherwise(lit(20600.0) + pmod(col("o_orderkey"), lit(60))).as("depdate"),
      (pmod(col("o_custkey"), lit(80)) + 18).cast("double").as("i94bir"),
      (pmod(col("o_orderkey"), lit(3)) + 1).cast("double").as("i94visa"),
      lit(1.0).as("count"),
      when(col("o_orderkey") % 11 === 0, lit("junk"))
        .otherwise(date_format(col("o_orderdate"), "yyyyMMdd")).as("dtadfile"),
      lit("LND").as("visapost"),
      lit(null).cast("string").as("occup"),
      lit("G").as("entdepa"), lit("O").as("entdepd"),
      lit(null).cast("string").as("entdepu"), lit("M").as("matflag"),
      (lit(2016.0) - (pmod(col("o_custkey"), lit(80)) + 18)).as("biryear"),
      when(col("o_orderkey") % 7 === 0, lit("D/S"))
        .otherwise(date_format(col("o_orderdate"), "MMddyyyy")).as("dtaddto"),
      element_at(array(lit("F"), lit("M"), lit("U")),
        (pmod(col("o_custkey"), lit(3)) + 1).cast("int")).as("gender"),
      lit(null).cast("string").as("insnum"),
      element_at(array(lit("AA"), lit("DL"), lit("UA")),
        (pmod(col("o_orderkey"), lit(3)) + 1).cast("int")).as("airline"),
      (col("o_orderkey") * 100000L + 94953870030L).cast("double").as("admnum"),
      when(col("o_orderkey") % 13 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("FL"), pmod(col("o_orderkey"), lit(999)))).as("fltno"),
      lit("B2").as("visatype"))
    // plant exact duplicates: 10% of rows repeated
    base.unionAll(base.filter(col("cicid") % 10 === 0))
      .select(Schemas.rawI94.fieldNames.map(col): _*)
  }

  /** Airports CSV rows (reference schema, incl. the coordinates column
    * the builder splits): one US heliport with a state-suffixed
    * municipality-coordinates pair and one non-US airport.
    */
  def airports(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row("00A", "heliport", "Aero B Ranch", "11", "NA", "US", "US-KS",
        "Leoti", "00A", null, "00A", "-101.47, 38.70"),
      Row("01XA", "small_airport", "Fort Hood", "9", "NA", "US", "US-TX",
        "Killeen", "01XA", null, "01XA", "-97.73, 31.13"),
      Row("EGLL", "large_airport", "Heathrow", "83", "EU", "GB", "GB-ENG",
        "London", "EGLL", "LHR", null, "-0.4614, 51.47"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.airports)
  }

  /** Demographics CSV rows (reference schema): two cities in one state
    * (collapse at state level) plus a junk numeric (null on cast).
    */
  def demographics(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    val rows = Seq(
      Row("Quincy", "Massachusetts", "41.0", "44129", "49500", "93629",
        "4147", "32935", "2.39", "MA", "White", "58723"),
      Row("Boston", "Massachusetts", "31.0", "334032", "339620", "673184",
        "10943", "190123", "2.36", "MA", "White", "320944"),
      Row("Dalton", "Georgia", "33.2", "junk", "17240", "33784", "1563",
        "10423", "2.84", "GA", "White", "18641"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.demographics)
  }

  /** Miniature SAS dictionary with the reference's 5 sections (same
    * hazards as the test fixture: duplicate key first-wins, a no-`=`
    * comment line, an embedded-comma port value).
    */
  val dictionary: String =
    """libname library 'path' ;
      |proc format library=library ;
      |  value i94cntyl
      |   101 = 'ALBANIA'
      |   102 = 'FRANCE'
      |   101 = 'DUPLICATE-IGNORED'
      |   103 = 'MEXICO' ;
      |  value $i94prtl
      |   'NYC' = 'NEW YORK, NY'
      |   'LAX' = 'LOS ANGELES, CA'
      |   'GEN' = 'GEN M. ESCOBEDO, Monterrey, MX'
      |   comment line without equals
      |   'CHI' = 'CHICAGO, IL' ;
      |  value i94model
      |   1 = 'Air'
      |   2 = 'Sea'
      |   3 = 'Land'
      |   9 = 'Not reported' ;
      |  value i94addrl
      |   'NY' = 'NEW YORK'
      |   'CA' = 'CALIFORNIA'
      |   'IL' = 'ILLINOIS'
      |   '99' = 'All Other Codes' ;
      |  value i94visa
      |   1 = 'Business'
      |   2 = 'Pleasure'
      |   3 = 'Student' ;
      |run ;""".stripMargin
}
