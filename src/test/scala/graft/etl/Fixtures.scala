package graft.etl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** In-memory fixture rows per FIXTURES.md §A: nulls, junk dates, dup rows,
  * admnum > 2^31, both date layouts, embedded-comma dictionary values.
  */
object Fixtures {

  /** 28-column raw I94 rows. arrdate 20454 = 2016-01-01 (days since
    * 1960-01-01); admnum 94953870030 exceeds int32.
    */
  def rawI94(spark: SparkSession): DataFrame = {
    val rows = Seq(
      // cicid, i94yr, i94mon, i94cit, i94res, i94port, arrdate, i94mode, i94addr, depdate,
      // i94bir, i94visa, count, dtadfile, visapost, occup, entdepa, entdepd, entdepu, matflag,
      // biryear, dtaddto, gender, insnum, airline, admnum, fltno, visatype
      Row(1.0d, 2016.0d, 4.0d, 101.0d, 102.0d, "NYC", 20545.0d, 1.0d, "NY", 20550.0d,
        30.0d, 2.0d, 1.0d, "20160401", "LND", null, "G", "O", null, "M",
        1986.0d, "04152016", "F", null, "AA", 94953870030.0d, "00123", "B2"),
      Row(1.0d, 2016.0d, 4.0d, 101.0d, 102.0d, "NYC", 20545.0d, 1.0d, "NY", 20550.0d,
        30.0d, 2.0d, 1.0d, "20160401", "LND", null, "G", "O", null, "M",
        1986.0d, "04152016", "F", null, "AA", 94953870030.0d, "00123", "B2"), // exact dup
      Row(2.0d, 2016.0d, 4.0d, 103.0d, 104.0d, "LAX", 20546.0d, 2.0d, "CA", null,
        45.0d, 1.0d, 1.0d, "04022016", "PAR", "ENG", "G", null, null, null,
        1971.0d, "D/S", "M", null, "DL", 1234.0d, null, "B1"), // MMddyyyy layout + junk dtaddto + null fltno/depdate
      Row(3.0d, 2016.0d, 4.0d, 101.0d, 102.0d, "CHI", null, 9.0d, null, null,
        null, 3.0d, 1.0d, "junk", null, null, null, null, null, null,
        null, "/   183D", null, null, null, 5678.0d, "777", "F1")) // null arrdate, junk both dates
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.rawI94)
  }

  def airports(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("00A", "heliport", "Aero B Ranch", "11", "NA", "US", "US-KS",
        "Leoti", "00A", null, "00A", "-101.47, 38.70"),
      Row("EGLL", "large_airport", "Heathrow", "83", "EU", "GB", "GB-ENG",
        "London", "EGLL", "LHR", null, "-0.4614, 51.47"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.airports)
  }

  def demographics(spark: SparkSession): DataFrame = {
    val rows = Seq(
      Row("Quincy", "Massachusetts", "41.0", "44129", "49500", "93629", "4147",
        "32935", "2.39", "MA", "White", "58723"),
      Row("Quincy", "Massachusetts", "41.0", "44129", "49500", "93629", "4147",
        "32935", "2.39", "MA", "Asian", "30473"),
      Row("Dalton", "Georgia", "33.2", "junk", "17240", "33784", "1563",
        "10423", "2.84", "GA", "White", "18641")) // junk numeric → null on cast
    spark.createDataFrame(spark.sparkContext.parallelize(rows), Schemas.demographics)
  }

  /** Miniature SAS dictionary with the reference's 5 sections (FIXTURES.md
    * §A4): duplicate key (first-wins), a no-`=` comment line (skipped), an
    * embedded-comma port value (rsplit-once).
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
      |   '99' = 'All Other Codes' ;
      |  value i94visa
      |   1 = 'Business'
      |   2 = 'Pleasure'
      |   3 = 'Student' ;
      |run ;""".stripMargin
}
