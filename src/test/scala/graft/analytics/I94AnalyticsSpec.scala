package graft.analytics

import graft.SparkSpecBase
import graft.etl.{DictionaryParser, Fixtures, RefBuilders}

class I94AnalyticsSpec extends SparkSpecBase {

  lazy val raw = Fixtures.rawI94(spark)
  lazy val trips = RefBuilders.i94Trips(spark, raw)
  lazy val immigrations = RefBuilders.i94Immigrations(raw)
  lazy val visitors = RefBuilders.i94Visitors(spark, raw)
  lazy val countries = DictionaryParser.toDF(spark, Fixtures.dictionary,
    DictionaryParser.sections.find(_.table == "i94_countries").get)
  lazy val modes = DictionaryParser.toDF(spark, Fixtures.dictionary,
    DictionaryParser.sections.find(_.table == "i94_travel_mode").get)
  lazy val visa = DictionaryParser.toDF(spark, Fixtures.dictionary,
    DictionaryParser.sections.find(_.table == "i94_visa").get)
  lazy val portState = DictionaryParser.portStateMapping(spark, Fixtures.dictionary)
  lazy val states = RefBuilders.i94UsStatesDemographic(spark, Fixtures.demographics(spark))

  test("q1 monthly trend counts all trips") {
    val t = monthlyByKey()
    assert(t === Map((2016, 4) -> 3L))
  }
  private def monthlyByKey() =
    I94Analytics.monthlyTrend(trips).collect()
      .map(r => (r.getAs[Int]("i94_year"), r.getAs[Int]("i94_month")) -> r.getAs[Long]("n_trips")).toMap

  test("q2 top countries: fact⋈dictionary join resolves names") {
    val rows = I94Analytics.topCountries(trips, countries).collect()
    // residents: 102 (FRANCE) ×2, 104 (unmapped, dropped by inner join)
    assert(rows.map(r => r.getAs[String]("country") -> r.getAs[Long]("n_visitors")).toMap
      === Map("FRANCE" -> 2L))
  }

  test("q3 top cities via immigrations⋈port_state_mapping") {
    val rows = I94Analytics.topCities(immigrations, portState).collect()
    assert(rows.map(_.getAs[String]("city")).toSet
      .subsetOf(Set("NEW YORK", "LOS ANGELES", "CHICAGO")))
    assert(rows.map(_.getAs[Long]("n_visitors")).sum === 3)
  }

  test("q4 favourite mode per country picks rank 1 deterministically") {
    val rows = I94Analytics.favouriteModePerCountry(trips, immigrations, modes, countries).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("country")).distinct.length === rows.length)
  }

  test("q5/q6/q8: months, visa categories, purpose") {
    assert(I94Analytics.preferredMonths(trips).head().getAs[Long]("n_trips") === 3)
    val vc = I94Analytics.topVisaCategories(trips, visa).collect()
    assert(vc.map(_.getAs[Long]("n")).sum === 3)
    val vp = I94Analytics.visitPurpose(trips, visa).collect()
    assert(vp.map(r => r.getAs[String]("visa_purpose")).toSet
      === Set("Business", "Pleasure", "Student"))
  }

  test("q7 demographics: age bands + null gender kept") {
    val rows = I94Analytics.travellerDemographics(visitors).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === 3)
    assert(rows.exists(_.getAs[String]("age_band") === "unknown")) // null birth_year row
  }

  test("q9 avg stay uses only completed trips") {
    val r = I94Analytics.avgStayDuration(trips).head()
    assert(r.getAs[Long]("n_completed_trips") === 1) // only cicid=1 has both dates
    assert(r.getAs[Double]("avg_stay_days") === 5.0) // 20550 - 20545
  }

  test("q10 busiest ports + census mash-up") {
    val ports = I94Analytics.busiestPorts(immigrations).collect()
    assert(ports.map(_.getAs[Long]("n_arrivals")).sum === 3)
    val census = I94Analytics.arrivalsVsCensus(immigrations, portState, states).collect()
    assert(census.map(_.getAs[Long]("n_arrivals")).sum === 3)
    // NYC row joins NY → no matching state in fixture demographics (MA/GA) → null median_age
    assert(census.forall(r => r.getAs[Long]("n_arrivals") > 0))
  }
}
