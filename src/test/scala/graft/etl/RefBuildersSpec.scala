package graft.etl

import graft.SparkSpecBase
import java.sql.Date

class RefBuildersSpec extends SparkSpecBase {

  lazy val raw = Fixtures.rawI94(spark)

  test("i94_immigrations: schema, dedup, casts, flexible date parse") {
    val im = RefBuilders.i94Immigrations(raw)
    assert(im.columns.toSet === Set("i94_port", "visa_post", "arrival_flag",
      "depature_flag", "update_flag", "match_flag", "custom_client_id",
      "i94_year", "i94_month", "mode_of_entry", "i94_entry_date", "i94_valid_till"))
    val rows = im.collect().map(r => r.getAs[String]("custom_client_id") -> r).toMap
    assert(rows.size === 3) // exact dup collapsed
    val r1 = rows("1")
    assert(r1.getAs[Int]("i94_year") === 2016)
    assert(r1.getAs[Date]("i94_entry_date") === Date.valueOf("2016-04-01")) // yyyyMMdd
    assert(r1.getAs[Date]("i94_valid_till") === Date.valueOf("2016-04-15")) // MMddyyyy
    val r2 = rows("2")
    assert(r2.getAs[Date]("i94_entry_date") === Date.valueOf("2016-04-02")) // MMddyyyy layout
    assert(r2.getAs[Date]("i94_valid_till") === null) // 'D/S' junk → null
    val r3 = rows("3")
    assert(r3.getAs[Date]("i94_entry_date") === null) // 'junk' → null
  }

  test("i94_trips: long-safe admnum, SAS dates, deterministic trip_id") {
    val t = RefBuilders.i94Trips(spark, raw)
    val rows = t.collect().map(r => r.getAs[String]("custom_client_id") -> r).toMap
    assert(rows.size === 3)
    // admnum 94953870030 survives via BIGINT (int32 would overflow)
    assert(rows("1").getAs[String]("admissions_number") === "94953870030")
    // SAS epoch: 20545 days after 1960-01-01 = 2016-04-01
    assert(rows("1").getAs[Date]("arrival_date") === Date.valueOf("2016-04-01"))
    assert(rows("3").getAs[Date]("arrival_date") === null) // null arrdate
    assert(rows("2").getAs[Date]("depature_date") === null) // null depdate
    // deterministic surrogate ids 1..3 by (cicid, admnum)
    assert(t.collect().map(_.getAs[String]("trip_id")).sorted.toSeq === Seq("1", "2", "3"))
  }

  test("i94_trips: two-phase trip_id equals the naive global row_number") {
    import org.apache.spark.sql.{Row, functions => F}
    import org.apache.spark.sql.expressions.Window
    // cicids spanning several 4096-wide buckets (incl. exact boundaries),
    // a null cicid (buckets to null, sorts first like the naive form),
    // and duplicate (cicid, admnum) pairs tied until the fltno column
    val cases = Seq(
      (null.asInstanceOf[java.lang.Double], 1.0d, "N1"),
      (java.lang.Double.valueOf(1.0), 10.0d, "A"),
      (java.lang.Double.valueOf(1.0), 10.0d, "B"),   // tie on (cicid, admnum)
      (java.lang.Double.valueOf(1.0), 11.0d, "C"),
      (java.lang.Double.valueOf(4095.0), 20.0d, "D"), // last row of bucket 0
      (java.lang.Double.valueOf(4096.0), 20.0d, "E"), // first row of bucket 1
      (java.lang.Double.valueOf(4097.0), 20.0d, "F"),
      (java.lang.Double.valueOf(4097.0), 20.0d, "G"), // tie in bucket 1
      (java.lang.Double.valueOf(50000.0), 30.0d, "H"),
      (java.lang.Double.valueOf(123456.0), 30.0d, "I"))
    val rows = cases.map { case (cicid, admnum, flt) =>
      Row(cicid, 2016.0d, 4.0d, 101.0d, 102.0d, "NYC", 20545.0d, 1.0d, "NY",
        null, 30.0d, 2.0d, 1.0d, "20160401", null, null, null, null, null,
        null, 1986.0d, "04152016", "F", null, "AA",
        java.lang.Double.valueOf(admnum), flt, "B2")
    }
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.rawI94)
    // the pre-round-8 builder: one global-order window over every column
    val tieBreak = (Seq("cicid", "admnum") ++
      raw.columns.filterNot(Set("cicid", "admnum"))).map(F.col)
    val naive = raw.dropDuplicates()
      .withColumn("trip_id", F.row_number().over(Window.orderBy(tieBreak: _*)))
      .select(F.col("trip_id").cast("string"),
        F.expr("STRING(BIGINT(admnum))").as("adm"), F.col("fltno"))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getString(0))
      .toMap
    val got = RefBuilders.i94Trips(spark, raw)
      .select(F.col("trip_id"), F.col("admissions_number"), F.col("flight_id"))
      .collect().map(r => (r.getString(1), r.getString(2)) -> r.getString(0))
      .toMap
    assert(got === naive)
    assert(got.values.map(_.toInt).toSeq.sorted === (1 to cases.size).toSeq)
  }

  test("i94_trips: the trip_id window is hash-partitioned, offsets broadcast") {
    val plan = RefBuilders.i94Trips(spark, raw)
      .queryExecution.executedPlan.toString
    // the per-bucket rank window must be hash-partitioned on the bucket;
    // the only global-order artifact allowed is the bucket-COUNT frame,
    // which comes back via a broadcast join (the q130 PlanSpec pin,
    // applied to the ETL fact builder — the one surface guaranteed to
    // see full-corpus volume)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("i94_visitors + i94_flights: projections and not-null filter") {
    val v = RefBuilders.i94Visitors(spark, raw)
    assert(v.count() === 3)
    assert(v.columns.toSet === Set("admissions_number", "i94_year", "i94_month",
      "occupation", "resident_country_id", "birth_year", "gender"))
    val f = RefBuilders.i94Flights(spark, raw)
    val fr = f.collect()
    assert(fr.map(_.getAs[String]("flight_id")).toSet === Set("00123", "777")) // null fltno dropped
  }

  test("i94_airports: US state split, coord casts, reference column names") {
    val a = RefBuilders.i94Airports(spark, Fixtures.airports(spark))
    assert(a.columns.contains("airpot_name")) // reference's typo kept for drop-in compat
    val byId = a.collect().map(r => r.getAs[String]("airport_id") -> r).toMap
    assert(byId("00A").getAs[String]("us_cities") === "KS")
    assert(byId("EGLL").getAs[String]("us_cities") === null)
    assert(math.abs(byId("00A").getAs[Double]("latitude") - (-101.47)) < 1e-9)
  }

  test("i94 demographics: distinct state rows, junk numeric → null, UPPER city") {
    val s = RefBuilders.i94UsStatesDemographic(spark, Fixtures.demographics(spark))
    val srows = s.collect()
    assert(srows.length === 2) // city-level dup rows collapse at state level
    val ga = srows.find(_.getAs[String]("state_code") === "GA").get
    assert(ga.isNullAt(ga.fieldIndex("male_population"))) // 'junk' cast → null
    val c = RefBuilders.i94UsCitiesDemographic(spark, Fixtures.demographics(spark))
    assert(c.collect().map(_.getAs[String]("city")).toSet === Set("QUINCY", "DALTON"))
  }

  test("i94_dates: calendar attrs + weekend flag off trips") {
    val t = RefBuilders.i94Trips(spark, raw)
    val d = RefBuilders.i94Dates(t)
    val rows = d.collect().filter(!_.isNullAt(2))
      .map(r => r.getAs[Date]("arrival_date").toString -> r).toMap
    // 2016-04-02 was a Saturday
    assert(rows("2016-04-02").getAs[String]("is_weekend") === "weekend")
    assert(rows("2016-04-01").getAs[String]("is_weekend") === "weekday")
    assert(rows("2016-04-01").getAs[Int]("dayofweek") === 6) // Friday, Sunday=1
  }
}
