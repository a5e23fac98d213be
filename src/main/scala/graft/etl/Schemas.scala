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
}
