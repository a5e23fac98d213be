package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parser for the semi-structured SAS labels dictionary (SURVEY.md §2.1 S5;
  * /root/reference/Capstone/scripts/etl.py:378-420): split the file on `;`,
  * slice a section range, keep only `k=v` lines, strip whitespace and
  * single quotes, first key wins. Emits the 5 reference dimension tables
  * with the section positions from etl.py:826-832.
  */
object DictionaryParser {

  /** `(indexName, colName, startPos, endPos)` per reference table. */
  case class Section(table: String, startPos: Int, endPos: Int,
      colName: String, indexName: String)

  /** Section registry (etl.py:826-832). */
  val sections: Seq[Section] = Seq(
    Section("i94_countries", 2, 3, "country", "country_id"),
    Section("i94_port_state_mapping", 3, 4, "city", "i94_port"),
    Section("i94_travel_mode", 4, 5, "mode", "mode_id"),
    Section("i94_state_mapping", 5, 6, "state", "state_id"),
    Section("i94_visa", 6, 7, "visa_purpose", "visa_id"))

  /** Reference parse semantics: `;`-split → section slice → `=`-lines →
    * strip + quote-strip both sides → first-wins dedup, insertion order.
    */
  def parse(content: String, startPos: Int, endPos: Int): Seq[(String, String)] = {
    val sectionLines = content.split(";", -1)
      .slice(startPos, endPos)
      .flatMap(_.split("\n"))
      .filter(_.contains("="))
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, String]
    sectionLines.foreach { line =>
      val Array(k, v) = line.split("=", 2)
      val key = k.trim.stripPrefix("'").stripSuffix("'")
      val value = v.trim.stripPrefix("'").stripSuffix("'")
      if (!seen.contains(key)) seen(key) = value
    }
    seen.toSeq
  }

  /** Build one reference dim as a DataFrame `(indexName, colName)`. */
  def toDF(spark: SparkSession, content: String, s: Section): DataFrame = {
    import spark.implicits._
    parse(content, s.startPos, s.endPos).toDF(s.indexName, s.colName)
  }

  /** The port→(city, state) split applied to i94_port_state_mapping
    * (etl.py:556-562): strip, then rsplit-once on the last comma — values
    * with embedded commas keep them in the city part.
    */
  def portStateMapping(spark: SparkSession, content: String): DataFrame = {
    import spark.implicits._
    val s = sections.find(_.table == "i94_port_state_mapping").get
    parse(content, s.startPos, s.endPos).map { case (port, cityState) =>
      val trimmed = cityState.trim
      val idx = trimmed.lastIndexOf(',')
      if (idx >= 0) (port, trimmed.substring(0, idx), trimmed.substring(idx + 1))
      else (port, trimmed, null)
    }.toDF("i94_port", "city", "state")
  }
}
