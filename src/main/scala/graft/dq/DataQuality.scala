package graft.dq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Data-quality checks (SURVEY.md §3.2): the reference's post-load checker
  * (/root/reference/Capstone/scripts/i94_data_quality_check.py:79-107)
  * re-expressed as typed, single-evaluation functions. Improvements kept
  * deliberately (SURVEY.md §4): each check evaluates its scan once (the
  * reference re-ran the null check up to 3× per table), `isnan` is applied
  * only to numeric columns (the reference crashed on dates and returned a
  * `['failed']` sentinel), and failures are a typed report, not log lines.
  */
object DataQuality {

  case class NullKeyResult(column: String, nullCount: Long)
  case class DqReport(table: String, rowCount: Long,
      nonEmpty: Boolean, nullKeys: Seq[NullKeyResult], fkViolations: Long = 0) {
    def passed: Boolean = nonEmpty && nullKeys.forall(_.nullCount == 0) && fkViolations == 0
  }

  /** Check 1 (i94_data_quality_check.py:79-87): table is non-empty. */
  def nonEmpty(df: DataFrame): Boolean = !df.isEmpty

  /** Check 2 (i94_data_quality_check.py:89-107): null/NaN count per key
    * column, all columns in ONE pass over the data (one aggregate row).
    */
  def nullKeys(df: DataFrame, cols: Seq[String]): Seq[NullKeyResult] = {
    if (cols.isEmpty) return Nil
    val numeric = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val aggs = cols.map { c =>
      val pred = if (numeric(c)) col(c).isNull || isnan(col(c)) else col(c).isNull
      count(when(pred, lit(1))).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.zipWithIndex.map { case (c, i) => NullKeyResult(c, row.getLong(i)) }
  }

  /** Referential-integrity extension (SURVEY.md §2.4): count fact keys
    * missing from the dim — `left_anti` on the key.
    */
  def fkViolations(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String): Long =
    fact.filter(col(factKey).isNotNull)
      .join(dim, fact(factKey) === dim(dimKey), "left_anti")
      .count()

  /** Full per-table report: one pass for null keys, one count. */
  def check(table: String, df: DataFrame, keyCols: Seq[String]): DqReport = {
    val n = df.count()
    DqReport(table, n, n > 0, nullKeys(df, keyCols))
  }
}
