package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Native-expression replacements for the reference's two Python UDFs
  * (SURVEY.md §2.9). Both stay inside whole-stage codegen — no UDF
  * serialization boundary, which is the single biggest perf win of the
  * rewrite at scale.
  */
object Dates {

  /** UD1 `SASDateConverter` (/root/reference/Capstone/scripts/etl.py:130-140):
    * SAS numeric date = days since 1960-01-01; null-safe by construction.
    */
  def sasDate(days: Column): Column =
    date_add(to_date(lit("1960-01-01")), days.cast("int"))

  /** UD2 `change_date_format` *intended* semantics
    * (etl.py:142-159 is buggy — always null, see SURVEY.md §2.9/§7.4-2;
    * the notebook cell-19 prototype shows the intent): try `yyyyMMdd`,
    * then `MMddyyyy`; junk → null. `try_to_timestamp` keeps this ANSI-safe
    * (returns null instead of throwing on malformed input).
    */
  def flexDate(s: Column): Column =
    coalesce(
      to_date(try_to_timestamp(s, lit("yyyyMMdd"))),
      to_date(try_to_timestamp(s, lit("MMddyyyy"))))

  /** Id normalization `STRING(INT(x))` (etl.py:206-223), long-safe for
    * admnum-sized ids (SURVEY.md §7.4-1).
    */
  def idString(c: Column): Column = c.cast("long").cast("string")

  /** Weekend flag (etl.py:372-373): Spark dayofweek is Sunday=1. */
  def weekendFlag(d: Column): Column =
    when(dayofweek(d) === 1 || dayofweek(d) === 7, lit("weekend"))
      .otherwise(lit("weekday"))
}
