package graft.dq

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite (q330) — the
  * "Great-Expectations-lite" runner the reference's DQ module grows
  * into at scale (reference: Capstone's dq checks are row-count > 0
  * and dup counts; this is the same idea as a CONFIGURED panel).
  * A suite is a list of typed checks per table; the runner emits one
  * row per check — `(tbl, chk, n_checked, n_violations, pass)` — so a
  * scheduler can gate on `min(pass)` and an operator can read WHICH
  * expectation broke and by how much, instead of a boolean.
  *
  * Scale shape: all ROW-LOCAL checks of one table (not-null, enum
  * domain, range) fold into ONE conditional-aggregate scan —
  * map-side-combinable counts, so the panel costs one pass per table
  * plus one dup-aggregate per uniqueness key and one broadcast/shuffle
  * anti-join per FK edge. Adding a row check to a table adds a column
  * to its aggregate, never a pass.
  */
object DqSuite {

  /** All row-local checks of one table in a single scan: each check is
    * a violation predicate; the 1-row aggregate unpivots to one row
    * per check via a constant-width stack.
    */
  private[dq] def rowChecks(tbl: String, df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    val aggs = count(lit(1)).as("__n") +:
      checks.map { case (name, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(name)
      }
    val stacked = checks.map { case (name, _) => s"'$name', $name" }
      .mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"),
        expr(s"stack(${checks.size}, $stacked) AS (chk, n_violations)"))
      .select(lit(tbl).as("tbl"), col("chk"), col("__n").as("n_checked"),
        col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))
  }

  /** Uniqueness: violations = surplus copies beyond the first per key
    * (0 on a clean table); n_checked = distinct keys.
    */
  private[dq] def uniqueCheck(tbl: String, df: DataFrame,
      cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_checked"),
        sum(col("c") - 1L).as("n_violations"))
      .select(lit(tbl).as("tbl"),
        lit(s"unique_${cols.mkString("_")}").as("chk"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))

  /** Referential integrity: violations = child rows whose key has no
    * parent (null-keyed rows count as orphans — a null FK fails RI
    * here; add an explicit not-null check for the distinct signal).
    */
  private[dq] def fkCheck(tbl: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val orphans = child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey),
        "left_anti")
    child.agg(count(lit(1)).as("n_checked"))
      .crossJoin(broadcast(orphans.agg(count(lit(1)).as("n_violations"))))
      .select(lit(tbl).as("tbl"),
        lit(s"fk_${childKey}_to_$parentKey").as("chk"),
        col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).cast("int").as("pass"))
  }

  /** The concrete suite over the star schema: not-null / unique / enum
    * domain / range / FK expectations for orders, lineitem, events.
    * The panel is NOT vacuously green on the shipped testdata: the
    * synthetic lineitem reuses (l_orderkey, l_linenumber), so its
    * uniqueness expectation genuinely FAILS (pass = 0 with the surplus
    * copy count) — exactly the report-the-breakage behavior the runner
    * exists for — while the other 11 checks pass with their real scan
    * cardinalities in n_checked. DqSuiteSpec additionally plants one
    * violation per check class and pins each is caught exactly once.
    */
  def dqSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)
    val events = Tables.events(spark, dir)
    val panels = Seq(
      rowChecks("orders", orders, Seq(
        "not_null_o_orderkey" -> col("o_orderkey").isNull,
        "enum_o_orderstatus" -> (col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("F", "O", "P")),
        "range_o_totalprice" ->
          (col("o_totalprice") <= 0.0 || col("o_totalprice") > 1000000.0))),
      uniqueCheck("orders", orders, Seq("o_orderkey")),
      fkCheck("orders", orders, "o_custkey", customer, "c_custkey"),
      rowChecks("lineitem", lineitem, Seq(
        "not_null_l_orderkey" -> col("l_orderkey").isNull,
        "range_l_quantity" ->
          (col("l_quantity") < 1.0 || col("l_quantity") > 50.0))),
      uniqueCheck("lineitem", lineitem, Seq("l_orderkey", "l_linenumber")),
      fkCheck("lineitem", lineitem, "l_orderkey", orders, "o_orderkey"),
      rowChecks("events", events, Seq(
        "not_null_event_id" -> col("event_id").isNull,
        "enum_event_type" -> (col("event_type").isNull ||
          !col("event_type").isin(Tables.EventTypes: _*)))),
      uniqueCheck("events", events, Seq("event_id")))
    panels.reduce(_ unionByName _).orderBy(col("tbl"), col("chk"))
  }
}
