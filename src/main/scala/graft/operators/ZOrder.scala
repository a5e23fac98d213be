package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) data layout — the multi-dimensional
  * clustering trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: rows
  * sorted by the bit-interleave of two cell coordinates land so that
  * a range of the 1-D sort key covers a compact 2-D rectangle, which
  * is what makes min/max file statistics prune BOTH dimensions at
  * once. At 100 TB this is a LAYOUT decision, not a query: write the
  * fact table range-partitioned by [[zValue]] and every
  * `user × time-window` scan prunes to a handful of files where a
  * single-column sort prunes only one dimension (ZOrderSpec measures
  * the bounding-box shrinkage on the real events table).
  */
object ZOrder {

  /** Morton interleave of two `bits`-bit non-negative cell coordinates
    * — a pure bitwise Catalyst expression tree (codegen'd; `>> & <<`
    * are engine-exact on non-negative integers, so the oracle replays
    * the identical arithmetic). LONG-typed throughout (2·31 = 62
    * result bits fit). This is the ONE Morton implementation: q235's
    * 8-bit event grid and q132's 31-bit lineitem layout
    * ([[CoreQueries.mortonCol]]) both delegate here.
    */
  def zValue(a: Column, b: Column, bits: Int = 8): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The oracle-side rendering of [[zValue]] — the same bit ops as SQL
    * text, interpolated into the q235 oracle so implementation and
    * gate share one formula.
    */
  private[graft] def zValueSql(a: String, b: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** q235: z-cell occupancy of the events table on the
    * (user mod 256) × (day-of-month) grid — the layout diagnostic run
    * before committing a z-order rewrite: how many rows and how many
    * distinct users/days each 64-wide z-range holds. Pure integer bit
    * arithmetic; one partial-agg shuffle onto ≤1024 cells.
    */
  def q235ZorderCells(spark: SparkSession, dir: String): DataFrame =
    zorderCellsOn(Tables.events(spark, dir))

  private[graft] def zorderCellsOn(ev: DataFrame): DataFrame =
    ev.select(pmod(col("user_id"), lit(256L)).cast("int").as("ucell"),
        dayofmonth(col("ts")).as("dcell"))
      .select(col("ucell"), col("dcell"),
        zValue(col("ucell"), col("dcell")).cast("long").as("z"))
      .groupBy(expr("z div 64").as("zcell"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("ucell")).as("n_users"),
        count_distinct(col("dcell")).as("n_days"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .orderBy(col("zcell"))
}
