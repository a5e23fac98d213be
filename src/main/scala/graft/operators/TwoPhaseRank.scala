package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global rank / running sum over VALUE-ordered frames — the
  * q130 two-phase bucket-offset pattern generalized from key-ordered
  * (dense IDs over `vec_id`) to value-ordered (rank customers by spend,
  * suppliers by lateness).
  *
  * The naive `row_number()/sum() OVER (ORDER BY v)` moves the whole
  * frame through ONE window partition — the canonical 100 TB
  * scale-killer that rounds 9–10 eliminated and round 11 re-introduced
  * on three aggregate-grain frames (VERDICT r11: q284/q296/q303).
  * Two-phase instead:
  *
  *   1. value-range buckets `((v − min) · nb) div (max − min + 1)` —
  *      monotone in `v`, so bucket order concatenated with in-bucket
  *      order reproduces the global total order exactly (ties in `v`
  *      land in one bucket and break on `tieCol`, same as the naive
  *      window's total order);
  *   2. per-bucket streaming rank / cumsum (window PARTITIONED by
  *      bucket — data-cardinality rows never share one partition);
  *   3. bucket offsets from a cumulative sum over the bucket-COUNT
  *      frame — the only partitionless window left runs over ≤ nb rows
  *      (PlanLintSpec's allowlisted bounded shape), then broadcasts
  *      back.
  *
  * `r = offset + intra` equals the naive global `row_number` exactly;
  * `cum = sumOffset + intraCum` equals the naive running sum under the
  * same total order — the DuckDB oracles keep computing the naive form.
  *
  * Bounds are data-derived via one scalar aggregate crossed in by
  * broadcast (no collect); min==max degenerates to one bucket safely.
  * Value ranges here are lifetime cents / lateness counts — they grow
  * with entity size, not row count, so `(v−min)·nb` stays far below
  * DECIMAL(38,0) overflow at any SF. Tie skew: rows equal in `v` must
  * share a bucket (correctness), so a frame dominated by ONE value
  * still bottlenecks — the extension is compound bucketing on
  * `(v, hash(tieCol) range)`, not needed while values are sums of
  * per-entity activity.
  */
object TwoPhaseRank {

  /** Attach `r` (global 1-based row_number, LONG) and — when `cumCol`
    * is set — `cum` (global running sum of `cumCol` as DECIMAL(38,0),
    * rows-between unbounded-preceding..current) under the total order
    * `(valueCol [DESC], tieCol ASC)`. All input columns pass through.
    */
  def rankBy(df: DataFrame, valueCol: String, tieCol: String,
      descending: Boolean = false, cumCol: Option[String] = None,
      nBuckets: Int = 1024): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val bounds = df.agg(
      min(col(valueCol)).cast("decimal(38,0)").as("_mn"),
      max(col(valueCol)).cast("decimal(38,0)").as("_mx"))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("_bkt", expr(
        s"CAST(((CAST($valueCol AS decimal(38,0)) - _mn) * $nBuckets)" +
          s" DIV (_mx - _mn + 1) AS INT)"))
      .drop("_mn", "_mx")
    val ord: Seq[Column] =
      if (descending) Seq(col(valueCol).desc, col(tieCol).asc)
      else Seq(col(valueCol).asc, col(tieCol).asc)
    val wIntra = Window.partitionBy(col("_bkt")).orderBy(ord: _*)
    val perBucket = cumCol.foldLeft(
      bucketed.withColumn("_ir", row_number().over(wIntra).cast("long"))
    ) { (d, c) =>
      d.withColumn("_ic", sum(col(c).cast("decimal(38,0)")).over(
        wIntra.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }
    val aggs = Seq(count(lit(1)).as("_cnt")) ++
      cumCol.map(c => sum(col(c).cast("decimal(38,0)")).as("_bsum"))
    val byBucket = bucketed.groupBy(col("_bkt")).agg(aggs.head, aggs.tail: _*)
    // the ONE partitionless window: a cumsum over the ≤ nBuckets-row
    // bucket-count frame (bounded by construction, never by the data)
    val wOff = Window
      .orderBy(if (descending) col("_bkt").desc else col("_bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = cumCol.foldLeft(
      byBucket.withColumn("_roff", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
    ) { (d, _) =>
      d.withColumn("_coff",
        coalesce(sum(col("_bsum")).over(wOff), lit(0).cast("decimal(38,0)")))
    }.drop("_cnt", "_bsum")
    val joined = perBucket.join(broadcast(offsets), "_bkt")
      .withColumn("r", col("_roff") + col("_ir"))
    cumCol.foldLeft(joined) { (d, _) =>
      d.withColumn("cum", (col("_coff") + col("_ic")).cast("decimal(38,0)"))
    }.drop("_bkt", "_ir", "_ic", "_roff", "_coff")
  }
}
