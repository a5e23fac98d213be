package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-processing operators: what a 100 TB corpus pipeline runs
  * BETWEEN full builds — daily crawl drops arrive as a new snapshot and
  * everything downstream (dedup, filtering, packing) wants the delta,
  * not a recompute. The reference pipeline is batch-only
  * (`Capstone/scripts/etl.py:583-847` rebuilds every table per run);
  * this is the extension surface that makes that loop incremental.
  */
object IncrementalOps {

  /** Change manifest between two snapshots keyed by `doc_id`: one row
    * per ADDED / REMOVED / CHANGED document (content compared by raw
    * md5), with `n_chars` of the surviving side. Unchanged rows are
    * filtered out BEFORE the manifest materializes — at 100 TB the
    * unchanged mass dominates and must never be collected, written, or
    * even projected past the join.
    *
    * Scale shape: one full-outer join on the snapshot key. In
    * production both snapshots are bucketed by `doc_id`, so this is a
    * ZERO-shuffle sort-merge over co-located buckets; the output is
    * delta-sized. No skew hazard (keys are unique per side by
    * snapshot contract).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text")).as("fp1"),
      length(col("text")).cast("long").as("len1"))
    val b = v2.select(col("doc_id"), md5(col("text")).as("fp2"),
      length(col("text")).cast("long").as("len2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("fp2").isNull, lit("removed"))
          .when(col("fp1").isNull, lit("added"))
          .when(col("fp1") =!= col("fp2"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(col("doc_id"), col("status"),
        coalesce(col("len2"), col("len1")).as("n_chars"))
      .orderBy(col("doc_id"), col("status"))
  }

  /** q91 gate: v2 is derived from the same `documents` table with a
    * deterministic edit script (drop `% 13`, revise `% 10`, re-key
    * `% 17` as new ids) so both engines construct identical snapshots
    * and the manifest is pure string/integer comparison — no FP anywhere.
    */
  def q91SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val v1 = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val revised = v1.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    val added = v1.filter(col("doc_id") % 17 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
    snapshotDiff(v1, revised.unionByName(added))
  }
}
