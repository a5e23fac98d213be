package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the pre-shuffle tool for repeated fact⋈fact
  * joins at 100 TB. Writing both sides bucketed by the join key into the
  * warehouse lets every subsequent join skip its Exchange entirely —
  * shuffle once at write time, join shuffle-free forever after.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Bucket-join two previously-bucketed tables on their bucket key.
    * With matching bucket counts Catalyst plans SortMergeJoin with NO
    * Exchange on either side (verify via `hasShuffle`).
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))

  /** True if the executed plan contains a shuffle exchange. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.nonEmpty
}
