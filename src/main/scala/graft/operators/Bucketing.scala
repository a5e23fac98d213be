package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

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
    * Exchange on either side (verify via `hasShuffle`). Sides are aliased
    * so identically-named keys (the natural same-key fact⋈fact case)
    * resolve unambiguously.
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).alias("l")
    val r = spark.table(rightTable).alias("r")
    l.join(r, col(s"l.$leftKey") === col(s"r.$rightKey"))
  }

  /** True if the executed plan contains a shuffle exchange. AQE-aware:
    * AdaptiveSparkPlanExec is a leaf node, so a naive collect never looks
    * inside it — recurse through adaptive wrappers and query stages.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    def scan(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => scan(a.executedPlan)
      case s: QueryStageExec => s.plan.isInstanceOf[ShuffleExchangeLike] || scan(s.plan)
      case e: ShuffleExchangeLike => true
      case other => other.children.exists(scan)
    }
    scan(df.queryExecution.executedPlan)
  }
}
