package graft.streaming

import graft.operators.KllQuantiles
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming KLL quantiles — the randomized-sketch counterpart of
  * [[SketchStream]]'s CMS, completing the sketch-family stream/batch
  * matrix: CMS streams with EXACT stream ≡ batch equality (pure cell
  * sums), KLL streams under its (ε, δ) rank-error envelope, because
  * compaction is randomized and merge-order-dependent — the same
  * reason batch KLL ([[graft.operators.KllQuantiles]]) is spec-gated
  * rather than oracle-gated.
  *
  * Shape: per-batch sketch merge in a stateful aggregation
  * (mapGroupsWithState) — each micro-batch builds a FRESH sketch from
  * its rows and merges it into the ~3 KB serialized sketch held in the
  * state store, exactly the executor-side merge tree a 1000-executor
  * batch aggregation runs, unrolled over time. State per key is fixed
  * size regardless of stream length (the property that makes a sketch
  * the right streaming state at 100 TB/day: an exact quantile state
  * would grow with the stream).
  */
object KllQuantileStream {

  case class KllPanel(key: String, n: Long,
      p50: Double, p90: Double, p99: Double)

  val K = 200

  private[streaming] def updateGroup(key: String,
      rows: Iterator[(String, Double)],
      state: GroupState[Array[Byte]]): KllPanel = {
    val sk = KllDoublesSketch.newHeapInstance(K)
    if (state.exists) sk.merge(KllDoublesSketch.heapify(Memory.wrap(state.get)))
    // the per-batch sketch, merged ONCE — never per-row heapify
    val batch = KllDoublesSketch.newHeapInstance(K)
    rows.foreach(r => batch.update(r._2))
    sk.merge(batch)
    state.update(sk.toByteArray)
    KllPanel(key, sk.getN,
      sk.getQuantile(0.5), sk.getQuantile(0.9), sk.getQuantile(0.99))
  }

  /** Live per-key p50/p90/p99 over a (key, value) stream; Update output
    * mode (one refreshed panel row per key per micro-batch).
    */
  def kllPanels(keyed: Dataset[(String, Double)]): Dataset[KllPanel] = {
    import keyed.sparkSession.implicits._
    keyed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateGroup _)
  }

  /** Events entry point: live per-event-type value quantiles over the
    * staged events landing zone.
    */
  def eventValuePanels(spark: SparkSession, dir: String): Dataset[KllPanel] = {
    import spark.implicits._
    kllPanels(EventsStream.stagedEventsStream(spark, dir, "graft-kll-stream")
      .select(col("event_type"), col("value").cast("double"))
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .as[(String, Double)])
  }

  /** The batch twin on the identical frame — the spec's A/B: both sides
    * must answer inside the k=200 envelope on the same landed rows.
    */
  def batchPanel(df: org.apache.spark.sql.DataFrame, valueCol: String): Map[Int, Double] =
    KllQuantiles.quantiles(df, valueCol, Seq(50, 90, 99), K)
}
