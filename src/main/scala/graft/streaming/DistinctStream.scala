package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live distinct-cardinality panel (the 21st streaming surface): per
  * event type, the approximate distinct-user count and event volume,
  * maintained as ONE complete-mode stateful aggregation whose state is
  * an HLL register array per group.
  *
  * Why HLL is the sketch to stream for cardinality: its registers are
  * a max-fold over hashed values, so the sketch is a commutative
  * idempotent monoid — micro-batch boundary placement cannot move the
  * estimate by even one unit (stream ≡ batch EXACT equality, not a
  * tolerance gate — the ReservoirStream/SketchStream argument applied
  * to COUNT DISTINCT), and re-delivered rows fold in as no-ops, so the
  * panel is replay-tolerant for free. The state story is the point at
  * scale: streaming `dropDuplicates` + count holds every key seen
  * (state grows with distinct users; op 18 needs a watermark to evict),
  * while this panel's state is O(groups × 2^p) REGARDLESS of user
  * cardinality — the fixed-memory live cardinality a 100 TB ingest
  * dashboard actually runs. Batch twin: q15/q42's exact-vs-HLL gate;
  * DistinctStreamSpec pins staged-run ≡ batch, split-placement
  * invariance, duplicate-redelivery idempotence, and the 3·rsd error
  * envelope against the exact count.
  */
object DistinctStream {

  /** The live panel over a (streaming or batch) events frame: exactly
    * the aggregation shape of q15's distinct-cardinality profile, with
    * the HLL estimator in place of the exact distinct so the streaming
    * state is fixed-size. `rsd` is the HLL++ relative standard
    * deviation knob (register count = f(rsd), the q42 contract).
    */
  def distinctPanel(events: DataFrame, rsd: Double = 0.05): DataFrame =
    events.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("users_est"),
        count(lit(1)).as("n_events"))

  /** Drive synchronously over the staged landing zone (complete mode). */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "distinct_panel"): DataFrame =
    EventsStream.runToMemoryTable(spark,
      distinctPanel(EventsStream.stagedEventsStream(spark, dir,
        "graft-distinct-stream")),
      queryName, "complete")
}
