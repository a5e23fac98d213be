package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the 11th streaming operator
  * and the one major Structured Streaming surface the other ten don't
  * cover (windowed aggs, session windows, global stateful sketches,
  * dedup, exactly-once sink). Two keyed streams — clicks and purchases,
  * both carved from the staged events landing zone — joined on user
  * with the click required to land inside `(purchase − span, purchase]`
  * exclusive-of-purchase: the q49/q106 attribution shape made LIVE,
  * emitting every (purchase, prior-click) pair as soon as both sides
  * have arrived (multi-touch attribution; q106's batch last-touch is
  * the `min latency` rollup of this stream).
  *
  * Stream ≡ batch holds EXACTLY for the inner interval join: the
  * output pair set is a pure function of the two input row sets and
  * the deterministic predicate — microbatch placement can only affect
  * WHEN a pair is emitted, never whether (no aggregation, no
  * ordering). The spec gates the streamed pairs row-for-row against
  * [[intervalJoined]] over the identical landed file, and pins both
  * late-data dispositions through MemoryStream (the BurstStream
  * protocol): a click later than its purchase's microbatch still joins
  * retroactively while inside the watermark delay, and a click behind
  * BOTH watermarks is dropped — its purchase's state row was already
  * evicted, so the pair can never appear.
  *
  * State bound (the production contract): with watermarks on BOTH
  * event times and the range predicate bounding click time against
  * purchase time, Spark evicts each side's state once the opposite
  * watermark clears it — purchases are held ~`delay` past their event
  * time, clicks ~`delay + span` (a click can still match a purchase up
  * to `span` newer). Steady-state store size ≈ arrival_rate ×
  * (delay + span) rows per side, independent of stream lifetime;
  * without the range condition the join would hold BOTH streams
  * forever, which is exactly the unbounded-state failure the watermark
  * pair exists to prevent.
  */
object IntervalJoinStream {

  /** One event-type side of the join, with prefixed column names so the
    * self-join's two sides never collide (`c_user/c_ts/c_id` vs
    * `p_user/p_ts/p_id`).
    */
  private[streaming] def typedSide(events: DataFrame, tpe: String,
      prefix: String): DataFrame =
    events.filter(col("event_type") === tpe)
      .select(col("user_id").as(s"${prefix}_user"),
        col("ts").as(s"${prefix}_ts"),
        col("event_id").as(s"${prefix}_id"))

  /** The interval-join expression tree over any (clicks, purchases)
    * pair — streaming or batch — so the gate's two sides cannot drift:
    * same-user pairs with `p_ts − span ≤ c_ts < p_ts`. Latency is an
    * exact integer µs difference (no FP anywhere).
    */
  def intervalJoined(clicks: DataFrame, purchases: DataFrame,
      span: String = "6 hours", joinType: String = "inner"): DataFrame =
    purchases.join(clicks,
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $span") &&
          col("c_ts") < col("p_ts"), joinType)
      .select(col("p_id").as("purchase_id"), col("p_user").as("user_id"),
        col("c_id").as("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts")))
          .as("latency_us"))

  /** The two watermarked sides over an events frame (one staged source,
    * two filtered branches — a stream-stream SELF join), joined live.
    *
    * Each side carries its OWN watermark, and each advances only on
    * its own event type's traffic: even a single watermark applied
    * before the split ends up per-branch, because Catalyst pushes the
    * type filter below the watermark node when the self-join
    * instantiates the shared prefix twice (measured: a 20:00 `view`
    * row advanced neither side). The query's effective watermark is
    * the MIN of the two sides (Spark's multi-watermark policy), so
    * state eviction needs both event types flowing — which a real
    * click/purchase stream always has; a one-sided lull lawfully
    * HOLDS eviction rather than dropping joinable pairs. The spec's
    * drop gate therefore advances both sides explicitly.
    */
  def attributionJoin(events: DataFrame, delay: String = "1 hour",
      span: String = "6 hours"): DataFrame =
    intervalJoined(
      typedSide(events, "click", "c").withWatermark("c_ts", delay),
      typedSide(events, "purchase", "p").withWatermark("p_ts", delay),
      span)

  /** LEFT OUTER variant: purchases with NO prior click also emit, with
    * null click/latency — q106's batch contract ("null attribution
    * kept — dropping click-less purchases would overstate attributed
    * revenue") carried to the stream. The null row for a purchase can
    * only emit once the CLICK watermark passes its event time (no
    * earlier click can still arrive), so unmatched purchases surface
    * with ~`delay` lag — the price of outer correctness; matched pairs
    * still emit as soon as both sides arrive, exactly as the inner
    * join. Same state bound as [[attributionJoin]].
    */
  def attributionJoinLeft(events: DataFrame, delay: String = "1 hour",
      span: String = "6 hours"): DataFrame =
    intervalJoined(
      typedSide(events, "click", "c").withWatermark("c_ts", delay),
      typedSide(events, "purchase", "p").withWatermark("p_ts", delay),
      span, "left_outer")

  /** Live attribution pairs over the staged events landing zone. */
  def attributionStream(spark: SparkSession, dir: String,
      delay: String = "1 hour", span: String = "6 hours"): DataFrame =
    attributionJoin(
      EventsStream.stagedEventsStream(spark, dir, "graft-interval-join"),
      delay, span)

  /** Drive synchronously over the staged file (append — the only output
    * mode a stream-stream inner join admits).
    */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String = "attribution_pairs"): DataFrame =
    EventsStream.runToMemoryTable(spark, attributionStream(spark, dir),
      queryName, "append")

  /** q233: the BATCH twin of the live join, oracle-gated — the same
    * [[intervalJoined]] expression tree over the batch events table,
    * so the streaming operator's semantics are pinned by the DuckDB
    * hash gate (through this query) AND by the stream ≡ batch spec
    * (through the staged-file run): the two could only diverge if the
    * shared tree itself changed. (purchase_id, click_id) is a total
    * order.
    */
  def q233IntervalPairs(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    intervalJoined(typedSide(ev, "click", "c"),
        typedSide(ev, "purchase", "p"))
      .orderBy(col("purchase_id"), col("click_id"))
  }
}
