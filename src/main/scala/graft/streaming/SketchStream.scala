package graft.streaming

import graft.functions.{CountMinAggregator, Text}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming sketch maintenance: the Count-Min sketch (q90's
  * [[CountMinAggregator]]) as a stateful streaming aggregation over the
  * tokens of documents landing in the stream — the "keep corpus token
  * statistics live as data arrives" stage of an ingest pipeline, where
  * the batch rebuild would re-scan everything landed so far.
  *
  * Why CMS is the RIGHT sketch to stream: its state is a fixed `d × w`
  * cell grid of pure sums, so (a) the streaming state store holds a
  * constant-size buffer regardless of stream length, and (b) stream ≡
  * batch holds EXACTLY — not approximately — under any microbatch
  * boundary placement, because cell sums are order- and
  * partition-independent (the q90 determinism contract; Misra-Gries
  * state by contrast is merge-order-dependent, so a streaming MG could
  * only be envelope-gated). The spec gates cell-for-cell equality
  * against the batch sketch over the same landed files.
  */
object SketchStream {

  /** Token stream over the staged documents landing zone. */
  def tokenStream(spark: SparkSession, dir: String,
      prefix: String): DataFrame =
    DocsStream.stagedDocumentsStream(spark, dir, prefix)
      .select(explode(Text.tokens(col("text"))).as("tok"))

  /** The live sketch: one row `(cells, total)`, updated per microbatch
    * (complete/update output modes — global stateful aggregation).
    */
  def cmsStream(spark: SparkSession, dir: String, d: Int = 4,
      w: Int = 64): DataFrame = {
    import spark.implicits._
    tokenStream(spark, dir, "graft-cms-stream").as[String]
      .select(new CountMinAggregator(d, w).toColumn)
      .toDF("cells", "total") // case-class output flattens to 2 cols
  }

  /** The batch reference over any documents frame — the spec runs it on
    * the identical input to pin stream ≡ batch cell-for-cell.
    */
  def cmsBatch(docs: DataFrame, d: Int = 4, w: Int = 64): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(explode(Text.tokens(col("text"))).as("tok")).as[String]
      .select(new CountMinAggregator(d, w).toColumn)
      .toDF("cells", "total")
  }

  /** Watermarked per-day sparse CMS cells over an events frame's item
    * keys (`props.$.k`) — the live item-frequency sketch, one grid per
    * event-time day. Same md5 bucket rule as the q90 sketch
    * ([[graft.operators.TextAnalysisOps.cmsBucketAt]]), in the SPARSE
    * `(day, row, col, cnt)` representation: cell sums are pure
    * commutative counts, so the grid is microbatch-placement-exact,
    * and keying by the event-time window lets the state store EVICT
    * closed days once the watermark passes — bounded state where the
    * global [[cmsStream]] grid lives forever.
    *
    * Late-data contract: rows behind the watermark are DROPPED — an
    * evicted day's grid is immutable, so a straggler can never bump a
    * published cell. SketchStreamSpec feeds a late fixture and pins
    * both dispositions against the unwatermarked batch cells.
    */
  def cmsDailyCells(events: DataFrame, delay: String = "1 day",
      d: Int = 4, w: Int = 64): DataFrame = {
    import graft.operators.TextAnalysisOps
    val buckets = array((0 until d).map(i =>
      TextAnalysisOps.cmsBucketAt(i, w).cast("int")): _*)
    events
      .withWatermark("ts", delay)
      .select(col("ts"),
        get_json_object(col("props"), "$.k").as("tok"))
      .filter(col("tok").isNotNull)
      .select(window(col("ts"), "1 day").as("wnd"),
        posexplode(buckets).as(Seq("r", "c")))
      .groupBy(col("wnd"), col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("wnd.start").cast("date").as("day"), col("r"),
        col("c"), col("cnt"))
  }

  /** The unwatermarked batch reference for [[cmsDailyCells]] over the
    * identical rows — every row counts, however late it arrived.
    */
  def cmsDailyCellsBatch(events: DataFrame, d: Int = 4,
      w: Int = 64): DataFrame = {
    import graft.operators.TextAnalysisOps
    val buckets = array((0 until d).map(i =>
      TextAnalysisOps.cmsBucketAt(i, w).cast("int")): _*)
    events
      .select(col("ts"),
        get_json_object(col("props"), "$.k").as("tok"))
      .filter(col("tok").isNotNull)
      .select(to_date(col("ts")).as("day"),
        posexplode(buckets).as(Seq("r", "c")))
      .groupBy(col("day"), col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }
}
