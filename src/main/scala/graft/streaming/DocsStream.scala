package graft.streaming

import graft.operators.TextAnalysisOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus curation (the "filter documents as they land"
  * pipeline stage): a file-stream over a documents landing zone with the
  * row-local quality verdicts applied in-flight. Everything here is
  * STATELESS — per-row expressions only, no aggregation state, no
  * watermark needed — so the stream scales by adding executors and the
  * append-mode output is exactly the batch filter applied incrementally
  * (the spec gates stream ≡ batch on the same expressions). Corpus-level
  * signals that need global state (df caps, bloom membership, LM counts)
  * stay batch: the honest split for this architecture is row-local →
  * stream, corpus-relative → periodic batch over the landed files.
  */
object DocsStream {

  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The documents table as a staged file stream (shared landing-zone
    * staging: [[EventsStream.stageParquetStream]]).
    */
  def stagedDocumentsStream(spark: SparkSession, dir: String,
      prefix: String): DataFrame =
    EventsStream.stageParquetStream(spark, s"$dir/documents.parquet",
      prefix, documentsSchema)

  /** The row-local curation verdict shared by the stream and its batch
    * gate: quality score (single-row Column formulation — in a stream
    * each row is seen once, so the batch explode+agg reshape does not
    * apply) plus the word-count floor from the Gopher suite. Returns the
    * projected columns, not a filter, so the spec can compare verdicts
    * row-for-row including rejects.
    */
  def verdictCols(text: Column): Seq[Column] = Seq(
    round(TextAnalysisOps.qualityExpr(text), 4).as("quality"),
    size(graft.functions.Text.tokens(text)).as("n_words"))

  /** Streaming curation: every landed doc with its verdict and a `keep`
    * flag (quality ≥ minQuality AND n_words ≥ minWords). Append-mode
    * safe — returns the streaming frame, caller starts the sink.
    */
  def curationStream(spark: SparkSession, dir: String,
      minQuality: Double = 0.5, minWords: Int = 10): DataFrame =
    withVerdict(
      stagedDocumentsStream(spark, dir, "graft-docs-stream"),
      minQuality, minWords)

  /** The same transform applied to any documents frame — the spec's
    * batch side runs it over the identical input to pin stream ≡ batch.
    */
  def withVerdict(docs: DataFrame, minQuality: Double = 0.5,
      minWords: Int = 10): DataFrame =
    docs.select(
      (col("doc_id") +: col("lang") +: verdictCols(col("text"))): _*)
      .withColumn("keep",
        (col("quality") >= minQuality && col("n_words") >= minWords)
          .cast("int"))
}
