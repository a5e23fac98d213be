package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is a clearly-marked STUB (no media libs in this
  * container): a deterministic fake that consumes real bytes and emits a
  * fixed-width feature vector. Everything around it — binary schema,
  * metadata struct, batched mapPartitions shape, partitioning — is the
  * real Spark plumbing a production decode would drop into.
  */
object MultimodalOps {

  case class MediaRecord(doc_id: Long, media: Array[Byte], format: String,
      n_bytes: Long)
  case class MediaFeature(doc_id: Long, n_bytes: Long, checksum: Long,
      byte_sum: Long, feature: Array[Float])

  /** Synthesize a media table: documents' text bytes as the opaque binary
    * payload + a metadata struct — the schema a real ingest would produce.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      element_at(array(lit("png"), lit("wav"), lit("mp4")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: deterministic fake "feature extraction" over the raw
    * bytes. A real implementation would decode image/audio here; the
    * batching (fixed-size groups inside each partition, mirroring
    * mapInPandas/Arrow batch shape) and the typed output schema are real.
    */
  private def decodeStub(r: MediaRecord): MediaFeature = {
    val crc = new java.util.zip.CRC32
    crc.update(r.media)
    // unsigned byte sum: a full-content checksum the oracle can recompute
    // byte-by-byte (DuckDB: hex(encode(text)) parsed per pair), proving the
    // mapPartitions path consumed every byte of every row
    var byteSum = 0L
    var i = 0
    while (i < r.media.length) { byteSum += r.media(i) & 0xFF; i += 1 }
    val feature = Array.tabulate(8) { j =>
      if (r.media.length > j) (r.media(j % r.media.length) & 0xFF) / 255.0f
      else 0.0f
    }
    MediaFeature(r.doc_id, r.n_bytes, crc.getValue, byteSum, feature)
  }

  /** Batched partition-local feature extraction — no shuffle, batches of
    * `batchSize` rows inside each partition (the Arrow-batch shape).
    */
  def extractFeatures(spark: SparkSession, dir: String,
      batchSize: Int = 64): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRecord]
      .mapPartitions(_.grouped(batchSize).flatMap(_.map(decodeStub)))
  }

  /** Frame sampling plumbing: slice the binary payload into `n` equal
    * "frames" (byte ranges) — the access pattern of video frame-sampling,
    * as a pure expression.
    */
  def frameSample(spark: SparkSession, dir: String, n: Int = 4): DataFrame =
    mediaTable(spark, dir)
      .withColumn("frame_len", greatest((col("n_bytes") / n).cast("int"), lit(1)))
      .select(col("doc_id"), col("format"),
        posexplode(transform(sequence(lit(0), lit(n - 1)),
          i => substring(col("media"), (i * col("frame_len") + 1).cast("int"),
            col("frame_len").cast("int")))))
      .withColumnRenamed("pos", "frame_no")
      .select(col("doc_id"), col("format"), col("frame_no"),
        octet_length(col("col")).cast("long").as("frame_bytes"))
      .filter(col("frame_bytes") > 0)
      .orderBy(col("doc_id"), col("frame_no"))

  /** Oracle-checkable metadata projection of the media table. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("doc_id"), col("format"), col("n_bytes"))
      .orderBy(col("doc_id"))

  /** q40 gate: per-row outputs of the stub-decoded batches that DuckDB can
    * recompute from the raw bytes — row identity (doc_id), size (n_bytes),
    * a full-content unsigned-byte-sum checksum, and the first feature value
    * (first byte / 255). Gates the real plumbing (schema, batching, byte
    * access) around the clearly-stubbed decode.
    */
  def featureSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(spark, dir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("byte_sum"),
        round(col("feature")(0).cast("double"), 4).as("f0"))
      .orderBy(col("doc_id"))
  }

  /** Binary media dedup (q135): exact duplicate detection on the OPAQUE
    * payload — md5 of the raw bytes, grouped per format, reporting dup
    * clusters and the storage the duplicates waste. The multimodal twin
    * of q27: a crawl's image/audio dedup never looks inside the bytes,
    * so content-hash grouping is the whole operator and it works at any
    * payload size (the hash is computed streaming over the binary, the
    * bytes are never shuffled — only (hash, format, n_bytes) triples
    * move).
    */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("format"), md5(col("media")).as("fp"), col("n_bytes"))
      .groupBy(col("format"), col("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col("n_bytes")).as("n_bytes"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("n_distinct"),
        sum(col("n_copies")).as("n_total"),
        sum((col("n_copies") - 1) * col("n_bytes")).as("wasted_bytes"))
      .orderBy(col("format"))
}
