package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming table fingerprint: q118's XOR snapshot checksum maintained
  * live as lineitem rows land — the continuously-verified-replica
  * primitive (compare a replica's group fingerprints to the source's
  * without ever sorting or re-scanning either side).
  *
  * Why XOR is the RIGHT fold to stream (the CMS argument, q90/q118):
  * group state is one 8-byte accumulator, and XOR is commutative,
  * associative and self-inverse, so stream ≡ batch holds EXACTLY under
  * any microbatch boundary placement — and a replayed row can even be
  * retracted by XOR-ing it again. The spec gates group-for-group
  * equality against the batch q118 fingerprint over the same landed
  * file.
  */
object FingerprintStream {

  val lineitemSchema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  /** The q118 row digest — shared by the stream and the batch operator so
    * the hashed payload cannot drift.
    */
  private def rowDigest = conv(substring(md5(concat_ws("|",
    col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
    col("l_linenumber"), col("l_shipdate").cast("date"))), 18, 15), 16, 10)
    .cast("long")

  /** Live per-group fingerprint over the staged lineitem landing zone
    * (complete output mode — tiny global state, one row per group).
    */
  def fingerprintStream(spark: SparkSession, dir: String): DataFrame =
    EventsStream.stageParquetStream(spark, s"$dir/lineitem.parquet",
        "graft-fp-stream", lineitemSchema)
      .select(col("l_returnflag"), rowDigest.as("fp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(fp)").as("fingerprint"))
}
