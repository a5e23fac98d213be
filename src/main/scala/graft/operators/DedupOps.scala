package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, over the
  * `documents` table. Four families: exact (hash-groupBy), MinHash+LSH,
  * SimHash, and n-gram Jaccard. Scale stance: every near-dup variant is
  * candidate-generation-by-bucketing (shuffle on bucket keys, partial aggs)
  * followed by exact verification on the candidate pairs only — never an
  * all-pairs cartesian.
  */
object DedupOps {

  /** Exact dedup: group by content fingerprint, keep the lowest doc_id as
    * canonical. One shuffle on a 128-bit key; at 100 TB the md5 groupBy is
    * the standard exact-dedup plan (map-side partial agg collapses
    * duplicates before the exchange).
    */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(Text.fingerprintMd5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  /** MinHash signature: k permutation-min values over 3-gram shingle
    * hashes, computed per-row with higher-order functions (no explode —
    * the signature never leaves the row until banding).
    */
  private val MinhashPerms = 32
  private val Bands = 8 // 8 bands × 4 rows
  private val RowsPerBand = MinhashPerms / Bands
  private val MersennePrime = 2305843009213693951L // 2^61 - 1

  private def minhashSignature(text: Column): Column = {
    val shingles = Text.wordShingles(text, 3)
    transform(sequence(lit(0), lit(MinhashPerms - 1)), p => {
      val a = pmod(xxhash64(concat(lit("mh-a"), p)), lit(MersennePrime - 1)) + 1
      val b = pmod(xxhash64(concat(lit("mh-b"), p)), lit(MersennePrime))
      array_min(transform(shingles,
        s => pmod(a * pmod(xxhash64(s), lit(MersennePrime)) + b, lit(MersennePrime))))
    })
  }

  /** MinHash + LSH near-dup pairs: shingle → minhash → band buckets →
    * bucket self-join for candidates → exact Jaccard verify ≥ threshold.
    * Shuffles only on (band, bucket-hash); candidate verification re-derives
    * shingle sets on the (tiny) candidate side.
    */
  def minhashNearDup(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("sig", minhashSignature(col("text")))
    val banded = docs.select(
      col("doc_id"),
      explode(transform(sequence(lit(0), lit(Bands - 1)),
        b => struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand)))).as("bucket"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"), Text.wordShingles(col("text"), 3).as("sh"))
    candidates
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** 64-bit SimHash of the token multiset: per bit position, sum +1/-1
    * votes from each token's hash, take the sign. Near-dups = small
    * hamming distance; candidates via the standard 4×16-bit chunk trick
    * (pairs within hamming ≤ 3 must share at least one exact chunk).
    */
  def simhash(text: Column): Column = {
    val toks = Text.tokens(text)
    val counts = aggregate(toks,
      array_repeat(lit(0), 64),
      (acc, t) => zip_with(acc, sequence(lit(0), lit(63)),
        (c, i) => c + when(call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L)) === 1, 1).otherwise(-1)))
    aggregate(zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  def simhashNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(col("text")).as("sh"))
    val chunks = docs.select(col("doc_id"), col("sh"), explode(array(
      (0 to 3).map(i => struct(lit(i).as("chunk_no"),
        shiftright(col("sh"), 16 * i).bitwiseAND(lit(0xFFFFL)).as("chunk"))): _*)).as("c"))
      .select(col("doc_id"), col("sh"), col("c.chunk_no"), col("c.chunk"))
    val l = chunks.alias("l")
    val r = chunks.alias("r")
    l.join(r, col("l.chunk_no") === col("r.chunk_no") &&
        col("l.chunk") === col("r.chunk") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact word-set Jaccard over a deterministic sample of documents —
    * the oracle-checkable near-dup variant (token-explode + equi-join +
    * group, no cartesian: pairs only materialize when they share a token).
    */
  def wordJaccardPairs(spark: SparkSession, dir: String,
      threshold: Double = 0.6): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"),
        array_distinct(Text.tokens(col("text"))).as("toks"))
    val toks = docs.select(col("doc_id"), size(col("toks")).as("n"),
      explode(col("toks")).as("tok"))
    val l = toks.alias("l")
    val r = toks.alias("r")
    l.join(r, col("l.tok") === col("r.tok") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"),
        col("l.n").as("n_a"), col("r.n").as("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }
}
