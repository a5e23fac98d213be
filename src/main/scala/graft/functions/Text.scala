package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the large-scale training-data pipeline operators
  * (dedup / text analysis). All pure Catalyst expressions — codegen'd,
  * no UDFs, so they stay inside whole-stage codegen at 100 TB.
  */
object Text {

  /** Canonical form: lowercase, trim, collapse runs of whitespace. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text.
    *
    * Tokenizer contract (load-bearing for q354's k-token suffix
    * windowing): the prefix-range contiguity proof assumes no token
    * CHARACTER sorts below space (0x20). This tokenizer only collapses
    * `\s+`, so control characters like `` can survive inside
    * tokens; on such a corpus the 1- vs 2-token partition keys may
    * order suffixes differently (different adjacency, hence different
    * q354 panels) — engine/oracle parity still holds because both
    * sides use the same key. Corpora with embedded control characters
    * should be span-scrubbed (q87-style) before suffix windowing; see
    * [[graft.operators.DedupOps.suffixLcpOn]].
    */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword-atom count: word pieces + digits + punctuation as
    * separate atoms (a cheap deterministic proxy for a real tokenizer).
    */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** Punctuation character ratio over all non-space characters. */
  def punctRatio(c: Column): Column = {
    val nonSpace = length(regexp_replace(c, "\\s", ""))
    val punct = length(regexp_replace(c, "[^!-/:-@\\[-`{-~]", ""))
    when(nonSpace > 0, punct.cast("double") / nonSpace.cast("double")).otherwise(lit(0.0))
  }

  /** Ratio of tokens that are English stopwords (tiny fixed list). */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "in", "and", "is", "it", "that")

  def stopwordRatio(c: Column): Column = {
    val toks = tokens(c)
    val stops = filter(toks, t => t.isin(stopwords.map(lit(_)): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Word n-gram shingles (distinct) of the normalized text. n >= 1.
    * Texts shorter than n tokens yield an empty array. Built on the
    * codegen [[tokenNgramsNative]] fused loop — the transform/slice/
    * concat_ws HOF formulation this replaces is CodegenFallback
    * (interpreted per token), and every shingle consumer (q28/q29/q30/
    * q53/q59/q61) pays it once per corpus token. `array_distinct` keeps
    * first-occurrence order, identical to the HOF form. NULL text maps
    * to an empty array (the pre-codegen contract; TokenNgrams is
    * null-propagating, so coalesce restores it — size()/explode
    * consumers over a corpus with null-text rows see 0/[], not null).
    */
  def wordShingles(c: Column, n: Int): Column =
    coalesce(array_distinct(tokenNgramsNative(tokens(c), n)),
      array().cast("array<string>"))

  /** Positional token n-grams (codegen'd): n-gram at index i covers
    * tokens [i, i+n) of the given token-array column; empty below n.
    * The fused-loop span builder behind the span-dedup family — see
    * [[graft.functions.expressions.TokenNgrams]] for why not a HOF.
    */
  def tokenNgramsNative(toksCol: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.TokenNgrams(
      ColumnBridge.expression(toksCol), n))
  }

  /** Token-array longest common prefix (codegen'd): leading positions
    * where both arrays carry equal non-null elements. The q354
    * suffix-LCP kernel — see [[graft.functions.expressions.TokenLcp]]
    * for why not the zip_with/array_position HOF form.
    */
  def tokenLcpNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.TokenLcp(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Content fingerprint: md5 of the canonical form — engine-portable
    * (identical in any md5 implementation), the exact-dedup key.
    */
  def fingerprintMd5(c: Column): Column = md5(normText(c))

  /** Rolling polynomial fingerprint over tokens (order-sensitive,
    * xxhash64-based). Spark-deterministic; not portable across engines —
    * used by the rows-only dedup path, never in an oracle query.
    */
  def rollingFingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))
}
