package graft.operators

import graft.Tables
import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents`: language-ID (stopword
  * heuristic), quality scoring, token counting, fingerprinting. All
  * row-local expressions → embarrassingly parallel, no shuffle except the
  * final presentation ordering.
  */
object TextAnalysisOps {

  /** Tiny per-language lexica for the n-gram/stopword heuristic. */
  val lexica: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "es"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  private def langScore(toks: Column, lex: Seq[String]): Column =
    size(filter(toks, t => t.isin(lex.map(lit(_)): _*)))

  /** Language-ID: argmax of per-language stopword hits with a fixed
    * tiebreak order (en > es > fr > de > zh > und). Deterministic; falls
    * back to "und" when no lexicon matches.
    */
  def langIdExpr(text: Column): Column = {
    val toks = Text.tokens(text)
    val scores = Seq("en", "es", "fr", "de", "zh").map(l => (l, langScore(toks, lexica(l))))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, lit("und")): Column) {
      case (acc, (l, s)) => acc.when(s === best, lit(l))
    }.otherwise(lit("und"))
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), langIdExpr(col("text")).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang_pred"))

  /** Quality score in [0,1]: length band + stopword presence − punctuation
    * excess + token diversity. Computed in integer "decimillipoints" so no
    * floating-point rounding boundary exists (cross-engine hash-stable);
    * only the final /10000.0 touches doubles.
    */
  def qualityExpr(text: Column): Column = {
    val toks = Text.tokens(text)
    val nTok = size(toks)
    val lengthBand = when(nTok.between(20, 1000), lit(400))
      .when(nTok.between(5, 19), lit(200)).otherwise(lit(0))
    val stopBand = when(Text.stopwordRatio(text).between(0.01, 0.6), lit(300))
      .otherwise(lit(0))
    val punctPenalty = when(Text.punctRatio(text) > 0.2, lit(200)).otherwise(lit(0))
    // diversity in [0,3000]: floor(distinct*3000/n) — exact integer result
    val diversity = when(nTok > 0,
      floor(size(array_distinct(toks)).cast("double") * 3000.0 / nTok.cast("double"))
        .cast("long")).otherwise(lit(0L))
    val scoreInt = greatest(lit(0L),
      (lengthBand + stopBand - punctPenalty).cast("long") * 10 + diversity)
    (scoreInt.cast("double") / lit(10000.0)).as("quality")
  }

  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Text.tokenCount(col("text")).as("n_tokens"),
        qualityExpr(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Token counting: whitespace tokens + BPE-ish subword atoms per doc,
    * plus corpus totals per source.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        Text.tokenCount(col("text")).as("ws_tokens"),
        Text.bpeishTokenCount(col("text")).as("bpe_tokens"))
      .groupBy(col("source"))
      .agg(sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("source"))

  /** Top word-bigrams per language: n-gram frequency ranking (the
    * vocabulary-profiling pass of a corpus pipeline). Shingle-explode →
    * count per (lang, bigram) → window rank with total tie-break.
    */
  def topNgrams(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bigrams via posexplode + lead (whole-stage codegen) instead of the
    // per-row interpreted shingle transform; distinct-per-doc matches the
    // list_distinct semantics of wordShingles
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val counts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        posexplode(Text.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("next_tok", lead(col("tok"), 1).over(wDoc))
      .filter(col("next_tok").isNotNull)
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", col("tok"), col("next_tok")).as("bigram"))
      .dropDuplicates("doc_id", "bigram")
      .groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("lang"), col("bigram"), col("n"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Portable content fingerprints: md5 of canonical text. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.fingerprintMd5(col("text")).as("fp"))
      .orderBy(col("doc_id"))

  /** Rolling-hash fingerprint variant (order-sensitive, Spark-only). */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Text.rollingFingerprint(col("text")).as("rfp"))
      .orderBy(col("doc_id"))
}
