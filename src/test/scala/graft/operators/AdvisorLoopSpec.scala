package graft.operators

import graft.{SparkSpecBase, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Advisor-in-the-loop (VERDICT r15 item 4): q352's OUTPUT — the
  * DataFrame, not constants — parameterizes real dedup/ANN/skew runs,
  * and the results are gated. This closes stats → knobs → execution:
  * an advisor row drifting to a nonsense value now fails a recall or
  * equality gate, not just a formula-parity check.
  */
class AdvisorLoopSpec extends SparkSpecBase {

  /** The advised knobs, read from the q352 panel itself. */
  private lazy val knobs: Map[String, Long] =
    KnobAdvisor.knobAdvisor(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap

  /** Brute-force truth: all cosine >= threshold pairs (4dp, the
    * engine's own rounding) over the full 500-vector corpus.
    */
  private def truthPairs(threshold: Double): Set[(Long, Long)] = {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    emb.select(col("vec_id").as("id_a"), col("embedding").as("va"))
      .join(emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")),
        col("id_a") < col("id_b"))
      .filter(round(Vectors.cosine(col("va"), col("vb")), 4) >= threshold)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("lshNearDup at the advised nPlanes: recall >= the hardcoded-knob run, precision exact") {
    val threshold = 0.35
    val truth = truthPairs(threshold)
    assert(truth.nonEmpty)
    val emb = Tables.embeddings(spark, sf0001)
    def pairs(nPlanes: Int): Set[(Long, Long)] =
      SimilarityOps.lshNearDupDF(emb, threshold, nPlanes = nPlanes)
        .select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val advised = pairs(knobs("lsh_n_planes").toInt)
    val default = pairs(4) // the registry's hardcoded operating point
    // exact verify stage -> every emitted pair is true
    assert(advised.subsetOf(truth) && default.subsetOf(truth))
    val recallAdvised = advised.size.toDouble / truth.size
    val recallDefault = default.size.toDouble / truth.size
    assert(recallAdvised >= recallDefault,
      s"advised planes lost recall: $recallAdvised < $recallDefault")
    assert(recallAdvised >= 0.9,
      s"advised-knob LSH recall $recallAdvised below the multi-table floor")
  }

  test("semanticDedupSized at the advised ivf_k_lists: dup-pair coverage >= the label-codebook run") {
    val threshold = 0.35
    val truth = truthPairs(threshold)
    def dropped(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(col("kept") === 0).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
    // a truth pair is COVERED by a dedup run iff it can no longer
    // appear twice in the kept corpus — at least one endpoint dropped
    def coverage(drops: Set[Long]): Double =
      truth.count { case (a, b) => drops(a) || drops(b) }.toDouble / truth.size
    val advised = coverage(dropped(SimilarityOps.semanticDedupSized(
      spark, sf0001, knobs("ivf_k_lists").toInt, threshold)))
    val default = coverage(dropped(
      SimilarityOps.semanticDedup(spark, sf0001, threshold)))
    assert(advised >= default,
      s"advised k_lists lost dup coverage: $advised < $default")
  }

  test("saltedJoin at the advised skew_n_salts: result identical to the plain join") {
    val nSalts = knobs("skew_n_salts").toInt
    assert(nSalts >= 1 && nSalts <= 64)
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"))
    val dim = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_user_events"))
    val salted = SkewUtils.saltedJoin(ev, dim, "user_id", nSalts,
      uniqueCols = Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("n_user_events"))
    val plain = ev.join(dim, Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("n_user_events"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === ev.count())
  }
}
