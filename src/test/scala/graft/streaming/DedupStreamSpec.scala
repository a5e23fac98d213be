package graft.streaming

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Streaming first-arrival dedup: group logic on constructed batches,
  * then the staged-file run gated against the batch q27 canonical rule.
  */
class DedupStreamSpec extends SparkSpecBase {

  test("group logic: first batch admits min doc_id, later batches reject") {
    val state = new TestGroupState[Long]
    // batch 1: doc ids 9 and 4 arrive together -> 4 is canonical
    val b1 = DedupStream.dedupGroup("fp1", Iterator(
      DedupStream.DocArrival(9, "fp1"), DedupStream.DocArrival(4, "fp1")),
      state).toSeq
    assert(b1.toSet === Set(
      DedupStream.DedupVerdict(4, "fp1", is_first = true, 4),
      DedupStream.DedupVerdict(9, "fp1", is_first = false, 4)))
    assert(state.updated.contains(4L))
    // batch 2: doc 2 arrives later — LOWER id, still a duplicate
    // (first-arrival semantics: the admitted canonical does not move)
    val b2 = DedupStream.dedupGroup("fp1", Iterator(
      DedupStream.DocArrival(2, "fp1")), state).toSeq
    assert(b2 === Seq(DedupStream.DedupVerdict(2, "fp1", is_first = false, 4)))
  }

  test("single-batch staged run ≡ batch q27 canonical rule") {
    val got = DedupStream.runOnce(spark, sf0001, "dedup_vs_batch")
    val verdicts = got.collect()
    val batch = graft.operators.DedupOps.exactDedup(spark, sf0001)
      .select(col("fp"), col("canonical_id"), col("n_copies")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    // every doc got exactly one verdict
    val nDocs = graft.Tables.documents(spark, sf0001).count()
    assert(verdicts.length.toLong === nDocs)
    // per fingerprint: one admitted doc, and it is the batch canonical
    val byFp = verdicts.groupBy(_.fp)
    assert(byFp.keySet === batch.keySet)
    byFp.foreach { case (fp, vs) =>
      val (canon, nCopies) = batch(fp)
      assert(vs.length.toLong === nCopies)
      assert(vs.count(_.is_first) === 1)
      assert(vs.filter(_.is_first).head.doc_id === canon)
      assert(vs.forall(_.canonical_id === canon))
    }
  }
}
