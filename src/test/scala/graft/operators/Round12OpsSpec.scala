package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Fixture gates for the round-12 breadth operators: unigram-LM
  * trainer/encoder (MaxMatch decode semantics), Dirichlet QLM ranking
  * behavior, CDC last-writer-wins compaction, and the
  * write-amplification invariants.
  */
class Round12OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("q307/q308: MaxMatch decode — longest candidate wins, cap+coverage hold") {
    // "abcde" ×6: every substring ≤4 has freq 6 ≥ minFreq, so MaxMatch
    // takes the longest prefix "abcd" then "e" (2 pieces — Viterbi
    // would tie, the greedy rule is the documented semantics);
    // "zq" ×1: below the freq floor, single-char coverage pieces only
    val docs = (Seq.fill(6)((1L, "abcde", "s1")) ++ Seq((2L, "zq", "s2")))
      .zipWithIndex.map { case ((_, t, s), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val em = TextAnalysisOps.unigramLmEmOn(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(em("abcd") === 6L && em("e") === 6L,
      s"MaxMatch should split abcde as [abcd, e]: $em")
    assert(em("z") === 1L && em("q") === 1L, s"coverage chars missing: $em")
    assert(!em.contains("abcde"),
      "5-char piece escaped the maxPieceLen=4 cap")
    val enc = TextAnalysisOps.unigramEncodeOn(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // s1: 6 words × (5 chars, 2 pieces) -> 30 chars / 12 subwords
    assert(enc.toSet === Set(("s1", 6L, 30L, 12L), ("s2", 1L, 2L, 2L)))
  }

  test("q309: Dirichlet QLM — tf monotone at equal dl, smoothing keeps partial matches") {
    // query doc 0's top-2 terms are (x, y); doc 1 and doc 2 share
    // dl = 4 but doc 1 carries x twice -> doc 1 must outrank doc 2;
    // doc 3 has NO query term yet doc 2 (x once) must outrank it if it
    // ever appeared — doc 3 holds no query term so it is not a
    // candidate at all (candidates need >= 1 term)
    val docs = Seq(
      (0L, "x x y"), (1L, "x x z z"), (2L, "x z z z"),
      (3L, "w w w w")).toDF("doc_id", "text")
    val hits = RetrievalOps.qlmTopKOn(docs, nQueries = 1, nTerms = 2, k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    val rankOf = hits.map { case (id, rk) => id -> rk }.toMap
    assert(rankOf(1L) < rankOf(2L),
      s"tf=2 doc must outrank tf=1 doc at equal dl: $hits")
    assert(!rankOf.contains(3L), s"termless doc became a candidate: $hits")
    // the query doc itself matches everything and ranks first
    assert(rankOf(0L) === 1)
  }

  test("q310: CDC compaction — last-writer-wins, tombstones, re-insert after delete") {
    def ev(id: Long, u: Long, k: Int, t: String, typ: String, v: Double) =
      (id, u, s"""{"k": $k}""", java.sql.Timestamp.valueOf(t), typ, v)
    val log = Seq(
      // user 1, k 5: upsert 1.00 -> upsert 2.00 -> delete  => tombstone
      ev(1, 1, 5, "2024-01-01 10:00:00", "click", 1.00),
      ev(2, 1, 5, "2024-01-01 10:01:00", "view", 2.00),
      ev(3, 1, 5, "2024-01-01 10:02:00", "error", 9.99),
      // user 1, k 6: two upserts => live at the later value
      ev(4, 1, 6, "2024-01-01 10:00:00", "click", 2.00),
      ev(5, 1, 6, "2024-01-01 10:03:00", "purchase", 3.00),
      // user 2, k 5: delete then RE-INSERT => live (order matters)
      ev(6, 2, 5, "2024-01-01 10:00:00", "error", 0.0),
      ev(7, 2, 5, "2024-01-01 10:04:00", "signup", 1.50),
      // user 3, k 7: same timestamp, event_id breaks the tie => live 4.00
      ev(8, 3, 7, "2024-01-01 10:05:00", "error", 0.0),
      ev(9, 3, 7, "2024-01-01 10:05:00", "click", 4.00))
      .toDF("event_id", "user_id", "props", "ts", "event_type", "value")
    val got = IncrementalOps.cdcCompactionOn(log).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(5) === ((2L, 1L, 1L, 150L)),  // u1 tombstoned, u2 live 1.50
      s"k=5: $got")
    assert(got(6) === ((1L, 1L, 0L, 300L)), s"k=6: $got")
    assert(got(7) === ((1L, 1L, 0L, 400L)),
      s"k=7 same-ts tie must fall to the larger event_id: $got")
  }

  test("q311: write-amplification invariants at sf0.001") {
    val rows = IncrementalOps
      .q311WriteAmplification(spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (fullN, fullBp) = rows("full_rewrite")
    val (scopedN, scopedBp) = rows("merge_partition_scoped")
    val (scd2N, scd2Bp) = rows("scd2_append")
    assert(fullBp === 10000L)
    assert(scopedN < fullN && scopedBp < 10000L,
      "partition-scoped merge must rewrite strictly less than the table")
    assert(scd2N < scopedN && scd2Bp < scopedBp,
      "SCD2 append is delta-sized — below even the scoped merge")
    assert(scd2N > 0L)
  }
}
