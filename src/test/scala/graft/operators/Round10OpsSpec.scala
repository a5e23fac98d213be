package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-10 operator batch: the iterated BPE trainer (q225). */
class Round10OpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Corpus engineered so round 1 creates a multi-char symbol (`xe`)
    * whose TAIL (`e`) is the head of round 2's rule (`e`,`r`) while a
    * word holds `[xe, r]` — the exact shape where a naive single-space
    * string merge would match `e r` INSIDE the symbol boundary and
    * corrupt the vocabulary. Hand-computed true-BPE trace:
    *   round 1: (x,e) 13 = 10·"xe" + 3·"xer"   -> "xer" = [xe, r]
    *   round 2: (e,r) 6  = 6·"er" ONLY          -> "er" = [er]
    *   round 3: (xe,r) 3 = 3·"xer"
    * A boundary-buggy merge would instead turn "xer" into [x, er] at
    * round 2 and report (x, er) at round 3.
    */
  private def boundaryDocs =
    (Seq.fill(10)("xe") ++ Seq.fill(6)("er") ++ Seq.fill(3)("xer"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("bpeTrain: framed merge is true BPE — symbol boundaries respected") {
    val got = TextAnalysisOps.bpeTrainOn(boundaryDocs, rounds = 3)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1, "x", "e", 13L), (2, "e", "r", 6L), (3, "xe", "r", 3L)))
  }

  test("bpeTrain: consecutive occurrences of the pair all merge greedily") {
    // "erer" = [e,r,e,r] -> both (e,r) pairs merge in ONE round even
    // though they share a separator boundary in the framed string
    val docs = Seq.fill(5)("erer").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysisOps.bpeTrainOn(docs, rounds = 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (e,r) 10 (2 per word x5; ties (e,r)<(r,e) by s1)
    // round 2: both merged -> [er, er] -> (er, er) 5
    assert(got.toSeq === Seq((1, "e", "r", 10L), (2, "er", "er", 5L)))
  }

  test("bpeEncode: learned rules applied in order, hand-traced subword counts") {
    // the boundary fixture (see boundaryDocs): rules (x,e), (e,r), (xe,r)
    // encode "xe"->[xe] (1), "er"->[er] (1), "xer"->[xer] (1 — rule 3
    // merges the round-1 output [xe, r])
    val docs = boundaryDocs.withColumn("source", lit("fix"))
    val out = TextAnalysisOps.bpeEncodeOn(docs, rounds = 3).collect()
    assert(out.length === 1)
    val r = out.head
    // 19 words: 10 "xe" (2 chars) + 6 "er" (2) + 3 "xer" (3) = 41 chars
    assert(r.getLong(1) === 19L)
    assert(r.getLong(2) === 41L)
    // every word encodes to ONE subword under the three learned rules
    assert(r.getLong(3) === 19L)
    assert(r.getLong(4) === 41L * 1000L / 19L)
  }

  test("qualityKeepList: quality keeper disagrees with min-id somewhere, totals exact") {
    val mem = DedupOps.nearDupClusters(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(mem.nonEmpty)
    val q = TextAnalysisOps.qualityScore(spark, sf0001)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val byCluster = mem.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // maxBy (quality, -doc_id): highest quality, smallest id on ties —
    // exactly the operator's (quality DESC, doc_id) rank-1
    val upgrades = byCluster.values.count { ids =>
      ids.maxBy(id => (q(id), -id)) != ids.min }
    assert(upgrades > 0,
      "quality ranking never disagrees with min-id — the ranking is dead weight")
    val out = DedupOps.qualityKeepList(spark, sf0001).collect()
    val totalDropped = out.map(_.getLong(3)).sum
    assert(totalDropped === byCluster.values.map(_.length - 1).sum)
    // every doc accounted for exactly once
    val docs = graft.Tables.documents(spark, sf0001).count()
    assert(out.map(_.getLong(1)).sum === docs)
    out.foreach(r => assert(r.getLong(1) === r.getLong(2) + r.getLong(3)))
  }

  test("dailyAutocorr: linear ramp correlates 1.0 at every lag; constant guards 0.0") {
    def evAt(day: Int, k: Int) = (1 to k).map(i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")))
    // counts [1,2,3,4] over 4 days: every lag's aligned pair set is a
    // perfect linear relation -> r = 1.0 exactly
    val ramp = (1 to 4).flatMap(d => evAt(d, d)).toDF("user_id", "ts")
    val got = EventOps.dailyAutocorrOn(ramp, maxLag = 2).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1, 3L, 1.0), (2, 2L, 1.0)))
    // constant series: zero variance on both sides -> pinned 0.0
    val const = (1 to 4).flatMap(d => evAt(d, 3)).toDF("user_id", "ts")
    val g2 = EventOps.dailyAutocorrOn(const, maxLag = 1).collect()
    assert(g2.map(_.getDouble(2)).toSeq === Seq(0.0))
  }

  test("crossCorr: a 2-day-shifted mirror series peaks at exactly lag 2") {
    def rows(tpe: String, dayCounts: Seq[(Int, Int)]) =
      dayCounts.flatMap { case (d, k) => (1 to k).map(i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00"), tpe)) }
    // purchases replay the click counts shifted +2 days: the lag-2
    // alignment is an exact copy -> r = 1.0, and no other lag is
    val clicks = rows("click", Seq(1 -> 1, 2 -> 2, 3 -> 3, 4 -> 1, 5 -> 2, 6 -> 3))
    val purchases = rows("purchase", Seq(3 -> 1, 4 -> 2, 5 -> 3, 6 -> 1, 7 -> 2, 8 -> 3))
    val ev = (clicks ++ purchases).toDF("user_id", "ts", "event_type")
    val got = EventOps.crossCorrOn(ev, "click", "purchase", maxLag = 4)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(got(2) === 1.0, got.toString)
    got.filter(_._1 != 2).values.foreach(v => assert(v < 1.0, got.toString))
  }

  test("rrfFusion: fused ranking recomputes from the two input lists") {
    def recip(rk: Int): Long = if (rk == 0) 0L else 1000000L / (60L + rk)
    val sparse = RetrievalOps.bm25TopK(spark, sf0001, 5, 3, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val dense = SimilarityOps.bruteForceTopK(spark, sf0001, 5, 25).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    assert(sparse.nonEmpty && dense.nonEmpty)
    val expect = (sparse.keySet ++ dense.keySet).toSeq
      .map { case k @ (qid, hit) =>
        val (rs, rd) = (sparse.getOrElse(k, 0), dense.getOrElse(k, 0))
        (qid, hit, rs, rd, recip(rs) + recip(rd))
      }
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy { case (_, hit, _, _, e6) => (-e6, hit) }.take(10)
          .zipWithIndex.map { case ((q, h, rs, rd, e6), i) =>
            (q, h, rs, rd, e6, i + 1) }
      }.sortBy(t => (t._1, t._6))
    val got = RetrievalOps.rrfFusion(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(got === expect)
    // a doc on BOTH lists must outrank docs with one equal-rank hit:
    // at least one fused row carries two nonzero input ranks somewhere
    // (the fixture's lexical and dense neighborhoods overlap)
    assert(got.exists(t => t._3 > 0 && t._4 > 0), got.mkString(", "))
  }

  test("bpeTrain: overlapping self-pair merges left-to-right (aaa -> aa,a)") {
    val docs = Seq.fill(4)("aaa").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = TextAnalysisOps.bpeTrainOn(docs, rounds = 2)
      .collect().map(r =>
        (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) 8 (two overlapping pairs per word, both counted);
    // greedy apply -> [aa, a]; round 2: (aa, a) 4
    assert(got.toSeq === Seq((1, "a", "a", 8L), (2, "aa", "a", 4L)))
  }
}
