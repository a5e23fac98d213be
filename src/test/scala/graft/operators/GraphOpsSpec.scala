package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Path graph 1–2–3: five users share items {1,2}, five share {2,3},
    * so both pairs clear minSupport=5. N=3, U/N=333333333, deg(2)=2.
    */
  private def pathGraphEvents = {
    val rows = (1 to 5).flatMap(u => Seq(
        (u.toLong, """{"k": 1}"""), (u.toLong, """{"k": 2}"""))) ++
      (6 to 10).flatMap(u => Seq(
        (u.toLong, """{"k": 2}"""), (u.toLong, """{"k": 3}""")))
    rows.toDF("user_id", "props")
  }

  test("pageRank: one iteration on the path graph, hand-computed cells") {
    // contrib to 2: 333333333/1 from each end -> 666666666;
    // contrib to 1 and 3: 333333333 div 2 = 166666666
    // r1(center) = (15*333333333) div 100 + (85*666666666) div 100
    //            = 49999999 + 566666666 = 616666665
    // r1(ends)   = 49999999 + (85*166666666) div 100 = 191666665
    val got = GraphOps.pageRankOn(pathGraphEvents, iters = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      (2, 616666665L), (1, 191666665L), (3, 191666665L)))
  }

  test("pageRank: fixed-point mass never exceeds the unit, determinism") {
    val r3 = GraphOps.pageRankOn(pathGraphEvents, iters = 3)
    val total = r3.agg(sum("rank_q")).head().getLong(0)
    // floor division only sheds mass — never creates it
    assert(total <= 1000000000L && total > 0L)
    // symmetric ends stay exactly tied at every depth
    val byItem = r3.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byItem(1) === byItem(3))
    assert(byItem(2) > byItem(1))
    // bit-identical across runs (integer math has no order sensitivity)
    val again = GraphOps.pageRankOn(pathGraphEvents, iters = 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(again.toSeq === r3.collect().map(r => (r.getInt(0), r.getLong(1))).toSeq)
  }

  test("pageRank: hot-user edge build is bounded by the item cap") {
    // a 50-item bot alone (minSupport=1) uncapped would induce
    // C(50,2)=1225 undirected pairs; at cap=4 the graph is K4 on the
    // bot's top items {1,2,3,4}: 6 pairs -> 12 directed edges, 4 nodes
    val rows = (1 to 50).map(i => (7L, s"""{"k": $i}"""))
    val ev = rows.toDF("user_id", "props")
    val out = GraphOps.pageRankOn(ev, iters = 1, minSupport = 1,
      userItemCap = 4).collect()
    assert(out.length === 4)
    assert(out.map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3, 4))
    // K4 is symmetric: all four ranks exactly tied
    assert(out.map(_.getLong(1)).distinct.length === 1)
  }

  test("pageRank: default cap is lossless on the path graph") {
    // per-user activity (2 items) is far below DefaultUserItemCap, so
    // capped output must equal the hand-computed uncapped cells
    val got = GraphOps.pageRankOn(pathGraphEvents, iters = 1).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq === Seq(
      (2, 616666665L), (1, 191666665L), (3, 191666665L)))
  }

  /** K4 minus edge (3,4): edges (1,2),(1,3),(2,3),(1,4),(2,4) — one
    * user per edge, minSupport=1. Triangles: (1,2,3) and (1,2,4).
    * Degrees: 1→3, 2→3, 3→2, 4→2.
    */
  private def diamondGraphEvents = {
    val edges = Seq((1, 2), (1, 3), (2, 3), (1, 4), (2, 4))
    edges.zipWithIndex.flatMap { case ((i, j), u) =>
      Seq((u.toLong, s"""{"k": $i}"""), (u.toLong, s"""{"k": $j}"""))
    }.toDF("user_id", "props")
  }

  test("triangles: degree-ordered counting matches hand enumeration") {
    val got = GraphOps.triangleCountOn(diamondGraphEvents, minSupport = 1)
      .as[(Int, Long, Long)].collect().toSeq
    // order: n_triangles DESC, item ASC
    assert(got === Seq((1, 3L, 2L), (2, 3L, 2L), (3, 2L, 1L), (4, 2L, 1L)))
  }

  test("triangles: triangle-free path graph reports all zeros") {
    val got = GraphOps.triangleCountOn(pathGraphEvents)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got === Seq((1, 1L, 0L), (2, 2L, 0L), (3, 1L, 0L)))
  }

  test("degree histogram: log2 bands on the diamond graph") {
    val got = GraphOps.degreeHistogramOn(diamondGraphEvents, minSupport = 1)
      .as[(Int, Long, Long, Long)].collect().toSeq
    // degrees 3,3,2,2 -> all in band 1 (bin(2)='10', bin(3)='11')
    assert(got === Seq((1, 4L, 2L, 3L)))
  }

  test("graph family shares ONE session-cached pair grid across all five ops") {
    // start from a clean registry so the delta is attributable
    DedupOps.clearSessionCaches(spark)
    val before = SessionCaches.entryCount(spark)
    assert(GraphOps.pageRank(spark, sf0001).count() > 0)
    // exactly two new registry entries: the (dir, minSupport, cap) pair
    // grid plus PageRank's degree-annotated edge relation layered on it
    val afterFirst = SessionCaches.entryCount(spark)
    assert(afterFirst === before + 2)
    // the other four operators (and a repeat) ride the SAME entry — the
    // round-9 audit measured five independent ~2 s edge rebuilds here
    assert(GraphOps.triangleCount(spark, sf0001).count() > 0)
    assert(GraphOps.degreeHistogram(spark, sf0001).count() > 0)
    assert(GraphOps.kCore(spark, sf0001).count() >= 0)
    assert(GraphOps.degreeAssortativity(spark, sf0001).count() === 1)
    assert(GraphOps.pageRank(spark, sf0001).count() > 0)
    assert(SessionCaches.entryCount(spark) === afterFirst)
    // eviction releases it; the family still works after (cache rebuilds)
    DedupOps.clearSessionCaches(spark)
    assert(SessionCaches.entryCount(spark) === 0)
    assert(GraphOps.degreeHistogram(spark, sf0001).count() > 0)
  }

  test("pageRank on the real events table: structural invariants") {
    val out = GraphOps.pageRank(spark, sf0001).cache()
    assert(out.count() > 0)
    assert(out.agg(sum("rank_q")).head().getLong(0) <= 1000000000L)
    assert(out.filter(col("rank_q") < 0).count() === 0)
    // descending by rank_q with (rank_q, item) as total order
    val ranks = out.collect().map(r => (r.getLong(1), r.getInt(0)))
    ranks.sliding(2).foreach {
      case Array((ra, ia), (rb, ib)) =>
        assert(ra > rb || (ra == rb && ia < ib))
      case _ => ()
    }
    out.unpersist()
  }
}
