package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-13 operator fixtures: single-parse JSON plan shape (VERDICT
  * r12 item 4) and related plan pins.
  */
class Round13OpsSpec extends SparkSpecBase {

  test("q310 plan parses props exactly once per row (filter+project double parse eliminated)") {
    val df = IncrementalOps.q310CdcCompaction(spark, sf0001)
    // executed plan: the real per-row cost — every get_json_object
    // occurrence is a full JSON parse of the props string
    val plan = df.queryExecution.executedPlan.toString
    val n = "get_json_object".r.findAllIn(plan).length
    assert(n === 1, s"expected exactly 1 JSON parse expression in the plan, found $n:\n$plan")
    // and the grid still covers exactly the item key space
    val nK = graft.Tables.events(spark, sf0001)
      .select(get_json_object(col("props"), "$.k").cast("int")).distinct().count()
    assert(df.count() === nK)
  }

  test("every other props consumer parses once per query plan (sweep pin)") {
    // the r12 sweep: a filter on the PARSED alias re-creates the double
    // parse no matter where it is written (Catalyst substitutes the
    // expression into the pushed predicate), so each consumer now
    // projects the one path once with no parsed-value row filter —
    // pinned here so the shape cannot silently regress
    val ev = graft.Tables.events(spark, sf0001)
    val frames = Map(
      "q47_json_extract" -> CoreQueries.q47JsonExtract(spark, sf0001),
      "item_adoption" -> EventOps.itemAdoption(spark, sf0001),
      "capped_user_items" -> EventOps.cappedUserItems(ev),
      "first_seen_batch" ->
        graft.streaming.ItemNoveltyStream.firstSeenBatch(ev))
    frames.foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      val n = "get_json_object".r.findAllIn(plan).length
      assert(n <= 1, s"$name: expected at most 1 JSON parse, found $n")
    }
  }

  test("q312 prune: single chars always survive, unused multi-char pieces drop, decode stays total") {
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, "the cat sat"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.unigramPruneOn(docs)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // coverage guarantee: every single-char candidate survives the prune
    val (cand1, kept1, _, _) = out(1)
    assert(cand1 === kept1, s"single chars pruned: $cand1 vs $kept1")
    // pruning actually happened: 2-char substrings (th, he, ca, ...) are
    // never PICKED by MaxMatch here (the full words win), so their
    // re-estimated mass is 0 ppm and they must drop
    val (cand2, kept2, picks2, _) = out(2)
    assert(cand2 > 0 && kept2 === 0L && picks2 === 0L,
      s"unused 2-char pieces survived: $out")
    // the 3-char words carry all the mass; decode remains total
    assert(out(3)._3 === 60L)
    assert(out.values.map(_._4).sum >= 999996L &&
      out.values.map(_._4).sum <= 1000000L,
      s"mass must telescope to 1e6 - rounding: $out")
  }
}
