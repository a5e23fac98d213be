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

  test("q313 kappa: hand-computed 2x2 on a constructed frame") {
    import spark.implicits._
    // 4 docs engineered so the classifiers agree on 3 of 4:
    // mean chars = 25; corpus stopword rate = 4/12 = 1/3
    //   doc1: 40 chars, stop-rate 2/3  -> a=1 b=1
    //   doc2: 30 chars, stop-rate 0    -> a=1 b=0   (the disagreement)
    //   doc3: 20 chars, stop-rate 1/3  -> a=0 b=1   (ties count as >=)
    //   doc4: 10 chars, stop-rate 0    -> a=0 b=0
    val docs = Seq(
      (1L, "the of is", 40L), (2L, "xx yy zz", 30L),
      (3L, "the xx yy", 20L), (4L, "aa bb cc", 10L))
      .toDF("doc_id", "text", "n_chars")
    val r = TextAnalysisOps.cohensKappaOn(docs).collect()(0)
    // cells: n11=1 n10=1 n01=1 n00=1 -> po=500000;
    // pe = (2*2 + 2*2)*1e6 div 16 = 500000 -> kappa = 0
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((1L, 1L, 1L, 1L)))
    assert(r.getLong(5) === 500000L)
    assert(r.getLong(6) === 500000L)
    assert(r.getLong(7) === 0L)

    // degenerate corpus (ADVICE r13): identical docs put every row in
    // n11, so pe rounds to exactly 1e6 ppm — the guarded kappa reports
    // 0 instead of Spark-null-vs-DuckDB-error on the zero denominator
    val same = (1 to 4).map(i => (i.toLong, "the of is", 10L))
      .toDF("doc_id", "text", "n_chars")
    val rd = TextAnalysisOps.cohensKappaOn(same).collect()(0)
    assert(rd.getLong(6) === 1000000L)
    assert(rd.getLong(7) === 0L)
  }

  test("q314 rank sum: hand-computed U on a constructed frame (ties included)") {
    import spark.implicits._
    // en lengths {1, 3, 3}; zh lengths {2, 3}
    // pairs a>b: (3,2)x2 = 2; ties a=b: (3,3)x2 = 2 -> u2 = 2*2+2 = 6
    // auc = 6 / (2*3*2) = 0.5 -> 500000 ppm
    val docs = Seq((1L, "en", 1L), (2L, "en", 3L), (3L, "en", 3L),
      (4L, "zh", 2L), (5L, "zh", 3L), (6L, "de", 9L))
      .toDF("doc_id", "lang", "n_chars")
    val r = TextAnalysisOps.rankSumDriftOn(docs).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 6L, 500000L)))
  }

  test("q315 decay: binary-shift halving at exact half-life boundaries") {
    import spark.implicits._
    // anchor 2024-02-15; half-life 7 days: age 3 -> shift 0 (full),
    // age 7 -> shift 1 (half), age 21 -> shift 3 (1/8, floor)
    def ev(id: Long, day: String, v: Double) =
      (id, java.sql.Timestamp.valueOf(s"$day 12:00:00"), 1L, "view",
        v, """{"k": 5}""")
    val df = Seq(ev(1, "2024-02-12", 8.00), ev(2, "2024-02-08", 8.00),
      ev(3, "2024-01-25", 8.01))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = EventOps.decayedPopularityOn(df).collect()(0)
    // raw = 800+800+801 = 2401; decayed = 800 + 400 + (801>>3 = 100)
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) === ((5, 2401L, 1300L)))
    assert(r.getLong(3) === 1300L * 1000000L / 2401L)

    // totality guards (ADVICE r13): an event AFTER the anchor has
    // negative age — the clamp pins its shift to 0 (no decay) instead
    // of Java's masked shiftright silently diverging from DuckDB; a
    // negative value decays on its magnitude, truncating toward zero
    val df2 = Seq(ev(4, "2024-03-01", 8.00), ev(5, "2024-02-08", -0.03))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = EventOps.decayedPopularityOn(df2).collect()(0)
    // raw = 800 - 3 = 797; decayed = 800 (shift 0) + -(3>>1) = 800 - 1
    assert((r2.getLong(1), r2.getLong(2)) === ((797L, 799L)))
  }

  test("q317 delay panel: constructed repeat gaps land in the right delay cells") {
    import spark.implicits._
    def ev(id: Long, ts: String, u: Long, k: Int) =
      (id, java.sql.Timestamp.valueOf(ts), u, "view", 1.0, s"""{"k": $k}""")
    // user 1 key 5: gaps of 30min and 2d; user 2 key 5: gap of 6d;
    // user 2 key 6: single write (no repeat)
    val df = Seq(
      ev(1, "2024-01-01 10:00:00", 1, 5),
      ev(2, "2024-01-01 10:30:00", 1, 5),
      ev(3, "2024-01-03 10:30:00", 1, 5),
      ev(4, "2024-01-01 00:00:00", 2, 5),
      ev(5, "2024-01-07 00:00:00", 2, 5),
      ev(6, "2024-01-01 00:00:00", 2, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.dedupDelayPanelOn(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // 3 repeats total; within 1h: 1; within 1d: 1; within 3d: 2; 1w: 3
    assert(got(3600L) === ((3L, 1L, 333333L)))
    assert(got(86400L) === ((3L, 1L, 333333L)))
    assert(got(259200L) === ((3L, 2L, 666666L)))
    assert(got(604800L) === ((3L, 3L, 1000000L)))
  }

  test("q319 magnitude: log2 buckets are integer-exact at power-of-two boundaries") {
    import spark.implicits._
    def ev(id: Long, v: Double) =
      (id, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view",
        v, """{"k": 1}""")
    // cents: 1 -> bucket 0; 2,3 -> bucket 1; 4 -> bucket 2; 1024 -> 10;
    // -3 -> sgn -1, bucket 1 (magnitude bucketing, ADVICE r13)
    val df = Seq(ev(1, 0.01), ev(2, 0.02), ev(3, 0.03), ev(4, 0.04),
      ev(5, 10.24), ev(6, -0.03))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventOps.valueMagnitudeProfileOn(df).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got === Map((1, 0) -> ((1L, 1L)), (1, 1) -> ((2L, 5L)),
      (1, 2) -> ((1L, 4L)), (1, 10) -> ((1L, 1024L)),
      (-1, 1) -> ((1L, -3L))))
    // tot_c = 1031: mass shares truncate toward zero on both engines,
    // the negative bucket carries a negative share
    assert(EventOps.valueMagnitudeProfileOn(df).collect()
      .map(_.getLong(5)).toSet ===
      Set(1L * 1000000L / 1031L, 5L * 1000000L / 1031L,
        4L * 1000000L / 1031L, 1024L * 1000000L / 1031L,
        -3L * 1000000L / 1031L))
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
