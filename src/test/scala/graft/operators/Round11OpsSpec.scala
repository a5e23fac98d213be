package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-11 operator batch: per-source KS drift (q243) and friends —
  * each checked on constructed fixtures where the exact statistic is
  * known in closed form, plus contract checks on the real testdata.
  */
class Round11OpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String, Long)]) =
    rows.toDF("doc_id", "source", "n_chars")

  test("q243: identical per-source distributions have KS = 0") {
    // two sources with the SAME length multiset — the ECDFs coincide
    // at every x, so the exact integer numerator must be 0 everywhere
    val docs = docsOf(Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 10L), (5L, "b", 20L), (6L, "b", 30L)))
    val out = TextAnalysisOps.ksDriftOn(docs).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) === 0L, s"nonzero ks_num for ${r.getString(0)}")
      assert(r.getDouble(3) === 0.0)
    }
  }

  test("q243: disjoint supports give KS = 1 exactly, located at the lower support's max") {
    // source a entirely below source b: F_a = 1, F_rest = 0 at x = 3
    val docs = docsOf(Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "a", 3L),
      (4L, "b", 11L), (5L, "b", 12L)))
    val out = TextAnalysisOps.ksDriftOn(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // a vs rest(b): n_s=3, n_rest=2, num = |3*2 - 0*3| = 6, ks = 1.0
    assert(out("a") === ((3L, 6L, 1.0, 3L)))
    // b vs rest(a): same statistic by symmetry, located where |diff|
    // first peaks (x = 3, the end of a's support — min-x tie-break)
    assert(out("b")._3 === 1.0)
    assert(out("b")._4 === 3L)
  }

  test("q243: a shifted source scores strictly higher than an identical one") {
    val base = (1L to 20L).map(i => (i, "ref", 100L + (i % 10)))
    val same = (21L to 40L).map(i => (i, "same", 100L + (i % 10)))
    val shifted = (41L to 60L).map(i => (i, "shift", 200L + (i % 10)))
    val out = TextAnalysisOps.ksDriftOn(docsOf(base ++ same ++ shifted))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("shift") > out("same"))
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("q243: testdata contract — one row per source, ks in (0, 1], argmax inside the domain") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = TextAnalysisOps.ksDrift(spark, sf0001).collect()
    val nSrc = docs.select(col("source")).distinct().count()
    assert(out.length === nSrc)
    val (lo, hi) = docs.agg(min(col("n_chars")), max(col("n_chars")))
      .as[(Long, Long)].head()
    out.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(4) >= lo && r.getLong(4) <= hi)
      // the reported ks IS the reported integer numerator divided once
      val n = out.map(_.getLong(1)).sum
      assert(r.getDouble(3) ===
        r.getLong(2).toDouble / (r.getLong(1).toDouble * (n - r.getLong(1)).toDouble))
    }
  }

  test("q244: both estimators are exact on a key-uniform many-to-many fixture") {
    // every key appears exactly 3x in a and 2x in b: System-R with
    // v_a = v_b = distinct keys gives n_a*n_b/v = 3*2*keys = actual,
    // globally AND per bucket — both methods must land err 0
    val keys = (0L until 40L)
    val a = keys.flatMap(k => Seq(k, k, k)).toDF("k")
    val b = keys.flatMap(k => Seq(k, k)).toDF("k")
    val out = CoreQueries.joinCardEstOn(a, b, nBuckets = 8).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("global") === ((240L, 240L, 0L, 0L)))
    assert(out("bucketed") === ((240L, 240L, 0L, 0L)))
  }

  test("q244: bucketing tightens the estimate when skew aligns with buckets") {
    // hot bucket: key 0 dominates side a; global System-R smears the
    // hot key's mass across all keys, the per-bucket estimate isolates
    // it — bucketed |err| must be <= global |err| here
    val a = (Seq.fill(100)(0L) ++ (1L until 20L)).toDF("k")
    val b = (Seq.fill(50)(0L) ++ (1L until 20L)).toDF("k")
    val out = CoreQueries.joinCardEstOn(a, b, nBuckets = 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(4)))).toMap
    val actual = 100L * 50L + 19L
    assert(out("global")._1 === actual && out("bucketed")._1 === actual)
    assert(out("bucketed")._2 <= out("global")._2,
      s"bucketed err ${out("bucketed")._2} worse than global ${out("global")._2}")
  }

  test("q244: testdata contract — 2 rows, estimates within 15% of ground truth") {
    val out = CoreQueries.q244JoinCardEst(spark, sf0001).collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getLong(2) > 0L)
      // sf0.001's 15-user event slice puts the global estimate ~12% off
      // (the uniformity assumption at its worst); the bound is a
      // sanity rail, not a precision claim
      assert(r.getLong(4) <= 1500L,
        s"${r.getString(0)} err ${r.getLong(4)}bp > 15%")
    }
  }

  test("q245: known purchase stream folds to the expected compressed history") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // user 1 bands: low(10) -> high(150) -> high(120) -> mid(30):
    // the two consecutive highs compress into one validity range
    val ev = Seq(
      (1L, t("2024-01-01 00:00:00"), 1L, "purchase", 10.0),
      (2L, t("2024-01-02 00:00:00"), 1L, "purchase", 150.0),
      (3L, t("2024-01-03 00:00:00"), 1L, "purchase", 120.0),
      (4L, t("2024-01-04 00:00:00"), 1L, "purchase", 30.0),
      (5L, t("2024-01-05 00:00:00"), 1L, "click", 999.0) // ignored
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.EventOps.scd2BandsOn(ev).collect()
      .map(r => (r.getInt(4), r.getString(1), r.isNullAt(3), r.getInt(5)))
    assert(out.toSeq === Seq(
      (1, "low", false, 0), (2, "high", false, 0), (3, "mid", true, 1)))
  }

  test("q245: testdata invariants — contiguous ranges, dense versions, one live row per user") {
    val out = graft.operators.EventOps.scd2Bands(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getInt(4))
      // versions dense from 1
      assert(sorted.map(_.getInt(4)).toSeq === (1 to rows.length))
      // exactly one open-ended current row, and it is the last version
      val current = sorted.filter(_.getInt(5) === 1)
      assert(current.length === 1, s"user $u has ${current.length} current rows")
      assert(current.head.getInt(4) === rows.length)
      // ranges chain: valid_to(i) == valid_from(i+1), never overlapping
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(!a.isNullAt(3) && a.getLong(3) === b.getLong(2),
            s"user $u history not contiguous at version ${a.getInt(4)}")
          // consecutive rows always change band (run-length compressed)
          assert(a.getString(1) != b.getString(1))
        case _ =>
      }
    }
  }

  private def embOf(rows: Seq[(Long, Array[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("q246: λ = 1 (lamX10 = 10) degenerates to the pure cosine top-k order") {
    val emb = embOf(Seq(
      0L -> Array(1f, 0f),
      1L -> Array(0.9f, 0.1f), 2L -> Array(0.8f, 0.3f),
      3L -> Array(0.5f, 0.7f), 4L -> Array(0.1f, 0.9f)))
    val mmr = SimilarityOps.mmrRerankOn(emb, 1, 4, 3, lamX10 = 10L)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    // with no diversity penalty the greedy picks ARE the top-k by qm
    assert(mmr.toSeq === Seq((1, 1L), (2, 2L), (3, 3L)))
  }

  test("q246: a near-duplicate of the first pick is demoted below a diverse candidate") {
    // c1 and c2 nearly identical (cos ~ 1), c3 well-separated but still
    // relevant: pure relevance ranks c1, c2; at λ=0.7 the duplicate's
    // 10000-grid penalty outweighs its relevance edge (hand-checked:
    // c2 scores 7·9477−3·10000 = 36339 < c3's 7·8000−3·5744 = 38768)
    val emb = embOf(Seq(
      0L -> Array(1f, 0f),
      1L -> Array(0.95f, 0.31f),
      2L -> Array(0.95f, 0.32f),
      3L -> Array(0.80f, -0.60f)))
    val mmr = SimilarityOps.mmrRerankOn(emb, 1, 3, 3, lamX10 = 7L)
      .collect().map(r => (r.getInt(2), r.getLong(1)))
    assert(mmr.toSeq === Seq((1, 1L), (2, 3L), (3, 2L)))
  }

  test("q246: testdata contract — k rows per query, ranks dense, no repeats, penalties grow") {
    val out = SimilarityOps.mmrRerank(spark, sf0001).collect()
    val k = SimilarityOps.MmrK
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size === SimilarityOps.MmrNQueries)
    byQ.foreach { case (q, rows) =>
      assert(rows.length === k)
      assert(rows.map(_.getInt(2)).sorted.toSeq === (1 to k))
      assert(rows.map(_.getLong(1)).distinct.length === k,
        s"query $q repeated a pick")
      // rank 1 has zero penalty; the reported score is the λ-fold
      rows.foreach { r =>
        if (r.getInt(2) === 1) assert(r.getLong(4) === 0L)
        assert(r.getLong(5) === 7L * r.getLong(3) - 3L * r.getLong(4))
      }
    }
  }

  test("q248: clicks pick up the band valid AT their timestamp, boundary inclusive") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1 history: low from 10:00, high from 12:00
      (1L, t("2024-01-01 10:00:00"), 1L, "purchase", 10.0),
      (2L, t("2024-01-01 12:00:00"), 1L, "purchase", 150.0),
      // clicks: before history -> none; AT a change -> the new band;
      // mid-range -> the open band at that instant
      (3L, t("2024-01-01 09:00:00"), 1L, "click", 0.0),
      (4L, t("2024-01-01 10:00:00"), 1L, "click", 0.0), // boundary: low
      (5L, t("2024-01-01 11:00:00"), 1L, "click", 0.0),
      (6L, t("2024-01-01 12:30:00"), 1L, "click", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.EventOps.pitBandMixOn(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "none" -> ((1L, 1L)), "low" -> ((2L, 1L)), "high" -> ((1L, 1L))))
  }

  test("q248: testdata contract — every click lands in exactly one band bucket") {
    val out = graft.operators.EventOps.pitBandMix(spark, sf0001).collect()
    val totalClicks = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(out.map(_.getLong(1)).sum === totalClicks)
    assert(out.map(_.getString(0)).toSet.subsetOf(
      Set("none", "low", "mid", "high")))
  }

  test("q249: IVM delta algebra agrees with ground truth for every user") {
    val out = graft.operators.IncrementalOps.ivmJoinDelta(spark, sf0001)
      .collect()
    assert(out.nonEmpty)
    // the self-audit flag holds everywhere, and maintained == recount
    out.foreach { r =>
      assert(r.getInt(5) === 1, s"user ${r.getLong(0)} inconsistent")
      assert(r.getLong(3) === r.getLong(4))
    }
    // independent ground truth: total pairs = clicks x purchases per user
    val ev = graft.Tables.events(spark, sf0001)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1) * r.getLong(2)).toMap
    out.foreach { r =>
      assert(r.getLong(3) === ev(r.getLong(0)),
        s"user ${r.getLong(0)} maintained view != direct recompute")
    }
    // the delta is genuinely nonempty on this fixture (the rule's cross
    // terms are exercised, not vacuously zero)
    assert(out.exists(_.getLong(2) > 0L))
  }

  test("q250: delete audit counts match direct semi-join recomputes") {
    val out = graft.dq.DataQuality.deleteAudit(spark, sf0001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set("orders", "events", "lineitem"))
    val del = graft.Tables.customer(spark, sf0001)
      .filter(round(col("c_acctbal") * 100, 0).cast("long") < 0L)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val orders = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey")).collect()
    val delOrders = orders.filter(r => del(r.getLong(1))).map(_.getLong(0)).toSet
    assert(out("orders")._2 === delOrders.size.toLong)
    val evRef = graft.Tables.events(spark, sf0001)
      .select(col("user_id")).collect().count(r => del(r.getLong(0)))
    assert(out("events")._2 === evRef.toLong)
    val liRef = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).collect().count(r => delOrders(r.getLong(0)))
    assert(out("lineitem")._2 === liRef.toLong)
    out.values.foreach { case (n, ref, bp) =>
      assert(bp === ref * 10000L / n)
    }
  }

  test("q251: attribution conserves the q28 pair count, keys are unordered") {
    val out = DedupOps.dupAttribution(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) <= r.getString(1)))
    val nPairs = DedupOps.ngramJaccardPairs(spark, sf0001).count()
    assert(out.map(_.getLong(2)).sum === nPairs)
  }

  test("q252: two-phase skyline equals the brute-force domination filter") {
    val out = TextAnalysisOps.qualitySkyline(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // brute force over the full (n_chars, quality_m) point set
    val pts = TextAnalysisOps.qualityScore(spark, sf0001)
      .select(col("doc_id"),
        round(col("quality") * 10000, 0).cast("long").as("qm"))
      .join(graft.Tables.documents(spark, sf0001)
        .select(col("doc_id"), col("n_chars")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(1)))
    def dominated(p: (Long, Long, Long)) = pts.exists(o =>
      o._2 >= p._2 && o._3 >= p._3 && (o._2 > p._2 || o._3 > p._3))
    val expect = pts.filterNot(dominated)
      .sortBy(p => (-p._2, p._1))
    assert(out.toSeq === expect.toSeq)
    // and no skyline member dominates another (mutual non-domination)
    out.foreach(p => assert(!out.exists(o => o != p &&
      o._2 >= p._2 && o._3 >= p._3 && (o._2 > p._2 || o._3 > p._3))))
  }

  test("q253: triplets pick the hardest same/different-label neighbors") {
    // anchor 0 (label 0): same-label 10 is closest overall -> separated;
    // anchor 1 (label 1): the diff-label 20 hugs it tighter than its
    // own positive 11 -> boundary violation, separated = 0
    val emb = Seq(
      (0L, Array(1f, 0f), 0),
      (1L, Array(0f, 1f), 1),
      (10L, Array(0.99f, 0.05f), 0),  // pos for 0, very close
      (11L, Array(0.30f, 0.95f), 1),  // pos for 1, mediocre
      (20L, Array(0.05f, 0.99f), 0)   // hard negative hugging anchor 1
    ).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.tripletMineOn(emb, nAnchors = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(4), r.getInt(7)))).toMap
    assert(out(0L)._1 === 10L)            // positive is the near twin
    assert(out(0L)._3 === 1)              // margin positive
    assert(out(1L) === ((11L, 20L, 0)))   // hard negative wins -> 0
  }

  test("q254: digit extraction is integer-exact and the panel is conservative") {
    val out = graft.dq.DataQuality.benfordScreen(spark, sf0001).collect()
    assert(out.length === 9)
    assert(out.map(_.getInt(0)).toSeq === (1 to 9))
    // shares cover the whole population (up to 9 units of div-floor loss)
    val shares = out.map(_.getLong(2)).sum
    assert(shares >= 10000L - 9 && shares <= 10000L)
    // spot-check one digit against a driver-side recount
    val prices = graft.Tables.orders(spark, sf0001)
      .select(col("o_totalprice")).collect()
      .map(r => math.round(r.getDouble(0) * 100))
      .filter(_ > 0)
    val ones = prices.count(_.toString.head == '1').toLong
    assert(out.find(_.getInt(0) === 1).get.getLong(1) === ones)
    // expectation column is the literal Benford table
    assert(out.map(_.getLong(3)).toSeq ===
      Seq(3010L, 1760L, 1250L, 970L, 790L, 670L, 580L, 510L, 460L))
  }

  test("q256: last-touch picks the right channel at every boundary") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // p1: click 1 min before -> 'click'
      (1L, t("2024-01-01 09:59:00"), 1L, "click", 0.0),
      (2L, t("2024-01-01 10:00:00"), 1L, "purchase", 10.0),
      // p2: only touch is outside the 6 h lookback -> 'direct'
      (3L, t("2024-01-02 01:00:00"), 2L, "view", 0.0),
      (4L, t("2024-01-02 08:00:00"), 2L, "purchase", 20.0),
      // p3: same-instant touch attributes; among the two ties the
      // higher event_id wins ('signup', id 6 > id 5)
      (5L, t("2024-01-03 12:00:00"), 3L, "view", 0.0),
      (6L, t("2024-01-03 12:00:00"), 3L, "signup", 0.0),
      (7L, t("2024-01-03 12:00:00"), 3L, "purchase", 30.0),
      // p4: touch at EXACTLY lookback edge (10:00 - 6h = 04:00) is
      // excluded (strict >) -> 'direct'
      (8L, t("2024-01-04 04:00:00"), 4L, "error", 0.0),
      (9L, t("2024-01-04 10:00:00"), 4L, "purchase", 40.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.EventOps.lastTouchOn(ev, 6).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "click" -> ((1L, 1000L)), "signup" -> ((1L, 3000L)),
      "direct" -> ((2L, 6000L))))
  }

  test("q257: z-score matches a driver-side recompute from the integer counts") {
    val out = graft.operators.EventOps.abTest(spark, sf0001).collect()
    assert(out.length === 2)
    val byArm = out.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (n0, c0) = (byArm(0L)._1, byArm(0L)._2)
    val (n1, c1) = (byArm(1L)._1, byArm(1L)._2)
    // rate is the exact integer division
    assert(byArm(0L)._3 === c0 * 10000L / n0)
    assert(byArm(1L)._3 === c1 * 10000L / n1)
    // z recomputed independently in driver doubles
    val pbar = (c0 + c1).toDouble / (n0 + n1).toDouble
    val z = (c1.toDouble / n1 - c0.toDouble / n0) /
      math.sqrt(pbar * (1.0 - pbar) * (1.0 / n0 + 1.0 / n1))
    assert(math.abs(byArm(0L)._4 - z) < 1e-6)
    assert(byArm(0L)._4 === byArm(1L)._4) // one scalar, both rows
    // arm assignment covers every user exactly once
    val nUsers = graft.Tables.events(spark, sf0001)
      .select(col("user_id")).distinct().count()
    assert(n0 + n1 === nUsers)
  }

  test("q258: U-shape credits are exact per position and conserve 1e6 per purchase") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // purchase with 5 touches: first 4e5, three middles 200000 div 3 =
    // 66666 each, last 4e5 + (200000 - 3*66666) = 400002
    val ev = Seq(
      (1L, t("2024-01-01 09:00:00"), 1L, "view"),
      (2L, t("2024-01-01 09:10:00"), 1L, "click"),
      (3L, t("2024-01-01 09:20:00"), 1L, "click"),
      (4L, t("2024-01-01 09:30:00"), 1L, "click"),
      (5L, t("2024-01-01 09:40:00"), 1L, "signup"),
      (6L, t("2024-01-01 10:00:00"), 1L, "purchase"),
      // two-touch purchase: 5e5 each
      (7L, t("2024-01-02 09:00:00"), 2L, "view"),
      (8L, t("2024-01-02 09:30:00"), 2L, "error"),
      (9L, t("2024-01-02 10:00:00"), 2L, "purchase"),
      // touchless purchase -> direct 1e6
      (10L, t("2024-01-03 10:00:00"), 3L, "purchase")
    ).map { case (id, ts, u, ty) => (id, ts, u, ty, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.EventOps.positionAttributionOn(ev, 6)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("view") === ((2L, 400000L + 500000L)))
    assert(out("signup") === ((1L, 400002L)))
    assert(out("click") === ((3L, 3L * 66666L)))
    assert(out("error") === ((1L, 500000L)))
    assert(out("direct") === ((1L, 1000000L)))
    assert(out.values.map(_._2).sum === 3L * 1000000L)
  }

  test("q258: testdata conservation — total credit = purchases x 1e6") {
    val out = graft.operators.EventOps.positionAttribution(spark, sf0001)
      .collect()
    val nP = graft.Tables.events(spark, sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(2)).sum === nP * 1000000L)
  }

  test("q259: the pairwise median shrugs off an outlier day that drags OLS") {
    import java.sql.Timestamp
    // days 0..6 with y = 10, 12, 14, 16, 18, 20, then a corrupted day
    // with y = 200: the true slope is 2/day; OLS gets pulled far above
    val counts = Seq(10, 12, 14, 16, 18, 20, 200)
    val ev = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map { i =>
        ((d * 1000 + i).toLong,
          Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
          1L, "click", 0.0)
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = graft.operators.EventOps.theilSenOn(ev).head()
    assert(r.getLong(0) === 7L)
    assert(r.getLong(1) === 21L)
    val ts = r.getDouble(2)
    val ols = r.getDouble(3)
    // robust estimate stays near the clean trend; OLS is dragged up
    assert(ts >= 2.0 && ts <= 4.0, s"theil-sen $ts")
    assert(ols > ts + 10.0, s"ols $ols should be far above $ts")
  }

  test("q260: perfect flags match an independent per-order recompute") {
    val out = CoreQueries.q260PerfectOrders(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.nonEmpty)
    // driver-side recompute of the all-or-nothing rule
    val orders = graft.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").cast("string")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val bad = scala.collection.mutable.Set[Long]()
    val withLines = scala.collection.mutable.Set[Long]()
    graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_shipdate").cast("date").cast("string")).collect()
      .foreach { r =>
        val ok = r.getLong(0)
        withLines += ok
        val late = java.time.LocalDate.parse(r.getString(2))
          .isAfter(java.time.LocalDate.parse(orders(ok)._2).plusDays(30))
        if (r.getString(1) == "R" || late) bad += ok
      }
    // line-less orders (the downsampled sf0.001 slice has some) have
    // nothing to fulfill — the KPI scopes to orders with >= 1 line,
    // exactly what the inner join expresses
    val expect = orders.toSeq.filter(o => withLines(o._1))
      .groupBy(_._2._1).map { case (p, os) =>
        p -> ((os.size.toLong, os.count(o => !bad(o._1)).toLong))
      }
    assert(out === expect)
  }

  test("q261: rank picks select the exact lower median and ceil-rank p90") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    // one day, 4 conversions with latencies 1h, 2h, 3h, 10h:
    // n=4 -> p50 rank (4+1) div 2 = 2 (2h), p90 rank (36+9) div 10 = 4 (10h)
    val ev = Seq(
      (1L, t("2024-01-01 08:00:00"), 1L, "view"),
      (2L, t("2024-01-01 09:00:00"), 1L, "purchase"),
      (3L, t("2024-01-01 08:00:00"), 2L, "view"),
      (4L, t("2024-01-01 10:00:00"), 2L, "purchase"),
      (5L, t("2024-01-01 08:00:00"), 3L, "view"),
      (6L, t("2024-01-01 11:00:00"), 3L, "purchase"),
      (7L, t("2024-01-01 01:00:00"), 4L, "view"),
      (8L, t("2024-01-01 11:00:00"), 4L, "purchase"),
      // a purchase with NO view inside 24h: excluded from the panel
      (9L, t("2024-01-02 11:00:00"), 5L, "purchase")
    ).map { case (id, ts, u, ty) => (id, ts, u, ty, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.operators.EventOps.conversionLatencyOn(ev, 24)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getString(0) === "2024-01-01")
    assert(r.getLong(1) === 4L)
    assert(r.getLong(2) === 2L * 3600L * 1000000L)
    assert(r.getLong(3) === 10L * 3600L * 1000000L)
  }

  test("q262: classes partition each brand, shares sum to ~100%, A leads") {
    val out = CoreQueries.q262AbcClasses(spark, sf0001).collect()
    assert(out.nonEmpty)
    val byBrand = out.groupBy(_.getString(0))
    byBrand.foreach { case (b, rows) =>
      val byClass = rows.map(r => r.getString(1) -> r).toMap
      // shares sum to 10000 bp up to per-class floor loss
      val shareSum = rows.map(_.getLong(3)).sum
      assert(shareSum >= 10000L - rows.length && shareSum <= 10000L,
        s"brand $b shares $shareSum")
      // A's share dominates every other class present
      byClass.get("A").foreach { a =>
        rows.filter(_.getString(1) != "A").foreach { o =>
          assert(a.getLong(3) >= o.getLong(3), s"brand $b: A not dominant")
        }
      }
      // A class holds at most ~80% + one part's worth of share
      byClass.get("A").foreach(a => assert(a.getLong(3) >= 5000L))
    }
    // part counts per brand match the brand's distinct traded parts
    val traded = graft.Tables.lineitem(spark, sf0001)
      .join(graft.Tables.part(spark, sf0001)
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byBrand.foreach { case (b, rows) =>
      assert(rows.map(_.getLong(2)).sum === traded(b))
    }
  }

  test("q253: testdata contract — one triplet per anchor, margin arithmetic exact") {
    val out = SimilarityOps.tripletMine(spark, sf0001).collect()
    assert(out.length === 8)
    out.foreach { r =>
      assert(r.getLong(6) === r.getLong(3) - r.getLong(5))
      assert(r.getInt(7) === (if (r.getLong(3) > r.getLong(5)) 1 else 0))
      assert(r.getLong(2) !== r.getLong(0))
      assert(r.getLong(4) !== r.getLong(0))
    }
  }
}
