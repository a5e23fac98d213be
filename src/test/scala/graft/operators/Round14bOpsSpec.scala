package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-14b fixture specs: hand-checkable cases for the session's new
  * operators beyond their oracle gates.
  */
class Round14bOpsSpec extends SparkSpecBase {

  test("q332 HITS: planted bipartite star ranks the shared part first and normalizes each side to 1e6") {
    import spark.implicits._
    // customers 1..3 all buy part 10; c1 also buys 11, c2 also buys 12
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L), (3L, 10L))
      .toDF("cust", "part")
    val out = GraphOps.hitsOn(edges, rounds = 3, topK = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val auth = out.filter(_._1 == "auth").sortBy(_._4)
    val hub = out.filter(_._1 == "hub").sortBy(_._4)
    // the shared part dominates authority at exactly the ppm unit
    assert(auth.head._2 === 10L && auth.head._3 === 1000000L)
    // each side's max normalizes to exactly 1e6
    assert(hub.head._3 === 1000000L)
    // the two two-part customers out-hub the one-part customer, tie
    // broken by id — c1 before c2 before c3
    assert(hub.map(_._2).toSeq === Seq(1L, 2L, 3L))
    assert(hub(0)._3 === hub(1)._3 && hub(2)._3 < hub(1)._3)
    // pure function of the input: a second build agrees cell-exactly
    val again = GraphOps.hitsOn(edges, rounds = 3, topK = 15)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === again.toSeq)
  }

  test("q333 Bradley-Terry: a planted dominance chain orders strengths A > B > C > D, never-wins floors to 0") {
    import spark.implicits._
    // one lang, 4 sources x 3 ranks; lengths arranged so at every rank
    // srcA > srcB > srcC > srcD — a strict dominance chain (D never
    // wins a duel)
    val docs = (for {
      (src, base) <- Seq(("srcA", 400L), ("srcB", 300L),
        ("srcC", 200L), ("srcD", 100L))
      r <- 0 until 3
    } yield (base * 10 + r, "x", "en", src, base - r))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = PipelineOps.bradleyTerryOn(docs, rounds = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq("srcA", "srcB", "srcC", "srcD"))
    // strengths strictly decrease down the chain; the winner holds the
    // ppm normalization cap and the never-wins source floors to 0
    assert(out.head._4 === 1000000L && out.last._4 === 0L)
    assert(out.map(_._4).toSeq === out.map(_._4).toSeq.sorted.reverse)
    assert(out.sliding(2).forall(p => p(0)._4 > p(1)._4))
    // every source dueled every other at all 3 ranks (each unordered
    // duel counts once in its own row of the ordered matrix)
    assert(out.forall(_._2 === 9L))
    // A wins all 9 of its duels; D wins none
    assert(out.head._3 === 9L && out.last._3 === 0L)
  }

  test("q334 greedy coverage: marginal gains beat raw size and the coverage curve is cumulative") {
    import spark.implicits._
    // doc 1 covers {1..10}; doc 2 covers {1..8, 100, 101} (10 shingles
    // but only 2 NEW after doc 1); doc 3 covers {200..205} (6 disjoint).
    // Greedy must pick 1 (gain 10), then 3 (gain 6 > doc 2's marginal
    // 2), then 2 (gain 2) — pure size order would pick 2 second.
    val post = ((1L to 10L).map(t => (1L, t)) ++
      ((1L to 8L) ++ Seq(100L, 101L)).map(t => (2L, t)) ++
      (200L to 205L).map(t => (3L, t))).toDF("doc_id", "tok")
    val out = DedupOps.greedyCoverageOn(post, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq((1, 1L, 10L, 10L), (2, 3L, 6L, 16L),
      (3, 2L, 2L, 18L)))
    // exhausting the corpus: a 4th round has no candidate left and the
    // trace stays at 3 rows on both engines
    val out4 = DedupOps.greedyCoverageOn(post, k = 4).collect()
    assert(out4.length === 3)
  }

  test("q335 DBSCAN: planted angular geometry yields two clusters, one border, one noise point") {
    import spark.implicits._
    // unit vectors in the xy-plane at chosen angles; threshold 0.5
    // (60 deg). Cluster A at 0/10/20 deg (ids 1-3), cluster B at
    // 120/130/140 deg (ids 4-6), border id 10 at -55 deg (within 60 of
    // A's 0-deg member ONLY -> |N_eps| = 2 incl. itself < minPts 3,
    // one core neighbor), noise id 20 at -120 deg (no neighbor at all).
    // minPts counts the point ITSELF (textbook/sklearn convention).
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0.0f, 0.0f)
    }
    val emb = Seq(
      (1L, v(0)), (2L, v(10)), (3L, v(20)),
      (4L, v(120)), (5L, v(130)), (6L, v(140)),
      (10L, v(-55)), (20L, v(-120))).toDF("vec_id", "embedding")
    val out = SimilarityOps
      .dbscanOn(emb, threshold = 0.5, minPts = 3, nPlanes = 3,
        nTables = 96)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq === Seq(
      (-1L, 0L, 0L, 1L),   // the -120 deg point is noise
      (1L, 3L, 1L, 4L),    // cluster A: 3 cores + the -55 deg border
      (4L, 3L, 0L, 3L)))   // cluster B: 3 cores
  }

  test("q336 PPR: mass stays in the seed's component and orders by proximity") {
    import spark.implicits._
    // hub 1 touches 2..5; chain 5-6; disconnected pair 10-11. With
    // nSeeds = 1 the seed is the hub (degree 4) and teleport mass
    // exists ONLY there.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (5L, 6L),
      (10L, 11L)).toDF("i", "j")
    val sym = pairs.select(col("i").as("src"), col("j").as("dst"))
      .unionByName(pairs.select(col("j").as("src"), col("i").as("dst")))
    val edgesD = sym.withColumn("d", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
    val out = GraphOps.pprOnEdges(edgesD, iters = 3, nSeeds = 1,
        topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // seed first with the dominant rank; its direct neighbors next
    assert(out.head._1 === 1L && out.head._2 === 1)
    val rank = out.map(t => t._1 -> t._3).toMap
    assert(rank(2L) === rank(3L) && rank(3L) === rank(4L))
    // the two-hop leaf trails its one-hop parent but is reached
    // (6 gets 5's shed mass a round late)
    assert(rank(6L) < rank(5L) && rank(6L) > 0L)
    // the disconnected component never receives a single unit
    assert(rank(10L) === 0L && rank(11L) === 0L)
    // only the seed carries the flag
    assert(out.count(_._2 == 1) === 1)
  }

  test("q337 sketch overlap: planted token sets report exact overlaps and the sketch path stays in bound") {
    import spark.implicits._
    // A = {t1..t10}, B = {t6..t15} (overlap 5), C = {u1..u5} (disjoint)
    val st = ((1 to 10).map(i => ("srcA", s"t$i")) ++
      (6 to 15).map(i => ("srcB", s"t$i")) ++
      (1 to 5).map(i => ("srcC", s"u$i"))).toDF("source", "tok")
    val out = DedupOps.sketchOverlapOn(st)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6)))
    assert(out.map(t => (t._1, t._2)).toSeq ===
      Seq(("srcA", "srcB"), ("srcA", "srcC"), ("srcB", "srcC")))
    val ab = out(0)
    // exact overlap 5 of 15 union -> Jaccard 333333 ppm
    assert(ab._3 === 10L && ab._4 === 10L && ab._5 === 5L &&
      ab._6 === 333333L)
    // zero-overlap pairs still appear, at exactly 0
    assert(out(1)._5 === 0L && out(1)._6 === 0L)
    // at these cardinalities the HLL path is exact -> every gate green
    assert(out.forall(_._7 === 1))
  }

  test("q338 bootstrap: constant data collapses the CI to the mean; CI is ordered and deterministic") {
    import spark.implicits._
    // srcK: constant length 100 -> every live replica mean is exactly
    // 100000 milli, so lo = hi = mean. srcV: two distinct lengths.
    val docs = ((1L to 12L).map(i => (i, "en", "srcK", 100L)) ++
      (101L to 112L).map(i =>
        (i, "en", "srcV", if (i % 2 == 0) 50L else 150L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = PipelineOps.bootstrapCiOn(docs, replicas = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val k = out.find(_._1 == "srcK").get
    assert(k._2 === 12L && k._3 === 100000L &&
      k._5 === 100000L && k._6 === 100000L)
    val v = out.find(_._1 == "srcV").get
    // ordered CI straddling the point estimate's neighborhood, every
    // replica live at this corpus size
    assert(v._5 <= v._3 && v._3 <= v._6 && v._5 < v._6)
    assert(out.forall(t => t._4 > 0 && t._4 <= 64))
    // pure function of the input
    val again = PipelineOps.bootstrapCiOn(docs, replicas = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === again.toSeq)
  }

  test("q339 reshard plan: every move lands on the new shard and the moved share stays near 1/(n+1)") {
    val out = IncrementalOps.reshardPlan(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val (total, moves) = out.partition(_._1 == "*")
    // the consistent-hashing contract, measured: old->old moves are
    // structurally impossible — only arcs captured by s8's new vnodes
    // change owner
    assert(moves.nonEmpty && moves.forall(_._2 === "s8"))
    assert(total.length === 1)
    // moved share in the consistent-hash regime (vnode-share ~111k ppm
    // with 16-vnode variance), nowhere near modulo-sharding's ~889k
    val ppm = total.head._4
    assert(ppm > 20000L && ppm < 400000L, s"moved_ppm $ppm")
    // the move matrix reconciles with the total
    assert(moves.map(_._3).sum === total.head._3)
  }

  test("q340 percolation: a sparse bridge fuses the graph at the loose cut and dissolves at the tight one") {
    import spark.implicits._
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat, 0.0f, 0.0f)
    }
    // two tight pairs (0/10 and 120/130 deg) + a bridge at 64 deg:
    // at t=0.5 the bridge links everything (one 5-node component);
    // at t=0.8 only the tight pairs survive (2 components, giant 2/5)
    val emb = Seq((1L, v(0)), (2L, v(10)), (3L, v(64)), (4L, v(120)),
      (5L, v(130))).toDF("vec_id", "embedding")
    val out = SimilarityOps.epsPercolationOn(emb,
        thresholds = Seq(0.5, 0.8), nPlanes = 3, nTables = 96)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length === 2)
    val (loose, tight) = (out(0), out(1))
    assert(loose._1 === 5000 && loose._4 === 1L &&
      loose._5 === 1000000L && loose._3 === 5L)
    assert(tight._1 === 8000 && tight._4 === 2L && tight._3 === 4L &&
      tight._5 === 400000L)
  }

  test("q341 sort-key panel: the matching key never scans more files than a mismatched one") {
    val out = IncrementalOps.sortKeyPruning(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length === 9)
    val matching = Map("ship_window" -> "l_shipdate",
      "part_range" -> "l_partkey", "order_range" -> "l_orderkey")
    matching.foreach { case (w, k) =>
      val own = out.find(t => t._1 == k && t._2 == w).get._5
      out.filter(t => t._2 == w && t._1 != k).foreach { other =>
        assert(own <= other._5, s"$k should prune $w at least as well " +
          s"as ${other._1} ($own vs ${other._5})")
      }
    }
    // every panel cell is a valid share and file counts agree per key
    assert(out.forall(t => t._4 <= t._3 && t._5 <= 1000000L))
    assert(out.groupBy(_._1).values.forall(_.map(_._3).distinct.size == 1))
  }

  test("q342 gap fill: missing days materialize with the last observed price") {
    import spark.implicits._
    import java.sql.Date
    // brand A observed on day 1 (100c) and day 4 (200c): days 2-3 must
    // materialize at 100c; the month mean is (100+100+100+200)/4
    val daily = Seq(
      ("BrandA", Date.valueOf("2020-01-01"), 100L),
      ("BrandA", Date.valueOf("2020-01-04"), 200L))
      .toDF("brand", "day", "price_c")
    val out = CoreQueries.gapFillOn(daily, topBrands = 3)
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6)))
    assert(out.toSeq ===
      Seq(("BrandA", "2020-01-01", 4L, 2L, 2L, 200L, 125L)))
  }

  test("q343 islands: overlapping and touching spans fuse, disjoint spans split") {
    import spark.implicits._
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // supplier 1: [1,5]+[3,8] overlap, [8,9] touches (s == running max
    // end -> SAME island), [11,12] is disjoint
    val iv = Seq(
      (1L, d("2020-01-01"), d("2020-01-05"), 1L),
      (1L, d("2020-01-03"), d("2020-01-08"), 2L),
      (1L, d("2020-01-08"), d("2020-01-09"), 3L),
      (1L, d("2020-01-11"), d("2020-01-12"), 4L),
      (2L, d("2020-02-01"), d("2020-02-01"), 5L))
      .toDF("suppkey", "s", "e", "tie")
    val out = CoreQueries.intervalIslandsOn(iv)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 4L, 2L, 11L, 9L), // [1,9] = 9 days + [11,12] = 2 days
      (2L, 1L, 1L, 1L, 1L))) // a point interval covers one day
  }

  test("q344 removal attribution: the gateway channel takes all credit, a dead-end channel none") {
    import spark.implicits._
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2020-01-01 00:$m%02d:00")
    // users 1-2 convert THROUGH click; user 3 views and leaves: click
    // is the gateway (removal kills every conversion), view a dead end
    val ev = Seq(
      (1L, 1L, "click", t(1)), (2L, 1L, "purchase", t(2)),
      (3L, 2L, "click", t(1)), (4L, 2L, "purchase", t(2)),
      (5L, 3L, "view", t(1)))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.removalAttributionOn(ev, iters = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val click = out.find(_._1 == "click").get
    val view = out.find(_._1 == "view").get
    // base absorption: 2 of 3 journeys convert -> 666666 ppm (floor)
    assert(click._2 === 666666L && view._2 === 666666L)
    // removing the gateway kills every conversion; the dead end none
    assert(click._3 === 0L && click._4 === 666666L &&
      click._5 === 1000000L)
    assert(view._3 === 666666L && view._4 === 0L && view._5 === 0L)
  }

  test("q345 Neyman: a zero-variance stratum loses its whole proportional share to the noisy one") {
    import spark.implicits._
    // srcFlat: 10 docs all length 200 (sigma 0); srcNoisy: 10 docs
    // alternating 100/300. Proportional splits 500/500; Neyman weight
    // N*sigma sends the WHOLE budget to the noisy stratum.
    val docs = ((1L to 10L).map(i => (i, "en", "srcFlat", 200L)) ++
      (11L to 20L).map(i =>
        (i, "en", "srcNoisy", if (i % 2 == 0) 100L else 300L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val out = PipelineOps.neymanAllocationOn(docs, slots = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val flat = out.find(_._1 == "srcFlat").get
    val noisy = out.find(_._1 == "srcNoisy").get
    assert(flat._3 === 0L && noisy._3 > 0L)
    assert(flat._4 === 500L && noisy._4 === 500L)
    assert(flat._5 === 0L && noisy._5 === 1000L)
    assert(flat._6 === -500L && noisy._6 === 500L)
    // both plans exhaust the budget exactly
    assert(out.map(_._4).sum === 1000L && out.map(_._5).sum === 1000L)
  }

  test("q346 Chapman: planted half-overlapping captures reproduce the textbook estimate") {
    import spark.implicits._
    // A = {t1..t50}, B = {t26..t75}: overlap 25, union 75;
    // Chapman = 51*51 div 26 - 1 = 99
    val st = ((1 to 50).map(i => ("srcA", s"t$i")) ++
      (26 to 75).map(i => ("srcB", s"t$i"))).toDF("source", "tok")
    val out = DedupOps.chapmanOn(st)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))
    assert(out.length === 1)
    val r = out.head
    assert(r === ("srcA", "srcB", 50L, 50L, 25L, 99L, 75L, 1320000L))
  }

  test("q347 label model: EM learns to trust aligned voters and collapse the anti-correlated one") {
    import spark.implicits._
    // positives: length+stopword voters fire, diversity voter does
    // NOT (repetitive text); negatives: ONLY the diversity voter
    // fires. v2 is thus perfectly anti-correlated with the v1=v3
    // consensus — EM must drive its accuracy toward the low clamp
    // while the aligned voters approach the high clamp.
    val pos = "the " * 10 + "x y z " * 7           // 31 toks, 4 distinct
    val neg = "q w e r t y u i o p"                // 10 toks, no stops
    val docs = ((1L to 30L).map(i => (i, pos)) ++
      (31L to 50L).map(i => (i, neg))).toDF("doc_id", "text")
    val out = TextAnalysisOps.labelModelOn(docs, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val r3 = out.filter(_._1 == 3).map(t => t._2 -> t._3).toMap
    assert(r3("len_band") > 900000L && r3("stopword") > 900000L)
    assert(r3("diversity") < 100000L)
    // the 30 planted positives stay positive through every round
    assert(out.forall(_._4 === 30L))
  }

  test("q348 randomization test: a planted giant effect bottoms out at 1/(R+1); a null source does not") {
    import spark.implicits._
    // effect fixture: srcBig's docs are 10x longer than the rest
    val eff = ((1L to 10L).map(i => (i, "en", "srcBig", 1000L)) ++
      (11L to 40L).map(i => (i, "en", "srcRest", 100L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val big = PipelineOps.randomizationTestOn(eff, replicas = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .find(_._1 == "srcBig").get
    // the real effect: +900 mean chars, no relabeling reaches it,
    // p = (0+1)/65 exactly
    assert(big._3 === 900000L && big._4 === 0L && big._5 === 15384L)
    // null fixture: two identical strata — observed diff 0, every
    // replicate at least as extreme -> p = 1 for both
    val nul = ((1L to 15L).map(i => (i, "en", "srcN1", 100L)) ++
      (16L to 30L).map(i => (i, "en", "srcN2", 100L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val nout = PipelineOps.randomizationTestOn(nul, replicas = 64)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(4)))
    assert(nout.forall(t => t._2 === 0L && t._3 === 1000000L))
  }

  test("q349 Good-Turing: a hand-built frequency ladder reproduces p0 and the r* discounts") {
    import spark.implicits._
    // corpus: a a a b b c d e -> N=8, V=5, n1=3 (c,d,e), n2=1 (b),
    // n3=1 (a): p0 = 3/8 = 375000 ppm, r*1 = 2*1/3 = 666 milli,
    // r*2 = 3*1/1 = 3000 milli, r*3 = 4*0/1 = 0
    val docs = Seq((1L, "a a a b b c d e", "en", "srcX", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysisOps.goodTuringOn(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
      r.getLong(8), r.getLong(9)) ===
      ("srcX", 8L, 5L, 3L, 1L, 1L, 375000L, 666L, 3000L, 0L))
  }

  test("q350 column entropy: entropy never exceeds the uniform bound and flags sit near it") {
    val out = graft.dq.DataQuality.columnEntropy(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length === 5)
    // Shannon: H <= log2(distinct), with equality only at uniform
    assert(out.forall(t => t._4 <= t._5 + 1e-9))
    // the low-cardinality flag columns are the RLE/bit-pack story
    val ls = out.find(_._1 == "linestatus").get
    assert(ls._3 === 2L && ls._4 <= 1.0)
    // keys approach their uniform dictionary bound (near-unique use)
    val pk = out.find(_._1 == "partkey").get
    assert(pk._4 > pk._5 * 0.95)
  }
}
