package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-11 closing batch (q263–q270): each operator checked on a
  * constructed fixture where the expected output is known in closed
  * form, plus contract checks against the real testdata.
  */
class Round11bOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .withColumn("props", lit("{}"))

  // ---- q263 CUSUM changepoint -------------------------------------

  test("q263: a clean level shift peaks exactly at the shift boundary") {
    // counts per day: 10,10,10,20,20,20 — |n·cum − idx·total| is
    // 30,60,90,60,30,0, so the argmax day is day 3 with dev 90
    val rows = for {
      (day, cnt) <- Seq(1 -> 10, 2 -> 10, 3 -> 10, 4 -> 20, 5 -> 20,
        6 -> 20)
      i <- 1 to cnt
    } yield ((day * 1000 + i).toLong, f"2024-01-0$day%d 12:00:00",
      1L, "x", 0.0)
    val out = EventOps.cusumChangepointOn(eventsOf(rows)).collect()
    assert(out.length === 1)
    assert(out(0).getLong(1) === 6L)
    assert(out(0).getDate(2).toString === "2024-01-03")
    assert(out(0).getLong(3) === 90L)
  }

  test("q263: a constant series peaks at dev 0 on the earliest day") {
    val rows = for {
      day <- 1 to 4; i <- 1 to 5
    } yield ((day * 100 + i).toLong, f"2024-01-0$day%d 12:00:00",
      1L, "x", 0.0)
    val out = EventOps.cusumChangepointOn(eventsOf(rows)).collect()
    assert(out(0).getLong(3) === 0L)
    assert(out(0).getDate(2).toString === "2024-01-01")
  }

  // ---- q264 compaction planner ------------------------------------

  test("q264: greedy cum-div-target binning with a known file list") {
    // files 1000,1000,1000,3000 at target 2048: cum-before is
    // 0,1000,2000,3000 → bins {0,0,0,1}; three small files before,
    // none after
    val docs = Seq((0L, "s", 1000L), (1L, "s", 1000L), (2L, "s", 1000L),
      (3L, "s", 3000L)).toDF("doc_id", "source", "n_chars")
    val out = IncrementalOps.compactionPlanOn(docs, 2048L).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getLong(1) === 4L)    // n_files
    assert(r.getLong(2) === 6000L) // total_bytes
    assert(r.getLong(3) === 3L)    // small_before
    assert(r.getLong(4) === 2L)    // n_bins
    assert(r.getLong(5) === 3000L) // max_bin_bytes
    assert(r.getLong(6) === 0L)    // small_after
  }

  test("q264: planner is manifest-scale — bins cover all bytes") {
    val out = IncrementalOps.compactionPlan(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) >= 1L)
      assert(r.getLong(5) <= r.getLong(2))
      assert(r.getLong(6) <= r.getLong(4))
    }
  }

  // ---- q265 item-item recommendations -----------------------------

  test("q265: cosine² ppm ranks the tighter overlap first") {
    // item 1 overlaps item 2 on 4 of 4/4 users (cos²=1e6) and item 3
    // on 2 of 4/8 (cos²=4·1e6/32=125000)
    val pairs = Seq((1, 2, 4L), (1, 3, 2L))
      .toDF("i", "j", "n_ij")
    val marg = Seq((1, 4L), (2, 4L), (3, 8L)).toDF("item", "n_i")
    val out = GraphOps.itemRecsOnPairs(pairs, marg, k = 3)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getLong(4)))
    assert(out.contains((1, 1, 2, 1000000L)))
    assert(out.contains((1, 2, 3, 125000L)))
    // symmetrized: 2 and 3 each see item 1 as their top rec
    assert(out.contains((2, 1, 1, 1000000L)))
    assert(out.contains((3, 1, 1, 125000L)))
  }

  // ---- q266 link prediction ---------------------------------------

  test("q266: a shared neighbor predicts the missing third edge") {
    // orders: {A,B}×2, {B,C}×2 — edges (A,B),(B,C); the only wedge is
    // A–B–C, so the predicted link is (A,C) with cn=1 and
    // jac = 1e6/(1+1−1) = 1e6
    val li = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L),
      (3L, 20L), (3L, 30L), (4L, 20L), (4L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val out = GraphOps.coOrderLinkPredOn(li, k = 20, nbrCap = 50)
      .collect()
    assert(out.length === 1)
    assert((out(0).getLong(0), out(0).getLong(1)) === ((10L, 30L)))
    assert(out(0).getLong(2) === 1L)
    assert(out(0).getLong(3) === 1000000L)
  }

  test("q266: existing edges never appear as predictions") {
    val out = GraphOps.coOrderLinkPred(spark, sf0001)
    val edges = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = edges.as("a").join(edges.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_i"), col("b.pk").as("part_j"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("part_i"), col("part_j"))
    assert(out.join(e, Seq("part_i", "part_j"), "left_semi").count() === 0L)
  }

  // ---- q267 propensity calibration --------------------------------

  test("q267: reliability panel and Brier agree with a hand computation") {
    // u1: 1 click / 2 events (p=500), big-ticket in H2 (y=1000)
    // u2: 0 clicks / 2 events (p=0), no H2 purchase (y=0)
    val ev = eventsOf(Seq(
      (1L, "2024-01-02 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-03 10:00:00", 1L, "view", 0.0),
      (3L, "2024-01-20 10:00:00", 1L, "purchase", 150.0),
      (4L, "2024-01-02 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-03 10:00:00", 2L, "view", 0.0),
      (6L, "2024-01-20 10:00:00", 2L, "purchase", 10.0)))
    val out = EventOps.propensityCalibrationOn(ev, 10000L)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // u1 → bucket 9 (500 div 50 = 10, clamped): brier (500−1000)²/1000
    assert(out(9) === ((1L, 1L, 500L, 1000L, 250L)))
    // u2 → bucket 0: brier 0
    assert(out(0) === ((1L, 0L, 0L, 0L, 0L)))
  }

  // ---- q268 seasonal-naive MASE -----------------------------------

  test("q268: a perfectly weekly series has MASE 0; a constant one is NULL") {
    // weekly: counts cycle with period 7 → lag-7 errors all 0 while
    // lag-1 errors are not; constant: lag-1 MAE is 0 → NULL mase
    val weekly = for {
      day <- 1 to 21
      i <- 1 to (if (day % 7 == 0) 5 else 2)
    } yield ((day * 1000 + i).toLong, f"2024-01-$day%02d 12:00:00",
      1L, "w", 0.0)
    val const = for {
      day <- 1 to 21; i <- 1 to 3
    } yield ((100000L + day * 1000 + i), f"2024-01-$day%02d 12:00:00",
      1L, "c", 0.0)
    val out = EventOps.seasonalNaiveMaseOn(eventsOf(weekly ++ const), 7)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("w").getLong(2) === 0L)        // mae7_sum
    assert(out("w").getLong(4) === 0L)        // mase_ppm
    assert(out("c").getLong(3) === 0L)        // mae1_sum
    assert(out("c").isNullAt(4))              // mase undefined
  }

  // ---- q269 proximity search --------------------------------------

  test("q269: NEAR/3 counts position pairs and takes the first A position") {
    val docs = Seq(
      (1L, "table x scan"),                  // dist 2 → 1 match
      (2L, "table x y z scan"),              // dist 4 → no match
      (3L, "table scan table"),              // pairs (1,2),(3,2) → 2
      (4L, "scan y table")                   // dist 2 → 1 match
    ).toDF("doc_id", "text")
    val out = RetrievalOps.proximitySearchOn(docs, "table", "scan", 3, 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((3L, 2L, 1L), (1L, 1L, 1L), (4L, 1L, 3L)))
  }

  // ---- q271 k-anonymity -------------------------------------------

  test("q271: minima and at-risk counts match a constructed QI table") {
    // group (1,A): 2 rows, sens {low, high} → k=2, l=2
    // group (2,B): 6 rows, all 'low' → k=6, l=1 (fails l=2)
    val cust = (Seq((1L, 1, 100.0, "A"), (2L, 1, 9000.0, "A")) ++
      (3L to 8L).map(i => (i, 2, 100.0, "B")))
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    val r = graft.dq.DataQuality.kAnonymityOn(cust).collect()(0)
    assert(r.getLong(0) === 2L)  // n_groups
    assert(r.getLong(1) === 2L)  // k_anonymity
    assert(r.getLong(2) === 1L)  // l_diversity
    assert(r.getLong(3) === 1L)  // groups_below_k5 (the pair group)
    assert(r.getLong(4) === 2L)  // rows_at_risk_k5
    assert(r.getLong(5) === 1L)  // groups_below_l2 (the uniform group)
    assert(r.getLong(6) === 6L)  // rows_at_risk_l2
  }

  // ---- q272 association rules -------------------------------------

  test("q272: the two directions of one pair carry different confidences") {
    // pair (1,2) with n_both=4, n_1=4, n_2=8, 10 users:
    //   1→2 conf = 1e6, lift = 4·10·1e6/32 = 1250000
    //   2→1 conf = 500000, same lift
    val pairs = Seq((1, 2, 4L)).toDF("i", "j", "n_ij")
    val marg = Seq((1, 4L), (2, 8L)).toDF("item", "n_i")
    val nu = Seq(Tuple1(10L)).toDF("n_users")
    val out = GraphOps.assocRulesOnPairs(pairs, marg, nu, k = 25)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((1, 2, 4L, 1000000L, 1250000L),
      (2, 1, 4L, 500000L, 1250000L)))
  }

  // ---- q273 decorrelated above-average ----------------------------

  test("q273: the cross-multiplied compare is exact at the mean boundary") {
    // customer 1: prices 10, 20, 30 — mean is exactly 20, so ONLY 30
    // is above (the boundary order must not pass); customer 2: 10, 11
    // — mean 10.5, 11 is above
    val orders = Seq((1L, 0.10), (1L, 0.20), (1L, 0.30),
      (2L, 0.10), (2L, 0.11))
      .toDF("o_custkey", "o_totalprice")
    val out = CoreQueries.q273AboveCustomerAvgOn(orders, minAbove = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 1L, 30L), (2L, 1L, 11L)))
  }

  // ---- q274 seasonal anomaly --------------------------------------

  test("q274: deviation is measured against the own-dow mean, not the global one") {
    // Mondays (Jan 1, 8): 10 and 20 events → dow mean 15, dev 5000
    // Tuesdays (Jan 2, 9): 2 and 2 → dev 0
    val rows =
      (1 to 10).map(i => (100L + i, "2024-01-01 10:00:00", 1L, "x", 0.0)) ++
      (1 to 20).map(i => (200L + i, "2024-01-08 10:00:00", 1L, "x", 0.0)) ++
      (1 to 2).map(i => (300L + i, "2024-01-02 10:00:00", 1L, "x", 0.0)) ++
      (1 to 2).map(i => (400L + i, "2024-01-09 10:00:00", 1L, "x", 0.0))
    val byName = EventOps.seasonalAnomalyOn(eventsOf(rows), 10)
      .select("day", "dow", "cnt", "dow_mean_milli", "dev_milli")
      .collect().map(r => (r.getDate(0).toString, r.getInt(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(byName.take(2).toSeq === Seq(
      ("2024-01-01", 1, 10L, 15000L, 5000L),
      ("2024-01-08", 1, 20L, 15000L, 5000L)))
    assert(byName.drop(2).forall(_._5 === 0L))
  }

  // ---- q275 grouping sets -----------------------------------------

  test("q275: the four cuts cover the corpus — grand total equals the base sum") {
    val out = CoreQueries.q275GroupingSets(spark, sf0001).collect()
    val total = graft.Tables.lineitem(spark, sf0001).count()
    val grand = out.filter(r => r.getInt(2) === 1 && r.getInt(3) === 1)
    assert(grand.length === 1)
    assert(grand(0).getLong(4) === total)
    // each single-axis cut also partitions the corpus
    Seq((1, 0), (0, 1), (0, 0)).foreach { case (gf, gs) =>
      val cut = out.filter(r => r.getInt(2) === gf && r.getInt(3) === gs)
      assert(cut.map(_.getLong(4)).sum === total, s"cut ($gf,$gs)")
    }
  }

  // ---- q276 apportionment -----------------------------------------

  test("q276: Hamilton allocation conserves the budget and breaks remainder ties by source") {
    // counts 1,1,1 at 10 slots: quotas 3,3,3 (rem 1 each), leftover 1
    // goes to the lexicographically first source
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "source")
    val out = PipelineOps.apportionBudgetOn(docs, 10L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getInt(3),
        r.getLong(4)))
    assert(out.toSeq === Seq(("a", 3L, 1, 4L), ("b", 3L, 0, 3L),
      ("c", 3L, 0, 3L)))
    assert(out.map(_._4).sum === 10L)
  }

  test("q276: testdata contract — Σ alloc is exactly the budget at every skew") {
    val out = PipelineOps.apportionBudget(spark, sf0001).collect()
    assert(out.map(_.getLong(4)).sum === 1000L)
  }

  // ---- q277 KWIC --------------------------------------------------

  test("q277: context windows clip at document edges") {
    val docs = Seq((1L, "merge a b c"), (2L, "x y merge"),
      (3L, "p q merge r s"))
      .toDF("doc_id", "text")
    val out = TextAnalysisOps.kwicOn(docs, "merge", 2, 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, 1L, "merge a b"),
      (2L, 3L, "x y merge"), (3L, 3L, "p q merge r s")))
  }

  // ---- q278 backlog ledger ----------------------------------------

  test("q278: the ledger nets opened against last-line-shipped completions") {
    val orders = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:00:00"),
      (3L, "2024-01-02 00:00:00"))
      .toDF("o_orderkey", "s")
      .withColumn("o_orderdate", to_timestamp(col("s"))).drop("s")
    // order 1 ships lines on Jan 2 and Jan 3 → completes Jan 3;
    // order 2 completes Jan 2; order 3 never ships
    val li = Seq((1L, "2024-01-02 00:00:00"), (1L, "2024-01-03 00:00:00"),
      (2L, "2024-01-02 00:00:00"))
      .toDF("l_orderkey", "s")
      .withColumn("l_shipdate", to_timestamp(col("s"))).drop("s")
    val out = CoreQueries.q278BacklogLedgerOn(orders, li)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    // running balance: 2, 2, 1 — order 3 stays open forever
    assert(out.toSeq === Seq(("2024-01-01", 2L, 0L, 2L),
      ("2024-01-02", 1L, 1L, 2L), ("2024-01-03", 0L, 1L, 1L)))
  }

  // ---- q279 PRF expansion -----------------------------------------

  test("q279: expansion terms exclude the query's own terms and rank by feedback TF") {
    val out = RetrievalOps.prfExpansion(spark, sf0001).collect()
    assert(out.length === 15) // 5 queries x 3 expansion terms
    // own-term exclusion: recompute each query's top-3 terms and
    // assert the expansion never re-proposes them
    val docs = graft.Tables.documents(spark, sf0001)
    val ownTerms = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"),
        explode(graft.functions.Text.tokens(col("text"))).as("tok"))
      .groupBy(col("qid"), col("tok")).agg(count(lit(1)).as("tf"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
          .orderBy(col("tf").desc, col("tok"))))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("tok").as("exp_term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    out.foreach { r =>
      assert(!ownTerms.contains((r.getLong(0), r.getString(2))),
        s"own term proposed: ${r.getLong(0)} ${r.getString(2)}")
    }
    // TF ranks are strictly ordered within each query
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val tfs = rows.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(tfs.sameElements(tfs.sortBy(-_)))
    }
  }

  // ---- q280 embedding split drift ---------------------------------

  test("q280: identical halves drift at cosine 1; opposite halves at -1") {
    // label 0: even and odd vectors identical → cos 1.0
    // label 1: odd half is the negation → cos -1.0
    val emb = Seq(
      (0L, 0, Array(0.5f, 0.25f)), (1L, 0, Array(0.5f, 0.25f)),
      (2L, 0, Array(0.5f, 0.25f)), (3L, 0, Array(0.5f, 0.25f)),
      (10L, 1, Array(0.5f, 0.0f)), (11L, 1, Array(-0.5f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = graft.operators.EmbedHealthOps.splitDriftOn(emb)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(0) === ((2L, 2L, 1.0)))
    assert(out(1) === ((1L, 1L, -1.0)))
  }

  // ---- q282 stratified hash sample --------------------------------

  test("q282: the drawn sample hits every Hamilton quota exactly") {
    val out = PipelineOps.stratifiedHashSample(spark, sf0001).collect()
    val alloc = PipelineOps.apportionBudget(spark, sf0001, 100L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(out.map(_.getLong(1)).sum === 100L)
    out.foreach { r =>
      assert(r.getLong(1) === alloc(r.getString(0)),
        s"${r.getString(0)} quota missed")
    }
  }

  test("q282: membership is the md5 order, not the id order") {
    // 4 docs in one source, budget 2: the two LOWEST md5(doc_id)
    // win, whatever their numeric ids are
    val docs = (1L to 4L).map(i => (i, "s")).toDF("doc_id", "source")
    val expect = (1L to 4L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils
        .md5Hex(i.toString))
      .take(2)
    val out = PipelineOps.stratifiedHashSampleOn(docs, 2L).collect()(0)
    assert(out.getLong(1) === 2L)
    assert(out.getLong(4) === expect.sum) // sum_doc pins membership
  }

  // ---- q283 conversion hazard -------------------------------------

  test("q283: at-risk counts telescope and censored users never convert") {
    // u1 converts day 0, u2 day 2, u3 never (censored at the window
    // edge, day 29 from Jan 1)
    val ev = eventsOf(Seq(
      (1L, "2024-01-01 08:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 09:00:00", 1L, "purchase", 5.0),
      (3L, "2024-01-01 08:00:00", 2L, "view", 0.0),
      (4L, "2024-01-03 09:00:00", 2L, "purchase", 5.0),
      (5L, "2024-01-01 08:00:00", 3L, "view", 0.0)))
    val out = EventOps.conversionHazardOn(ev)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (0, 3L, 1L, 0L, 333333L),
      (2, 2L, 1L, 0L, 500000L),
      (29, 1L, 0L, 1L, 0L)))
  }

  // ---- q284 Lorenz deciles ----------------------------------------

  test("q284: deciles partition customers and shares telescope to ≤10000 bp") {
    val out = CoreQueries.q284LorenzDeciles(spark, sf0001).collect()
    val nCust = graft.Tables.orders(spark, sf0001)
      .select(col("o_custkey")).distinct().count()
    assert(out.map(_.getLong(1)).sum === nCust)
    val shares = out.map(_.getLong(3))
    assert(shares.sum <= 10000L && shares.sum > 9900L)
    // Lorenz monotonicity: mean spend per customer is nondecreasing
    // across deciles (cross-multiplied — decile sizes can differ ±1)
    val ds = out.map(r => (r.getLong(2), r.getLong(1)))
    assert(ds.zip(ds.tail).forall { case ((s1, n1), (s2, n2)) =>
      BigInt(s1) * n2 <= BigInt(s2) * n1 })
  }

  // ---- q285 argmax top supplier -----------------------------------

  test("q285: the struct argmax equals the window-rank champion everywhere") {
    val out = CoreQueries.q285TopSupplier(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // independent formulation: window rank over the same revenue grid
    val li = graft.Tables.lineitem(spark, sf0001)
    val sup = graft.Tables.supplier(spark, sf0001)
    val sr = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long")))
        .as("rev_cp"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("s_nationkey"))
          .orderBy(col("rev_cp").desc, col("l_suppkey").desc)))
      .filter(col("rk") === 1)
    val nations = graft.Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), col("n_name"))
    val expect = sr.join(nations,
        col("s_nationkey") === col("n_nationkey"))
      .collect().map(r => (r.getString(5),
        (r.getLong(1), r.getLong(2)))).toMap
    assert(out === expect)
  }

  // ---- q286 Markov stationary -------------------------------------

  test("q286: a deterministic 2-state cycle settles at its exact split") {
    // chain a→b→a→b…: transition matrix is a swap, so each iteration
    // swaps the masses; 8 (even) iterations return the start vector
    val rows = (0 until 10).map { i =>
      ((i + 1).toLong, f"2024-01-01 10:${i}%02d:00", 1L,
        if (i % 2 == 0) "a" else "b", 0.0)
    }
    val out = EventOps.markovStationaryOn(eventsOf(rows), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 200000L, "b" -> 200000L))
    // odd iterations also preserve the uniform split on a pure swap
    val odd = EventOps.markovStationaryOn(eventsOf(rows), 7)
      .collect().map(r => r.getLong(1)).sum
    assert(odd === 400000L)
  }

  test("q286: mass never grows (per-term floors only shed)") {
    val out = EventOps.markovStationary(spark, sf0001).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total <= 5L * 200000L && total > 5L * 199000L)
  }

  // ---- q287 Wilson intervals --------------------------------------

  test("q287: bounds bracket the point rate and tighten with n") {
    val out = EventOps.wilsonIntervals(spark, sf0001).collect()
    assert(out.length === 2)
    out.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val p = c.toDouble / n
      assert(r.getDouble(3) <= p && p <= r.getDouble(4))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  // ---- q288 per-class P/R/F1 --------------------------------------

  test("q288: tp/fp/fn and the ppm-harmonic F1 match a hand-built confusion") {
    // 'the the' → en (correct); 'la la' → es vs true fr (fp for es,
    // fn for fr); 'zz zz' → und vs true en (fn for en, fp for und)
    val docs = Seq((1L, "the the", "en"), (2L, "la la", "fr"),
      (3L, "zz zz", "en"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysisOps.langIdPrfOn(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("en") === ((1L, 0L, 1L)))  // tp=1, fn the 'zz' doc
    assert(out("es") === ((0L, 1L, 0L)))  // predicted but never true
    assert(out("fr") === ((0L, 0L, 1L)))  // true but never predicted
    assert(out("und") === ((0L, 1L, 0L)))
    // F1 for en: 2·1·1e6 / (2+0+1) = 666666 (floored harmonic)
    val f1 = TextAnalysisOps.langIdPrfOn(docs)
      .collect().map(r => r.getString(0) -> r.get(6)).toMap
    assert(f1("en") === 666666L)
  }

  // ---- q290 cohort LTV --------------------------------------------

  test("q290: revenue accrues to the user's FIRST-activity cohort, cumulatively") {
    // u1 first active week 0, purchases in weeks 0 and 2;
    // u2 first active week 2 (its purchase lands in ITS week 0)
    val ev = eventsOf(Seq(
      (1L, "2024-01-02 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-03 10:00:00", 1L, "purchase", 10.0),
      (3L, "2024-01-16 10:00:00", 1L, "purchase", 20.0),
      (4L, "2024-01-17 10:00:00", 2L, "purchase", 5.0)))
    val out = EventOps.cohortLtvOn(ev)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out((0, 0)) === ((1L, 1000L, 1000L)))
    assert(out((0, 2)) === ((1L, 3000L, 3000L)))  // cumulative
    assert(out((2, 0)) === ((1L, 500L, 500L)))
  }

  // ---- q291 ABC x XYZ ---------------------------------------------

  test("q291: the matrix covers every part exactly once") {
    val out = CoreQueries.q291AbcXyz(spark, sf0001).collect()
    val nParts = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_partkey")).distinct().count()
    assert(out.map(_.getLong(2)).sum === nParts)
    val classes = out.map(r => (r.getString(0), r.getString(1)))
    assert(classes.distinct.length === classes.length)
    assert(classes.forall { case (a, x) =>
      Seq("A", "B", "C").contains(a) && Seq("X", "Y", "Z").contains(x) })
  }

  // ---- q292 drawdown panel ----------------------------------------

  test("q292: drawdown measures the dip below the running peak exactly") {
    // nets: +100, -30, +10, -90 → cum 100, 70, 80, -10; peak 100
    // throughout → drawdowns 0, 30, 20, 110 (in cents: values below)
    val ev = eventsOf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 1.00),
      (2L, "2024-01-02 10:00:00", 1L, "purchase", 0.20),
      (3L, "2024-01-02 10:00:01", 1L, "error", 0.0),
      (4L, "2024-01-03 10:00:00", 1L, "purchase", 0.10),
      (5L, "2024-01-04 10:00:00", 1L, "error", 0.0),
      (6L, "2024-01-04 10:00:01", 1L, "error", 0.0)))
    // penalty 50c per error: day nets = 100, -30, 10, -100
    val out = EventOps.drawdownPanelOn(ev, 50L)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 100L, 100L, 100L, 0L),
      ("2024-01-02", -30L, 70L, 100L, 30L),
      ("2024-01-03", 10L, 80L, 100L, 20L),
      ("2024-01-04", -100L, -20L, 100L, 120L)))
  }

  // ---- q293 conversion paths --------------------------------------

  test("q293: paths read the two events strictly before each purchase, per user") {
    val ev = eventsOf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0),
      (3L, "2024-01-01 10:02:00", 1L, "purchase", 1.0),
      // u2's purchase has only ONE prior event → excluded
      (4L, "2024-01-01 10:00:00", 2L, "view", 0.0),
      (5L, "2024-01-01 10:01:00", 2L, "purchase", 1.0)))
    val out = EventOps.conversionPathsOn(ev, 15)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("view", "click", 1L)))
  }

  // ---- q294 velocity screen ---------------------------------------

  test("q294: only same-day bursts at the threshold fire") {
    val ev = eventsOf(Seq(
      (1L, "2024-01-01 09:00:00", 1L, "purchase", 1.0),
      (2L, "2024-01-01 12:00:00", 1L, "purchase", 2.0),
      (3L, "2024-01-01 18:00:00", 1L, "purchase", 3.0),
      // u2: three purchases across DIFFERENT days → silent
      (4L, "2024-01-01 09:00:00", 2L, "purchase", 1.0),
      (5L, "2024-01-02 09:00:00", 2L, "purchase", 1.0),
      (6L, "2024-01-03 09:00:00", 2L, "purchase", 1.0)))
    val out = graft.dq.DataQuality.velocityScreenOn(ev, 3L)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("2024-01-01", 1L, 3L, 600L)))
  }

  // ---- q295 hierarchy shares --------------------------------------

  test("q295: shares telescope — nations sum to their region and to the total") {
    val out = CoreQueries.q295RegionNationShare(spark, sf0001).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val bp = rows.map(_.getLong(3)).sum
      assert(bp <= 10000L && bp > 10000L - rows.length,
        s"region shares $bp") // floors shed < 1 bp per nation
    }
    val tbp = out.map(_.getLong(4)).sum
    assert(tbp <= 10000L && tbp > 10000L - out.length)
  }

  // ---- q296 lateness Pareto ---------------------------------------

  test("q296: cumulative shares are nondecreasing and the 80-band flag flips once") {
    val out = CoreQueries.q296LatenessPareto(spark, sf0001).collect()
    assert(out.nonEmpty)
    val cums = out.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val flags = out.map(_.getInt(4))
    assert(flags.zip(flags.tail).forall { case (a, b) => a >= b })
  }

  // ---- q297 TwoNN ratio -------------------------------------------

  test("q297: a planted second neighbor at 2x distance gives ratio 4e6") {
    // probe at origin-ish, NN at distance d, second NN at 2d (squared
    // ratio 4); extra far point must not matter
    val emb = Seq(
      (0L, 0, Array(0.0f, 0.0f)),
      (100L, 0, Array(0.125f, 0.0f)),   // q = 128 → d² = 16384
      (101L, 0, Array(0.25f, 0.0f)),    // q = 256 → d² = 65536
      (102L, 0, Array(0.9f, 0.9f)))
    val out = graft.operators.EmbedHealthOps
      .twoNnRatioOn(emb.toDF("vec_id", "label", "embedding"), 1)
      .collect()(0)
    assert(out.getLong(0) === 1L)
    assert(out.getLong(1) === 4000000L)
  }

  // ---- q298 exact AUC ---------------------------------------------

  test("q298: AUC is 1e6 on perfect separation and 500000 on pure ties") {
    import org.apache.spark.sql.DataFrame
    def aucOf(rows: Seq[(Long, Long)]): DataFrame = {
      // build a minimal events frame realizing (p_milli, y) per user:
      // p = n_click*1000 div n_ev over 2 first-half events; y via a
      // big second-half purchase
      val ev = rows.zipWithIndex.flatMap { case ((clicks, y), i) =>
        val u = i.toLong + 1
        Seq((u * 10 + 1, "2024-01-02 10:00:00", u,
          if (clicks >= 1) "click" else "view", 0.0),
          (u * 10 + 2, "2024-01-03 10:00:00", u,
            if (clicks >= 2) "click" else "view", 0.0)) ++
          (if (y == 1) Seq((u * 10 + 3, "2024-01-20 10:00:00", u,
            "purchase", 150.0)) else Nil)
      }
      EventOps.exactAucOn(eventsOf(ev), 10000L)
    }
    // perfect: positives all score 1000, negatives 0
    val perfect = aucOf(Seq((2L, 1L), (2L, 1L), (0L, 0L), (0L, 0L)))
      .collect()(0)
    assert(perfect.getLong(2) === 1000000L)
    // uninformative: same score both classes → 0.5 exactly
    val ties = aucOf(Seq((1L, 1L), (1L, 0L))).collect()(0)
    assert(ties.getLong(2) === 500000L)
  }

  // ---- q299 silhouette-lite ---------------------------------------

  test("q299: tight own cluster scores positive; a vector nearer the other label, negative") {
    // label 0 hugs (0.5, 0); label 1 hugs (-0.5, 0); the stray label-0
    // vector sits ON label 1's centroid → strongly negative
    val emb = Seq(
      (1L, 0, Array(0.5f, 0.01f)), (2L, 0, Array(0.5f, -0.01f)),
      (3L, 1, Array(-0.5f, 0.01f)), (4L, 1, Array(-0.5f, -0.01f)),
      (5L, 0, Array(-0.5f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = graft.operators.EmbedHealthOps.silhouetteLiteOn(emb)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1)._3 === 0L)             // clean label: no negatives
    assert(out(1)._2 > 0L)               // and positive total
    assert(out(0)._3 >= 1L)              // the stray flags negative
  }

  test("q299: both engines truncate the signed division identically (the -7/2 pin)") {
    import spark.implicits._
    val r = spark.sql("SELECT -7 div 2 AS q").collect()(0).getLong(0)
    assert(r === -3L) // truncation toward zero, matching DuckDB's //
  }

  // ---- q300 bounce rate -------------------------------------------

  test("q300: a single-event session bounces; a two-event one does not") {
    val out = CoreQueries.q300BounceRate(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= 10000L)
    }
  }

  // ---- q301 demand spikes -----------------------------------------

  test("q301: the cross-multiplied gate admits exactly peak > 2x mean") {
    val out = CoreQueries.q301DemandSpikes(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // maxq * n_months > 2 * total_qty, re-checked from the outputs
      assert(BigInt(r.getLong(3)) * r.getLong(1) >
        BigInt(2) * r.getLong(2))
      assert(r.getLong(4) > 2000000L)
    }
  }

  // ---- q302 aging report ------------------------------------------

  test("q302: open orders are exactly the orders with no shipped line") {
    val out = CoreQueries.q302AgingReport(spark, sf0001).collect()
    val openTotal = out.map(_.getLong(2)).sum
    val orders = graft.Tables.orders(spark, sf0001)
    val shipped = graft.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct()
    val expect = orders.join(shipped,
      col("o_orderkey") === col("l_orderkey"), "left_anti").count()
    assert(openTotal === expect)
  }

  // ---- q303 whale trend -------------------------------------------

  test("q303: whale share is bounded by the month total and the cut is a strict decile") {
    val out = CoreQueries.q303WhaleShareTrend(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) <= 10000L)
    }
  }

  // ---- q304 frequent triples --------------------------------------

  test("q304: a planted common triple outranks the rest") {
    // three users share items {1,2,3}; one extra pair-only user
    val rows = for {
      (u, items) <- Seq((1L, Seq(1, 2, 3)), (2L, Seq(1, 2, 3)),
        (3L, Seq(1, 2, 3)), (4L, Seq(1, 2)))
      it <- items
    } yield ((u * 100 + it).toLong, "2024-01-01 10:00:00", u, "view", 0.0)
    val ev = rows.toDF("event_id", "s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
      .withColumn("props", format_string("""{"k": %d}""",
        pmod(col("event_id"), lit(100L))))
    val out = GraphOps.frequentTriplesOn(ev, 25, 2, 12).collect()
    assert(out.length === 1)
    assert((out(0).getInt(0), out(0).getInt(1), out(0).getInt(2),
      out(0).getLong(3)) === ((1, 2, 3, 3L)))
  }

  // ---- q305 stage gaps --------------------------------------------

  test("q305: gaps measure consecutive ordered-funnel stage times") {
    // one user advancing through all four stages at known times
    val ev = eventsOf(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "signup", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      (3L, "2024-01-01 10:40:00", 1L, "click", 0.0),
      (4L, "2024-01-01 11:40:00", 1L, "purchase", 0.0)))
    val out = EventOps.stageGapQuantilesOn(ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(out("signup->view") === ((1L, 600000000L)))
    assert(out("view->click") === ((1L, 1800000000L)))
    assert(out("click->purchase") === ((1L, 3600000000L)))
  }

  // ---- q270 FD audit ----------------------------------------------

  test("q270: violation counts equal the closed-form fixture") {
    // source s1 maps to {en, en, fr} → 1 violating LHS, 1 repair row;
    // s2 maps to {de} → clean
    val docs = Seq((1L, "s1", "en"), (2L, "s1", "en"), (3L, "s1", "fr"),
      (4L, "s2", "de")).toDF("doc_id", "source", "lang")
    val out = graft.dq.DataQuality.fdAuditOn(docs)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getInt(5)))).toMap
    assert(out("source->lang") === ((2L, 1L, 4L, 1L, 0)))
    // doc_id is a key, so the key FD holds with zero repair rows
    assert(out("doc_id->source") === ((4L, 0L, 4L, 0L, 1)))
    // lang→source: en→{s1}, fr→{s1}, de→{s2} — holds
    assert(out("lang->source") === ((3L, 0L, 4L, 0L, 1)))
  }
}
