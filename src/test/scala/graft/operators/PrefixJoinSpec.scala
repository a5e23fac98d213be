package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-7 second batch: lossless prefix-filtered similarity join (q121),
  * leakage-safe fold assignment (q122), per-source score deciles (q123).
  */
class PrefixJoinSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- q121 prefixJaccardJoin -----------------------------------------

  test("prefixJoin: lossless vs brute-force Jaccard on a testdata slice") {
    val docs = graft.Tables.documents(spark, sf0001)
      .filter($"doc_id" < 400)
    val got = DedupOps.prefixJaccardJoinOn(docs)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    // brute force: exact Jaccard >= 3/5 via the INTEGER-exact rule
    // (5·inter >= 3·union — the engine's filter) over the same 8-gram
    // shingle sets, no prefix filter; rounded score only for display
    val sets = docs.select($"doc_id",
        graft.functions.Text.wordShingles($"text", 8).as("s"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, s) => (id, s.toSet) }
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.intersect(sb).size
      if 5 * inter >= 3 * (sa.size + sb.size - inter)
      j = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (ia, ib, j)).toSet
    assert(got === brute)
    assert(got.nonEmpty) // the slice must actually contain near-dups
  }

  test("prefixJoin: xxhash64 payload default ≡ md5 payload, exactly") {
    val md5Out = DedupOps.prefixJaccardJoin(spark, sf0001,
        hashedPayload = false)
      .as[(Long, Long, Long, Double)].collect().toSet
    val hashedOut = DedupOps.prefixJaccardJoin(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(hashedOut === md5Out)
    assert(md5Out.nonEmpty)
    val md5C = DedupOps.containmentJoin(spark, sf0001,
        hashedPayload = false)
      .as[(Long, Long, Long, Double)].collect().toSet
    val hashedC = DedupOps.containmentJoin(spark, sf0001)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(hashedC === md5C)
    assert(md5C.nonEmpty)
  }

  test("prefixJoin: planted near-dup pair survives, distant pair does not") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 38).map(i => s"w$i").mkString(" ") + " x1 x2"
    val far = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base, "en", "s", 10L), (2L, near, "en", "s", 10L),
        (3L, far, "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = DedupOps.prefixJaccardJoinOn(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }

  // ---- q122 leakageSafeFolds ------------------------------------------

  test("folds: partition the corpus; totals add up") {
    val docs = graft.Tables.documents(spark, sf0001)
    val out = PipelineOps.leakageSafeFolds(spark, sf0001)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._2).sum === docs.count())
    assert(out.map(_._4).sum ===
      docs.agg(sum("n_chars")).as[Long].head())
    out.foreach { case (fold, nd, nc, _) =>
      assert(fold >= 0 && fold < 5 && nd >= nc && nc > 0)
    }
  }

  test("folds: exact duplicates land in the same fold") {
    val docs = Seq(
      (10L, "alpha beta gamma", "en", "s", 16L),
      (11L, "alpha beta gamma", "en", "s", 16L), // dup of 10
      (12L, "alpha beta gamma", "en", "s", 16L), // dup of 10
      (20L, "delta epsilon zeta", "en", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // 3 copies of one cluster + 1 singleton = 2 clusters; the dup
    // cluster's 3 docs must be in ONE fold (n_docs=3, n_clusters=1)
    val out = PipelineOps.leakageSafeFoldsOn(docs)
      .as[(Int, Long, Long, Long)].collect()
    assert(out.map(_._3).sum === 2L)
    assert(out.exists(r => r._2 === 3L && r._3 === 1L) ||
      out.exists(r => r._2 === 4L && r._3 === 2L)) // both clusters same fold
  }

  // ---- q123 scoreCalibration ------------------------------------------

  test("deciles: integer-bucketed, monotone score ranges per source") {
    val out = TextAnalysisOps.scoreCalibration(spark, sf0001)
      .as[(String, Int, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, d, n, lo, hi) =>
      assert(d >= 0 && d <= 9 && n > 0 && lo <= hi)
    }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      // ranked by quality, so max of decile d never exceeds min of d+1
      // (quality ties straddling a boundary make them equal)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4)
        case _ =>
      }
    }
  }

  test("deciles: bucket sizes differ by at most one when n >= 10") {
    val out = TextAnalysisOps.scoreCalibration(spark, sf0001)
      .as[(String, Int, Long, Double, Double)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ns = rows.map(_._3)
      if (ns.sum >= 10) assert(ns.max - ns.min <= 1)
    }
  }
}
