package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Round-7 third batch: lossless containment join (q124), schema-wide
  * RI profile (q125), event transition matrix (q126).
  */
class ContainmentSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- q124 containmentJoin -------------------------------------------

  test("containment: lossless vs brute force on a testdata slice") {
    val docs = graft.Tables.documents(spark, sf0001).filter($"doc_id" < 400)
    val got = DedupOps.containmentJoinOn(docs)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)]
      .collect().toSet
    val sets = docs.select($"doc_id",
        graft.functions.Text.wordShingles($"text", 8).as("s"))
      .as[(Long, Seq[String])].collect()
    // INTEGER-exact rule (5·inter >= 4·min — the engine's filter);
    // rounded score only for display
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      if 5 * inter >= 4 * math.min(sa.toSet.size, sb.toSet.size)
      c = BigDecimal(inter.toDouble / math.min(sa.toSet.size, sb.toSet.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    } yield (ia, ib, c)).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("containment: catches a subset dup that Jaccard misses") {
    val big = (1 to 80).map(i => s"w$i").mkString(" ")
    val small = (30 to 45).map(i => s"w$i").mkString(" ") // 16 toks inside big
    val docs = Seq((1L, big, "en", "s", 10L), (2L, small, "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val cont = DedupOps.containmentJoinOn(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cont === Set((1L, 2L)))
    val jacc = DedupOps.prefixJaccardJoinOn(docs).count()
    assert(jacc === 0L) // the J >= 0.6 join does NOT see this pair
  }

  // ---- q125 riProfile --------------------------------------------------

  test("riProfile: seven edges, clean star schema, exact child counts") {
    val out = graft.dq.DataQuality.riProfile(spark, sf0001)
      .as[(String, Long, Long)].collect()
    assert(out.length === 7)
    assert(out.map(_._1).toSeq === out.map(_._1).sorted.toSeq)
    out.foreach { case (_, nChild, nOrphans) =>
      assert(nChild > 0 && nOrphans >= 0 && nOrphans <= nChild)
    }
    val byEdge = out.map(r => r._1 -> r._2).toMap
    assert(byEdge("lineitem->orders") ===
      graft.Tables.lineitem(spark, sf0001).count())
    assert(byEdge("nation->region") ===
      graft.Tables.nation(spark, sf0001).count())
  }

  test("riProfile: a planted orphan is counted") {
    // orphan = anti-join semantics: key absent from parent
    val child = Seq(1L, 2L, 99L).toDF("c_nationkey")
    val parent = Seq(1L, 2L, 3L).toDF("n_nationkey")
    val orphans = child.join(parent,
      $"c_nationkey" === $"n_nationkey", "left_anti").count()
    assert(orphans === 1L)
  }

  // ---- q126 eventTransitions ------------------------------------------

  test("transitions: probabilities normalize per prev_type") {
    val out = EventOps.eventTransitions(spark, sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val pSum = rows.map(_._4).sum
      assert(math.abs(pSum - 1.0) < 1e-4) // 6dp rounds, |types| terms
      val nSum = rows.map(_._3).sum
      rows.foreach { r =>
        assert(math.abs(r._4 - r._3.toDouble / nSum) < 1e-6)
      }
    }
  }

  test("transitions: hand-built sequence yields exact counts") {
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def t(s: Int) = new java.sql.Timestamp(ts0.getTime + s * 1000L)
    val ev = Seq(
      (1L, t(1), 7L, "a", 0.0, "{}"), (2L, t(2), 7L, "b", 0.0, "{}"),
      (3L, t(3), 7L, "a", 0.0, "{}"), (4L, t(1), 8L, "b", 0.0, "{}"),
      (5L, t(2), 8L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.eventTransitionsOn(ev)
      .select("prev_type", "event_type", "n").as[(String, String, Long)]
      .collect().toSet
    // user 7: a->b, b->a; user 8: b->a  => (a,b):1, (b,a):2
    assert(out === Set(("a", "b", 1L), ("b", "a", 2L)))
  }
}
