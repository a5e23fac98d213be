package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Degenerate-input hardening for the round-7 operator family: empty
  * corpora, single rows, all-duplicate content — the shapes a partition
  * of a 100 TB corpus can legitimately present.
  */
class Round7EdgeSpec extends SparkSpecBase {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String, String, Long)*) =
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")

  private val emptyDocs = docsDf()

  test("prefixJoin/containment: empty and single-doc corpora yield empty") {
    assert(DedupOps.prefixJaccardJoinOn(emptyDocs).count() === 0L)
    assert(DedupOps.containmentJoinOn(emptyDocs).count() === 0L)
    val one = docsDf((1L, (1 to 20).map(i => s"w$i").mkString(" "),
      "en", "s", 10L))
    assert(DedupOps.prefixJaccardJoinOn(one).count() === 0L)
    assert(DedupOps.containmentJoinOn(one).count() === 0L)
  }

  test("prefixJoin: identical docs have jaccard exactly 1.0") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = DedupOps.prefixJaccardJoinOn(
        docsDf((1L, t, "en", "s", 1L), (2L, t, "en", "s", 1L)))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 1 && out.head._4 === 1.0)
  }

  test("containment: identical docs contained at exactly 1.0") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val out = DedupOps.containmentJoinOn(
        docsDf((1L, t, "en", "s", 1L), (2L, t, "en", "s", 1L)))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 1 && out.head._4 === 1.0)
  }

  test("leakageSafeFolds: all-duplicate corpus collapses to one cluster") {
    val out = PipelineOps.leakageSafeFoldsOn(
        docsDf((1L, "same", "en", "s", 4L), (2L, "same", "en", "s", 4L),
          (3L, "same", "en", "s", 4L)))
      .as[(Int, Long, Long, Long)].collect()
    assert(out.length === 1) // one cluster -> one fold row
    assert(out.head._2 === 3L && out.head._3 === 1L)
  }

  test("userPaths: empty events frame yields empty; single event = path") {
    val schema = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double,
      String)].toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    assert(EventOps.userPathsOn(schema).count() === 0L)
    val one = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        7L, "view", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventOps.userPathsOn(one).as[(String, Long)].collect()
    assert(out.toSeq === Seq(("view", 1L)))
  }

  test("transitions: single-event users contribute no transitions") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((1L, ts, 7L, "a", 0.0, "{}"), (2L, ts, 8L, "b", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(EventOps.eventTransitionsOn(ev).count() === 0L)
  }

  test("zorder pruning: selective predicates actually prune") {
    val out = CoreQueries.q143ZorderPruning(spark, sf0001)
      .as[(String, Long, Long, Double)].collect()
    assert(out.length === 3)
    val byName = out.map(r => r._1 -> r).toMap
    // the conjunction can never touch more than either conjunct
    assert(byName("part_and_supp")._3 <= byName("part_100_159")._3)
    assert(byName("part_and_supp")._3 <= byName("supp_10_19")._3)
    out.foreach { case (_, nr, nt, sel) =>
      assert(nt <= nr && sel <= 1.0 && sel >= 0.0)
    }
    // sf0.001's key space yields only ~2 z-ranges and the operator's
    // fixed band straddles their boundary, so prove actual pruning with
    // a predicate that FITS the small key space: a partkey window inside
    // one range must skip the other(s)
    val profile = CoreQueries.q132ZorderLayout(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(profile.length >= 2)
    val touched = profile.count(r => !(r._4 < 0 || r._3 > 50))
    assert(touched < profile.length, "part in [0,50] should prune")
  }
}
