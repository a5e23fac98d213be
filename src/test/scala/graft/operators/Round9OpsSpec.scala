package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Hand fixtures for the round-9 operators — boundary semantics the
  * corpus-level oracle gate cannot isolate: the winnowing window rule
  * and its shared-run guarantee, prefix-group clamping, the burst
  * frame's inclusive 600-second edge, and the df-drift floor.
  */
class Round9OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("winnowing: shared run of >= w+k-1 tokens shares a fingerprint; short doc selects its global min") {
    // k=4, w=5: doc A and doc B share an 8-token run (= w+k-1), so the
    // guarantee says at least one selected fingerprint is common
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three four five six $run", "s1"),
      (2L, s"$run nine ten eleven twelve thirteen fourteen", "s1"),
      // short doc: 5 tokens -> 2 grams < w -> exactly ONE selected fp
      (3L, "p q r s t", "s2"))
      .toDF("doc_id", "text", "source")
    val sketch = DedupOps.winnowingOn(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // s1: two docs sharing a full run -> at least one shared fp
    val (sel1, distinct1, shared1) = sketch("s1")
    assert(shared1 >= 1L, s"no shared fingerprint across the shared run: $sketch")
    assert(distinct1 < sel1 + 1) // sanity: distinct <= selected
    // s2: one doc with 2 grams (< w) -> the single truncated window at
    // pos 0 selects exactly one fp (the global min of its 2 gram hashes)
    val (sel2, distinct2, shared2) = sketch("s2")
    assert(sel2 === 1L && distinct2 === 1L && shared2 === 0L)
  }

  test("prefix boilerplate: 16-token clamp makes shorter docs group by whole text") {
    val p16 = (1 to 16).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p16 unique tail one", "s"),
      (2L, s"$p16 different tail two", "s"),   // same 16-token prefix
      (3L, "short doc", "s"), (4L, "short doc", "s"), // whole-text group
      (5L, "loner", "s"))
      .toDF("doc_id", "text", "source")
    val r = DedupOps.prefixBoilerplateOn(docs).collect().head
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("n_groups") === 3L) // p16 pair, short pair, loner
    assert(r.getAs[Long]("n_docs_shared") === 4L) // 2 + 2
  }

  test("bot burst: the 600-second RANGE edge is inclusive; bands split correctly") {
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: 3 events inside one 10-min span, the last EXACTLY 600 s
    // after the first (inclusive -> in_win = 3 -> band 1)
    // user 2: 2 events 601 s apart (exclusive -> peak 1 -> band 0)
    val ev = Seq(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:05:00")),
      (1L, t("2024-01-01 10:10:00")),
      (2L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:10:01")))
      .toDF("user_id", "ts")
    val bands = EventOps.botBurstOn(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bands(0L) === ((1L, 1L))) // user 2: peak 1
    assert(bands(1L) === ((1L, 3L))) // user 1: peak 3 (inclusive edge)
  }

  test("idf drift: both-halves floor excludes one-sided tokens; ratio is floor division") {
    // 'up' in 5 even + 10 odd docs -> ratio 2e6; every other token is
    // one-sided and must be excluded by the both-halves df floor
    val rows =
      (1 to 5).map(i => (i * 2L, "up x")) ++
      (1 to 10).map(i => (i * 2L + 1L, "up y")) ++
      (1 to 6).map(i => (100L + i * 2L + 1L, "onlyodd z"))
    val df = rows.toDF("doc_id", "text")
    val out = TextAnalysisOps.idfDriftOn(df, minDf = 5L, k = 10).collect()
    val toks = out.map(_.getString(0)).toSet
    assert(toks.contains("up") && !toks.contains("onlyodd"))
    val up = out.find(_.getString(0) == "up").get
    assert(up.getAs[Long]("df_a") === 5L && up.getAs[Long]("df_b") === 10L)
    assert(up.getAs[Long]("ratio_e6") === 2000000L)
  }
}
