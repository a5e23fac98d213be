package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's output contract without spinning up a session: stdout
  * must fit COMPLETELY inside the driver's 2000-char tail window at any
  * registry size — the compact `"metric":"total_summary"` line printed
  * FIRST and LAST (identical bytes) around exactly one
  * `"metric":"total"` line whose `queries` map is capped at the TopK
  * slowest warm medians plus failed sentinels, with a `"full"` pointer
  * at the committed artifacts (BENCH_LOCAL.json / bench_history.jsonl)
  * that carry the complete warm+cold maps via [[Bench.fullLine]].
  * r2/r4/r6 truncated one combined line mid-JSON, r9's split captured
  * the wrong dict, r11's 305-query warm dict overflowed the window
  * again — the invariant is now "no unbounded map ever reaches stdout".
  */
class BenchSpec extends AnyFunSuite {

  test("renderLines: summary first AND last, capped total line between") {
    val lines = Bench.renderLines(
      Map("q1" -> 1.5, "q2" -> 2.5), Nil, "/root/testdata/sf0.1",
      cold = Map("q1" -> 2.0, "q2" -> 3.0))
    assert(lines.size === 3)
    assert(lines.count(_.contains("\"metric\":\"total\"")) === 1)
    assert(lines.count(_.contains("\"metric\":\"total_summary\"")) === 2)
    assert(lines.head === lines.last) // identical bytes at both edges
    assert(lines(1).contains("\"metric\":\"total\""))
    // small registries ride whole; slowest first
    assert(lines(1).contains("\"queries\":{\"q2\":2.5,\"q1\":1.5}"))
    assert(lines(1).contains("\"full\":\"bench_history.jsonl\""))
    // per-query cold times live ONLY in the committed artifacts
    assert(!lines(1).contains("\"queries_cold\""))
    assert(lines(1).contains("\"value\":4.0"))
    assert(lines.head.contains("\"total_cold\":5.0"))
    assert(lines(1).contains("\"total_cold\":5.0"))
    assert(lines.last.contains("\"n_queries\":2"))
    assert(lines.last.contains("\"n_failed\":0"))
  }

  test("renderLines/fullLine: a run that started above the load gate carries load_exceeded on every payload") {
    val lines = Bench.renderLines(
      Map("q1" -> 1.5), Nil, "sf", load = (7.13, 6.5),
      loadWaitedSec = 300, loadExceeded = true)
    // the flag rides the SUMMARY line — the first thing the driver's
    // stdout tail shows — and the waited seconds stay alongside
    assert(lines.head.contains("\"load_exceeded\":true"))
    assert(lines.head.contains("\"waited\":300"))
    assert(lines(1).contains("\"load_exceeded\":true"))
    val big = Bench.fullLine(Map("q1" -> 1.5), Nil, "sf",
      load = (7.13, 6.5), loadExceeded = true)
    assert(big.contains("\"load_exceeded\":true"))
    // a clean run never carries the flag
    val clean = Bench.renderLines(Map("q1" -> 1.5), Nil, "sf",
      load = (0.5, 0.6))
    assert(!clean.mkString.contains("load_exceeded"))
  }

  test("renderLines: stdout payload stays inside the 2000-char driver tail at 1000 queries") {
    val results = (1 to 1000).map(i => f"q$i%03d_some_longish_name" -> i / 100.0).toMap
    val cold = results.map { case (k, v) => k -> v * 1.5 }
    val lines = Bench.renderLines(results, Nil, "/root/testdata/sf0.1",
      cold = cold, load = (31.25, 28.5))
    val payload = lines.mkString("\n") + "\n"
    assert(payload.length < 2000,
      s"stdout payload ${payload.length} chars overflows the 2000-char tail")
    // the capped map carries exactly TopK entries, the slowest ones
    assert(lines(1).contains("\"n_top\":" + Bench.TopK))
    assert(lines(1).contains("\"q1000_some_longish_name\":10.0"))
    assert(!lines(1).contains("\"q001_some_longish_name\""))
  }

  test("renderLines: failed sentinels always ride the capped line and totals exclude them") {
    // 30 slow successes would fill TopK; the failed query must STILL be
    // visible in stdout with its negative marker
    val ok = (1 to 30).map(i => s"ok$i" -> (10.0 + i)).toMap
    val results = ok + ("broken" -> -0.2)
    val lines = Bench.renderLines(results, Seq("broken"), "sf",
      cold = results)
    assert(lines(1).contains("\"broken\":-0.2"))
    assert(lines(1).contains("\"failed\":[\"broken\"]"))
    assert(lines.last.contains("\"n_failed\":1"))
    val total = ok.values.sum
    assert(lines(1).contains(s"\"value\":$total")) // not shrunk, not inflated
  }

  test("fullLine: complete warm AND cold maps in one parseable object") {
    val big = Bench.fullLine(
      Map("q1" -> 1.5, "q2" -> -2.5), Seq("q2"), "sf",
      flaky = Seq("q1"), cold = Map("q1" -> 2.0, "q2" -> -2.5),
      load = (1.0, 2.0))
    assert(big.contains("\"queries\":{\"q1\":1.5,\"q2\":-2.5}"))
    assert(big.contains("\"queries_cold\":{\"q1\":2.0,\"q2\":-2.5}"))
    assert(big.contains("\"value\":1.5"))
    assert(big.contains("\"total_cold\":2.0"))
    assert(big.contains("\"failed\":[\"q2\"]"))
    assert(big.contains("\"flaky\":[\"q1\"]"))
    assert(big.endsWith("}") && big.startsWith("{"))
  }

  test("renderLines: partially-failed queries surface in flaky, not just stderr") {
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf", flaky = Seq("q"))
    assert(lines(1).contains("\"flaky\":[\"q\"]"))
    assert(lines.last.contains("\"n_flaky\":1"))
    // absent when clean
    val clean = Bench.renderLines(Map("q" -> 1.0), Nil, "sf")
    assert(clean(1).contains("\"flaky\":[]"))
  }

  test("renderLines: load average rides summary and total lines") {
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf",
      cold = Map("q" -> 1.0), load = (3.25, 12.5))
    assert(lines.head.contains("\"load\":{\"start\":3.25,\"end\":12.5}"))
    assert(lines(1).contains("\"load\":{\"start\":3.25,\"end\":12.5}"))
  }

  test("suspects: warm median > 2x successful cold rep flags a load-spike inversion") {
    // the BENCH_r06 q65 signature: warm 5.08 vs cold 1.53
    val results = Map("q65" -> 5.08, "ok" -> 1.5, "edge" -> 2.0,
      "coldfail" -> 9.0)
    val cold = Map("q65" -> 1.53, "ok" -> 1.4, "edge" -> 1.0,
      "coldfail" -> -3.0)
    // edge: exactly 2x is NOT suspect (strict >); a failed cold rep
    // (negative) can never flag its query
    assert(Bench.suspects(results, cold) === Seq("q65"))
    val lines = Bench.renderLines(results, Nil, "sf", cold = cold)
    assert(lines(1).contains("\"suspect\":[\"q65\"]"))
    assert(lines.head.contains("\"n_suspect\":1"))
  }

  test("loadAvg: reads a plausible non-negative load on this platform") {
    assert(Bench.loadAvg() >= 0.0)
  }

  test("renderLines: a mass-failure run still fits the 2000-char tail (sentinels and name lists capped)") {
    val results = (1 to 900).map(i => f"q$i%03d_some_longish_name" -> -(i / 100.0)).toMap ++
      (1 to 100).map(i => f"ok$i%03d_some_longish_name" -> (i / 100.0)).toMap
    val failed = results.keys.filter(_.startsWith("q")).toSeq
    val flaky = (1 to 100).map(i => f"ok$i%03d_some_longish_name")
    val lines = Bench.renderLines(results, failed, "sf", flaky = flaky,
      cold = results, load = (31.25, 28.5))
    val payload = lines.mkString("\n") + "\n"
    assert(payload.length < 2000,
      s"mass-failure stdout payload ${payload.length} chars overflows the tail")
    // explicit truncation markers + true magnitudes in the summary
    assert(""""\+\d+ more"""".r.findFirstIn(lines(1)).isDefined)
    assert(lines.head.contains("\"n_failed\":900"))
    assert(lines.head.contains("\"n_flaky\":100"))
  }

  test("renderLines: a load-gated run records how long it waited") {
    val waited = Bench.renderLines(Map("q" -> 1.0), Nil, "sf",
      cold = Map("q" -> 1.0), load = (3.0, 3.5), loadWaitedSec = 45)
    assert(waited.head.contains("\"load\":{\"start\":3.0,\"end\":3.5,\"waited\":45}"))
    // absent when the gate never triggered (keeps the r12 line shape)
    val clean = Bench.renderLines(Map("q" -> 1.0), Nil, "sf",
      cold = Map("q" -> 1.0), load = (3.0, 3.5))
    assert(clean.head.contains("\"load\":{\"start\":3.0,\"end\":3.5}"))
  }

  test("waitForLoad: returns immediately when load is already below the gate") {
    assert(Bench.waitForLoad(maxLoad = 1e9, maxWaitSec = 60) === 0)
  }

  test("r3: 3dp durations; a fast failure keeps its negative sentinel") {
    assert(Bench.r3(52.46395232399998) === 52.464)
    assert(Bench.r3(0.0004) === 0.0)    // sub-ms success rounds to zero
    assert(Bench.r3(-0.0004) === -0.001) // failure sign must survive
    val lines = Bench.renderLines(
      Map("q" -> 1.23456789), Nil, "sf", cold = Map("q" -> 1.98765432))
    assert(lines(1).contains("\"q\":1.235"))
    val big = Bench.fullLine(
      Map("q" -> 1.23456789), Nil, "sf", cold = Map("q" -> 1.98765432))
    assert(big.contains("\"queries_cold\":{\"q\":1.988}"))
  }

  test("jsonStr: quotes and backslashes in interpolated values cannot corrupt the line") {
    assert(Bench.jsonStr("""r5 "final" \x""") === """r5 \"final\" \\x""")
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf\"dir")
    assert(lines(1).contains("\"sf\":\"sf\\\"dir\""))
  }

  test("median: odd and even samples, order-insensitive") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(5.0)) === 5.0)
    // even n takes the lower middle — never averages two noisy runs into
    // a time nobody measured
    assert(Bench.median(Seq(4.0, 1.0)) === 1.0)
    intercept[IllegalArgumentException](Bench.median(Nil))
  }

  test("commonDelta: intersects on successful times only; sums and median ratio are over the common set") {
    val now = Map("a" -> 2.0, "b" -> 1.0, "c" -> -0.5, "new" -> 9.0)
    val base = Map("a" -> 1.0, "b" -> 2.0, "c" -> 1.0, "gone" -> 5.0)
    // common successful set = {a, b}: c failed NOW, "new"/"gone" are
    // registry growth/shrink — neither may pollute the comparison
    val d = Bench.commonDelta(now, base, "r15").get
    assert(d.n === 2)
    assert(d.sumBase === 3.0 && d.sumNow === 3.0)
    // ratios {2.0, 0.5} -> lower-middle median 0.5
    assert(d.medianRatio === 0.5)
    assert(d.json.contains("\"base\":\"r15\"") &&
      d.json.contains("\"sum_ratio\":1.0") &&
      d.json.contains("\"median_ratio\":0.5"))
    // zero overlap -> no delta, never a division by nothing
    assert(Bench.commonDelta(Map("x" -> 1.0), base, "r15").isEmpty)
  }

  test("historyBaseline: last line wins by default, round filter selects, corrupt lines are skipped") {
    val f = java.nio.file.Files.createTempFile("bench-hist", ".jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"round":"r14","metric":"total","queries":{"q1":1.0,"q2":2.0}}""",
      """not json at all""",
      """{"round":"r15","metric":"total","queries":{"q1":1.5}}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val last = Bench.historyBaseline(f.toString, None).get
    assert(last._1 === "r15" && last._2 === Map("q1" -> 1.5))
    val picked = Bench.historyBaseline(f.toString, Some("r14")).get
    assert(picked._1 === "r14" && picked._2 === Map("q1" -> 1.0, "q2" -> 2.0))
    assert(Bench.historyBaseline(f.toString, Some("r99")).isEmpty)
    assert(Bench.historyBaseline("/nonexistent/hist.jsonl", None).isEmpty)
  }

  test("historyBaseline anchors to the last CLEAN line: ambient/load-poisoned lines are skipped by default but selectable by round") {
    // VERDICT r17 item 2: the c32 headline compared against the most
    // recent line, which was itself ambient-stamped — a polluted
    // baseline masks a polluted run. Default must skip BOTH poison
    // stamps; an explicit round filter may still pick them.
    val f = java.nio.file.Files.createTempFile("bench-hist2", ".jsonl")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      """{"round":"clean1","metric":"total","queries":{"q1":1.0}}""",
      """{"round":"amb","metric":"total","queries":{"q1":9.0},"ambient_inflated":true}""",
      """{"round":"hot","metric":"total","queries":{"q1":8.0},"load":{"start":9.0,"end":9.0,"load_exceeded":true}}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    val d = Bench.historyBaseline(f.toString, None).get
    assert(d._1 === "clean1" && d._2 === Map("q1" -> 1.0))
    assert(Bench.historyBaseline(f.toString, Some("amb")).get._2 === Map("q1" -> 9.0))
    // ALL lines polluted -> fall back to the last one rather than none
    val f2 = java.nio.file.Files.createTempFile("bench-hist3", ".jsonl")
    java.nio.file.Files.write(f2, java.util.Arrays.asList(
      """{"round":"amb1","metric":"total","queries":{"q1":9.0},"ambient_inflated":true}""",
      """{"round":"amb2","metric":"total","queries":{"q1":8.0},"ambient_inflated":true}"""),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(Bench.historyBaseline(f2.toString, None).get._1 === "amb2")
  }

  test("common_set rides the summary, total, and durable payload lines when a baseline exists") {
    val d = Bench.commonDelta(Map("q1" -> 1.0), Map("q1" -> 2.0), "r15")
    val lines = Bench.renderLines(Map("q1" -> 1.0), Nil, "sf", common = d)
    assert(lines.head.contains("\"common_set\":{\"base\":\"r15\",\"n\":1"))
    assert(lines(1).contains("\"common_set\""))
    assert(lines.head === lines.last)
    val big = Bench.fullLine(Map("q1" -> 1.0), Nil, "sf", common = d)
    assert(big.contains("\"common_set\"") &&
      big.contains("\"median_ratio\":0.5"))
    // no baseline -> the field is absent, not null/empty
    assert(!Bench.renderLines(Map("q1" -> 1.0), Nil, "sf")
      .mkString.contains("common_set"))
  }

  test("ambient_inflated stamps a uniformly-inflated run and stays absent on clean or genuinely-mixed runs") {
    // r16's polluted headline: median common-set ratio 1.103 with zero
    // code delta — the flag the payload must carry
    val hot = Bench.commonDelta(
      Map("a" -> 1.12, "b" -> 1.10, "c" -> 1.15),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), "r16")
    assert(Bench.ambientInflated(hot, loadExceeded = false))
    // one real per-query regression moves SOME ratios, not the median
    val mixed = Bench.commonDelta(
      Map("a" -> 3.0, "b" -> 1.0, "c" -> 1.0),
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), "r16")
    assert(!Bench.ambientInflated(mixed, loadExceeded = false))
    // the load gate giving up poisons the run regardless of the delta
    assert(Bench.ambientInflated(None, loadExceeded = true))
    assert(!Bench.ambientInflated(None, loadExceeded = false))
    val lines = Bench.renderLines(Map("q1" -> 1.0), Nil, "sf",
      common = hot, ambient = true)
    assert(lines.head.contains("\"ambient_inflated\":true"))
    assert(lines(1).contains("\"ambient_inflated\":true"))
    assert(Bench.fullLine(Map("q1" -> 1.0), Nil, "sf", ambient = true)
      .contains("\"ambient_inflated\":true"))
    assert(!Bench.renderLines(Map("q1" -> 1.0), Nil, "sf")
      .mkString.contains("ambient_inflated"))
  }

  test("cache telemetry rides the payloads: compact totals on stdout, per-query rebuilds on the durable line") {
    val cs = Bench.CacheStats(12, 5, 3,
      Map("q340_eps" -> 2L, "q113_pr" -> 1L, "q01" -> 0L))
    val lines = Bench.renderLines(Map("q1" -> 1.0), Nil, "sf",
      cache = Some(cs))
    assert(lines.head.contains(
      "\"cache\":{\"admissions\":12,\"evictions\":5,\"rebuilds\":3}"))
    // stdout stays bounded: the per-query map never rides it
    assert(!lines.mkString.contains("rebuilds_by_query"))
    val big = Bench.fullLine(Map("q1" -> 1.0), Nil, "sf",
      cache = Some(cs))
    // zero-rebuild queries are dropped; survivors sort by name
    assert(big.contains("\"rebuilds_by_query\":{\"q113_pr\":1,\"q340_eps\":2}"))
    assert(!Bench.renderLines(Map("q1" -> 1.0), Nil, "sf")
      .mkString.contains("\"cache\""))
  }
}
