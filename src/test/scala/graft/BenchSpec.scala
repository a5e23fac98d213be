package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's output contract without spinning up a session: the
  * compact `"metric":"total_summary"` line printed FIRST and LAST
  * (identical — the driver captures a stdout window and has truncated
  * the big line mid-JSON from either edge), exactly one rep-1 line keyed
  * `"metric":"total_cold"` and then one warm per-query line keyed
  * `"metric":"total"` between them (split so each stays inside the
  * tail window; warm LAST so the driver's end-anchored tail reads the
  * warm medians, not the r9 cold-dict misread), cold totals next to the warm medians, failed queries
  * negative and excluded from the totals, warm≫cold load-spike
  * inversions flagged as `suspect`, the run's start/end load average,
  * 3dp durations, and the median statistic itself.
  */
class BenchSpec extends AnyFunSuite {

  test("renderLines: summary first AND last, cold then warm between") {
    val lines = Bench.renderLines(
      Map("q1" -> 1.5, "q2" -> 2.5), Nil, "/root/testdata/sf0.1",
      cold = Map("q1" -> 2.0, "q2" -> 3.0))
    assert(lines.size === 4)
    assert(lines.count(_.contains("\"metric\":\"total\"")) === 1)
    assert(lines.count(_.contains("\"metric\":\"total_cold\"")) === 1)
    assert(lines.count(_.contains("\"metric\":\"total_summary\"")) === 2)
    assert(lines.head === lines.last) // identical bytes at both edges
    assert(lines(2).contains("\"metric\":\"total\""))
    assert(lines(2).contains("\"queries\":{\"q1\":1.5,\"q2\":2.5}"))
    // per-query cold times ride their OWN line, not the warm line
    assert(!lines(2).contains("\"queries_cold\""))
    assert(lines(1).contains("\"metric\":\"total_cold\""))
    assert(lines(1).contains("\"queries_cold\":{\"q1\":2.0,\"q2\":3.0}"))
    assert(lines(2).contains("\"value\":4.0"))
    assert(lines.head.contains("\"total_cold\":5.0"))
    assert(lines(2).contains("\"total_cold\":5.0"))
    assert(lines(1).contains("\"value\":5.0"))
    assert(lines.last.contains("\"n_queries\":2"))
    assert(lines.last.contains("\"n_failed\":0"))
  }

  test("renderLines: failed queries are negative markers, excluded from both totals") {
    val lines = Bench.renderLines(
      Map("ok" -> 2.0, "broken" -> -3.0), Seq("broken"), "sf",
      cold = Map("ok" -> 4.0, "broken" -> -3.0))
    assert(lines(2).contains("\"broken\":-3.0"))
    assert(lines(2).contains("\"value\":2.0")) // not shrunk, not inflated
    assert(lines(2).contains("\"total_cold\":4.0"))
    assert(lines(2).contains("\"failed\":[\"broken\"]"))
    assert(lines.last.contains("\"n_failed\":1"))
  }

  test("renderLines: partially-failed queries surface in flaky, not just stderr") {
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf", flaky = Seq("q"))
    assert(lines(2).contains("\"flaky\":[\"q\"]"))
    assert(lines.last.contains("\"n_flaky\":1"))
    // absent when clean
    val clean = Bench.renderLines(Map("q" -> 1.0), Nil, "sf")
    assert(clean(2).contains("\"flaky\":[]"))
  }

  test("renderLines: load average rides summary and warm lines") {
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf",
      cold = Map("q" -> 1.0), load = (3.25, 12.5))
    assert(lines.head.contains("\"load\":{\"start\":3.25,\"end\":12.5}"))
    assert(lines(2).contains("\"load\":{\"start\":3.25,\"end\":12.5}"))
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
    assert(lines(2).contains("\"suspect\":[\"q65\"]"))
    assert(lines.head.contains("\"n_suspect\":1"))
  }

  test("loadAvg: reads a plausible non-negative load on this platform") {
    assert(Bench.loadAvg() >= 0.0)
  }

  test("r3: 3dp durations; a fast failure keeps its negative sentinel") {
    assert(Bench.r3(52.46395232399998) === 52.464)
    assert(Bench.r3(0.0004) === 0.0)    // sub-ms success rounds to zero
    assert(Bench.r3(-0.0004) === -0.001) // failure sign must survive
    val lines = Bench.renderLines(
      Map("q" -> 1.23456789), Nil, "sf", cold = Map("q" -> 1.98765432))
    assert(lines(2).contains("\"q\":1.235"))
    assert(lines(1).contains("\"queries_cold\":{\"q\":1.988}"))
  }

  test("jsonStr: quotes and backslashes in interpolated values cannot corrupt the line") {
    assert(Bench.jsonStr("""r5 "final" \x""") === """r5 \"final\" \\x""")
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf\"dir")
    assert(lines(2).contains("\"sf\":\"sf\\\"dir\""))
  }

  test("median: odd and even samples, order-insensitive") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(5.0)) === 5.0)
    // even n takes the lower middle — never averages two noisy runs into
    // a time nobody measured
    assert(Bench.median(Seq(4.0, 1.0)) === 1.0)
    intercept[IllegalArgumentException](Bench.median(Nil))
  }
}
