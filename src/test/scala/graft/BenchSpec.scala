package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's output contract without spinning up a session: exactly
  * one full per-query line keyed `"metric":"total"`, exactly one compact
  * `"metric":"total_summary"` line LAST (the driver tails stdout, so the
  * final bytes must always carry the headline), failed queries negative
  * and excluded from the total, and the median statistic itself.
  */
class BenchSpec extends AnyFunSuite {

  test("renderLines: one total line, one trailing total_summary line") {
    val lines = Bench.renderLines(
      Map("q1" -> 1.5, "q2" -> 2.5), Nil, "/root/testdata/sf0.1")
    assert(lines.size === 2)
    assert(lines.count(_.contains("\"metric\":\"total\"")) === 1)
    assert(lines.count(_.contains("\"metric\":\"total_summary\"")) === 1)
    assert(lines.last.contains("\"metric\":\"total_summary\""))
    assert(lines.head.contains("\"queries\":{\"q1\":1.5,\"q2\":2.5}"))
    assert(lines.head.contains("\"value\":4.0"))
    assert(lines.last.contains("\"n_queries\":2"))
    assert(lines.last.contains("\"n_failed\":0"))
  }

  test("renderLines: failed queries are negative markers, excluded from the total") {
    val lines = Bench.renderLines(
      Map("ok" -> 2.0, "broken" -> -3.0), Seq("broken"), "sf")
    assert(lines.head.contains("\"broken\":-3.0"))
    assert(lines.head.contains("\"value\":2.0")) // not shrunk, not inflated
    assert(lines.head.contains("\"failed\":[\"broken\"]"))
    assert(lines.last.contains("\"n_failed\":1"))
  }

  test("renderLines: partially-failed queries surface in flaky, not just stderr") {
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf", flaky = Seq("q"))
    assert(lines.head.contains("\"flaky\":[\"q\"]"))
    assert(lines.last.contains("\"n_flaky\":1"))
    // absent when clean
    val clean = Bench.renderLines(Map("q" -> 1.0), Nil, "sf")
    assert(clean.head.contains("\"flaky\":[]"))
  }

  test("jsonStr: quotes and backslashes in interpolated values cannot corrupt the line") {
    assert(Bench.jsonStr("""r5 "final" \x""") === """r5 \"final\" \\x""")
    val lines = Bench.renderLines(Map("q" -> 1.0), Nil, "sf\"dir")
    assert(lines.head.contains("\"sf\":\"sf\\\"dir\""))
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
