package graft

/** Smoke gate over every declared query: runs on sf0.001 and asserts
  * non-empty, deterministic output (two evaluations hash identically).
  * The value-level gate is the driver's DuckDB compare (tools/check_oracle.py).
  */
class QueriesSpec extends SparkSpecBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every query has an oracle — no silent downgrade to rows-only checks") {
    // the driver records only a weak rows>0 check for a query without an
    // oracleSql entry; this repo's contract is that EVERY query is
    // oracle-gated, so an omission is a build error, not a quiet default
    val unorcled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unorcled.isEmpty, s"queries without oracleSql: $unorcled")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name: non-empty + deterministic on sf0.001") {
      val a = fn(spark, sf0001).collect()
      assert(a.nonEmpty, s"$name returned 0 rows")
      val b = fn(spark, sf0001).collect()
      assert(a.toSeq === b.toSeq, s"$name is non-deterministic")
    }
  }
}
