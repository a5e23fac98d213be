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

  /** Both evaluations of every query, computed ONCE on a small driver
    * thread pool when the first per-query test runs (r18, VERDICT r17
    * item on the test budget): the 2 × 360 sequential sf0.001
    * executions were ~9 of the suite's 25 minutes, almost all of it
    * per-query fixed cost that parallelizes cleanly — Spark's driver
    * and the session caches are thread-safe, and overlapping
    * independent jobs is the guide §2.6 device. Failures surface in
    * the owning per-query test (an execution error is rethrown there),
    * so granularity of reporting is unchanged.
    */
  private lazy val evals: Map[String, util.Try[(Seq[org.apache.spark.sql.Row],
      Seq[org.apache.spark.sql.Row])]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: concurrent.ExecutionContext =
        concurrent.ExecutionContext.fromExecutorService(pool)
      val futs = SparkEntry.queries.toSeq.map { case (name, fn) =>
        name -> concurrent.Future(util.Try {
          val a = fn(spark, sf0001).collect().toSeq
          val b = fn(spark, sf0001).collect().toSeq
          (a, b)
        })
      }
      futs.map { case (n, f) =>
        n -> concurrent.Await.result(f, concurrent.duration.Duration.Inf)
      }.toMap
    } finally pool.shutdown()
  }

  SparkEntry.queries.keys.foreach { name =>
    test(s"$name: non-empty + deterministic on sf0.001") {
      val (a, b) = evals(name).get // rethrows the query's own failure
      assert(a.nonEmpty, s"$name returned 0 rows")
      assert(a === b, s"$name is non-deterministic")
    }
  }
}
