package graft

class ViewsSpec extends SparkSpecBase {

  test("SQL-over-views ≡ DSL: the flagship query phrased both ways") {
    val dsl = operators.CoreQueries.q02TopNations(spark, sf0001)
    val sql = Views.sql(spark, sf0001,
      """SELECT n_name, count(*) AS order_cnt,
             round(sum(o_totalprice), 2) AS total_spend
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY order_cnt DESC, n_name LIMIT 5""")
    assert(sql.collect().map(_.toSeq).toSeq === dsl.collect().map(_.toSeq).toSeq)
  }

  test("events view is nanos-safe in SQL") {
    val n = Views.sql(spark, sf0001,
      "SELECT count(*) FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'")
      .head().getLong(0)
    assert(n === 1000)
  }
}
