package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bucketed join plans with no shuffle exchange; plain join shuffles") {
    val o = graft.Tables.orders(spark, sf0001)
    val l = graft.Tables.lineitem(spark, sf0001)
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse dirs survive — clear both before writing
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete())
        dir.delete()
      }
    }
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(l, "b_lineitem", "l_orderkey", 8)

    val bucketed = Bucketing.bucketJoin(spark, "b_orders", "b_lineitem",
      "o_orderkey", "l_orderkey")
    assert(!Bucketing.hasShuffle(bucketed),
      "bucket join must not shuffle:\n" + bucketed.queryExecution.executedPlan)

    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
    assert(Bucketing.hasShuffle(plain) ||
      plain.queryExecution.executedPlan.toString.contains("Broadcast"))

    // same results either way
    assert(bucketed.count() === plain.count())
  }

  test("q148: bucketed rollup ≡ plain-join rollup; join stage shuffle-free") {
    val got = Bucketing.q148BucketedJoin(spark, sf0001)
      .as[(String, Long, Double)].collect().toSeq
    val want = graft.Tables.orders(spark, sf0001)
      .join(graft.Tables.lineitem(spark, sf0001),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("o_orderpriority"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // the underlying bucket join itself plans without an Exchange
    val join = Bucketing.bucketJoin(spark, "graft_q148_orders",
      "graft_q148_lineitem", "o_orderkey", "l_orderkey")
    assert(!Bucketing.hasShuffle(join))
  }
}
