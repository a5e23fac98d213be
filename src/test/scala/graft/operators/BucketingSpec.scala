package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpecBase {

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
}
