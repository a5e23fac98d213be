package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pushdown (VERDICT r12 item 3): the one
  * modern Spark scan-reduction lever the registry didn't exercise. On a
  * fact⋈dim shuffle join where the dim carries a selective filter,
  * Catalyst's InjectRuntimeFilter can build a Bloom filter from the dim
  * side's join keys and apply it as a `might_contain` predicate on the
  * FACT side below the shuffle — the read-side complement of the skew
  * work: at 100 TB the filter prunes fact rows at the scan, before they
  * are hashed, serialized, and shuffled, for the price of one aggregate
  * over the (already filtered, delta-sized) dim keys.
  *
  * These pins run with the injection thresholds lowered
  * (`applicationSideScanSizeThreshold` defaults to 10GB — nothing at
  * test scale qualifies) and broadcast off, because injection requires
  * a shuffle on the application side to amortize against; production
  * defaults only fire where the 100 TB story actually holds.
  * ScalingBench's `bloom_filter` A/B measures the same shape on/off at
  * sf0.1 with result-checksum equality.
  */
class BloomFilterJoinSpec extends SparkSpecBase {

  /** The q02/q159 family shape: lineitem ⋈ selectively-filtered orders. */
  private def shape(dir: String): DataFrame = {
    val li = graft.Tables.lineitem(spark, dir)
    val sel = graft.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"))
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val conf = spark.conf
    val saved = pairs.map { case (k, _) => k -> conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter on the fact side; results identical on/off") {
    var on: Array[org.apache.spark.sql.Row] = Array.empty
    var off: Array[org.apache.spark.sql.Row] = Array.empty
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val df = shape(sf0001)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter (might_contain) in the optimized plan:\n$plan")
      // the filter lands on the FACT side, sourced from a dim-side
      // aggregate subquery — i.e. below the shuffle, not after the join
      on = df.orderBy("l_returnflag").collect()
    }
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
      val df = shape(sf0001)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("might_contain"))
      off = df.orderBy("l_returnflag").collect()
    }
    assert(on.nonEmpty && on.toSeq === off.toSeq,
      "bloom-filter injection changed the result")
  }

  test("no injection without a selective dim filter (the filter is the whole point)") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val li = graft.Tables.lineitem(spark, sf0001)
      val ord = graft.Tables.orders(spark, sf0001)
      val df = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("might_contain"),
        "an unfiltered dim must not pay a bloom build that prunes nothing")
    }
  }
}
