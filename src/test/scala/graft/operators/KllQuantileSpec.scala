package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** KLL vs the q327 deterministic coreset (VERDICT r14 item 9): the
  * production randomized sketch must land inside its advertised rank
  * error on the real corpus, and the A/B records where each design
  * wins — KLL on space (fixed ~3 KB/partition at any corpus size, vs
  * the coreset's O(shards·1000) rows), the coreset on determinism
  * (cross-engine gateable, which is why q327 is the oracle-gated one).
  */
class KllQuantileSpec extends SparkSpecBase {

  test("KLL p50/p90/p99 rank error on events.value stays inside the k=200 envelope and near the q327 coreset") {
    val ev = graft.Tables.events(spark, sf0001)
      .select(round(col("value") * 100, 0).cast("long").as("v_c"))
      .localCheckpoint()
    val n = ev.count()
    val est = KllQuantiles.quantiles(ev, "v_c", Seq(50, 90, 99))
    // measured rank of each estimate via the exact ECDF
    def rankOf(v: Double): Long =
      ev.filter(col("v_c") <= lit(v)).count()
    // k=200 single-sketch eps is ~1.65% at 99% confidence; partitioned
    // merge keeps the bound. Assert a generous 2x envelope so the
    // randomized compaction can never flake the suite.
    val envelope = math.max(1L, (0.033 * n).toLong)
    Seq(50, 90, 99).foreach { p =>
      val target = (p.toLong * n + 99) / 100
      val err = math.abs(rankOf(est(p)) - target)
      assert(err <= envelope,
        s"p$p: KLL rank error $err exceeds envelope $envelope (n=$n)")
    }
    // the q327 coreset's measured error on the same corpus is bounded
    // by its OWN output column — both sketches answer within their
    // stated envelopes on the same data
    val coreset = EventOps.quantileSketchMergeOn(
      graft.Tables.events(spark, sf0001)).collect()
    coreset.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5),
        s"q327 coreset left its bound: $r")
    }
  }

  test("KLL merge law: the merged sketch answers like a single-pass sketch within the envelope") {
    val spark0 = spark
    import spark0.implicits._
    val xs = (1 to 20000).map(_.toDouble)
    val df8 = xs.toDF("v").repartition(8)
    val df1 = xs.toDF("v").coalesce(1)
    val q8 = KllQuantiles.quantiles(df8, "v", Seq(50, 90, 99))
    val q1 = KllQuantiles.quantiles(df1, "v", Seq(50, 90, 99))
    Seq(50, 90, 99).foreach { p =>
      val tgt = p / 100.0 * 20000
      assert(math.abs(q8(p) - tgt) <= 0.033 * 20000,
        s"merged p$p=${q8(p)} far from $tgt")
      assert(math.abs(q1(p) - tgt) <= 0.033 * 20000,
        s"single p$p=${q1(p)} far from $tgt")
    }
  }

  test("NULLs in the value column are skipped, not an executor NPE") {
    val withNulls = spark.range(1000)
      .select(org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") % 10 === 0, null)
        .otherwise(org.apache.spark.sql.functions.col("id"))
        .cast("double").as("v"))
    val sk = KllQuantiles.sketch(withNulls, "v")
    assert(sk.getN === 900L, "exactly the non-null rows must be sketched")
  }
}
