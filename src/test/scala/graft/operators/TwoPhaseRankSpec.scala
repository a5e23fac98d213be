package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TwoPhaseRank ≡ the naive global window, proven on fixtures that
  * exercise the hazards: ties in the value column (must share a bucket
  * and break on the tie column), descending order, a running sum, the
  * min==max degenerate range, and nBuckets=1 (everything in one
  * bucket — the naive window itself).
  */
class TwoPhaseRankSpec extends SparkSpecBase {
  import spark.implicits._

  // 40 rows, heavy ties (values mod 7), deterministic
  private def fixture = (1 to 40)
    .map(i => ((i * 13) % 7 * 100L, i.toLong))
    .toDF("v", "id")

  private def naive(desc: Boolean) = {
    val ord = if (desc) Seq($"v".desc, $"id".asc) else Seq($"v".asc, $"id".asc)
    val w = Window.orderBy(ord: _*)
    fixture
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"v".cast("decimal(38,0)")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,0)"))
      .select("v", "id", "r", "cum")
  }

  private def check(desc: Boolean, nBuckets: Int): Unit = {
    val got = TwoPhaseRank.rankBy(fixture, "v", "id",
      descending = desc, cumCol = Some("v"), nBuckets = nBuckets)
      .select("v", "id", "r", "cum")
    assert(got.exceptAll(naive(desc)).isEmpty &&
      naive(desc).exceptAll(got).isEmpty,
      s"desc=$desc nBuckets=$nBuckets diverges from the naive window")
  }

  test("ascending rank + cumsum ≡ naive window (ties on value)") {
    check(desc = false, nBuckets = 16)
  }

  test("descending rank + cumsum ≡ naive window (ties on value)") {
    check(desc = true, nBuckets = 16)
  }

  test("nBuckets=1 degenerates to the naive window") {
    check(desc = false, nBuckets = 1)
  }

  test("more buckets than distinct values still exact") {
    check(desc = true, nBuckets = 4096)
  }

  test("min==max (all-equal values): one bucket, rank = tie order") {
    val df = Seq((5L, 3L), (5L, 1L), (5L, 2L)).toDF("v", "id")
    val got = TwoPhaseRank.rankBy(df, "v", "id").orderBy("r")
      .select($"id", $"r").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("rank without cumCol attaches only r") {
    val cols = TwoPhaseRank.rankBy(fixture, "v", "id").columns.toSeq
    assert(cols === Seq("v", "id", "r"))
  }

  test("tie skew: a 90%-one-value frame spreads across buckets, ranks stay exact (VERDICT r12 item 1)") {
    // the r12 documented hole: value-only bucketing forced every row
    // equal in v into ONE bucket, so a dominant value re-created the
    // single-task frame. Compound-key range boundaries cut BETWEEN the
    // ties at id points instead.
    val n = 10000
    val df = ((1 to (n * 9 / 10)).map(i => (100L, i.toLong)) ++
      ((n * 9 / 10 + 1) to n).map(i => (i.toLong % 97 * 10, i.toLong)))
      .toDF("v", "id")
    val nBuckets = 32
    val sizes = TwoPhaseRank
      .bucketize(df, "v", "id", descending = false, nBuckets)
      .groupBy("_bkt").count().select("count").as[Long].collect()
    val mean = n.toDouble / nBuckets
    assert(sizes.max <= 2 * mean,
      s"worst bucket ${sizes.max} rows exceeds 2x the ${mean}-row mean")
    assert(sizes.length >= nBuckets / 2,
      s"only ${sizes.length} non-empty buckets of $nBuckets")
    // and the ranks/cumsums stay exactly the naive window's
    val w = Window.orderBy($"v".asc, $"id".asc)
    val naive = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"v".cast("decimal(38,0)")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("decimal(38,0)"))
    val got = TwoPhaseRank.rankBy(df, "v", "id", cumCol = Some("v"),
      nBuckets = nBuckets).select("v", "id", "r", "cum")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }
}
