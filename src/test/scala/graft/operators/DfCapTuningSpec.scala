package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

/** Pins the df-cap decision rule SCALING.md's tuning guide documents:
  * the `effectiveDfCap` clamp at all three regimes and both boundaries,
  * q193's banded profile being the EXACT rollup of the raw df grid it
  * summarizes, and the cap sitting above the testdata's max df — the
  * losslessness witness for every oracle-gated dedup operating point.
  */
class DfCapTuningSpec extends SparkSpecBase {
  import spark.implicits._

  private def capFor(nDocs: Long): Long =
    DedupOps.effectiveDfCap(spark.range(nDocs).toDF("doc_id"))
      .collect().head.getLong(0)

  test("effectiveDfCap = clamp(ceil(0.02 n), 50, 200) at every regime") {
    assert(capFor(100L) === 50L) // floor regime
    assert(capFor(2500L) === 50L) // floor boundary: ceil(50.0) = 50
    assert(capFor(2501L) === 51L) // first linear step
    assert(capFor(5000L) === 100L) // linear regime
    assert(capFor(10000L) === 200L) // ceiling boundary
    assert(capFor(1000000L) === 200L) // ceiling regime (the 100 TB case)
  }

  test("q193's bands are the exact rollup of the raw df grid; cap is lossless here") {
    val raw = DedupOps.cachedNgramHashes(spark, sf0001, 8)
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
    // recompute the band rollup independently from the same raw grid
    val expected = raw
      .select((length(bin(col("df"))) - 1).cast("long").as("b"), col("df"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("ns"), sum(col("df")).as("np"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val profile = DedupOps.shingleDfProfile(spark, sf0001).collect()
    assert(profile.nonEmpty)
    profile.foreach { r =>
      assert(expected(r.getLong(0)) ===
        ((r.getLong(1), r.getLong(2))), s"band ${r.getLong(0)}")
    }
    assert(profile.map(_.getLong(0)).toSet === expected.keySet)
    // losslessness at the oracle-gated operating point: the shipped cap
    // (floor regime at test scale) exceeds every observed df, so the
    // capped postings join drops nothing — the q121 pick-the-bound-
    // above-the-data contract, now pinned to the q193 diagnostic
    val cap = DedupOps.effectiveDfCap(
      graft.Tables.documents(spark, sf0001)).collect().head.getLong(0)
    val maxDf = raw.agg(max(col("df"))).collect().head.getLong(0)
    assert(cap === 50L)
    assert(maxDf <= cap,
      s"max df $maxDf exceeds cap $cap — the cap BINDS on this corpus")
    // and the profile itself says the same thing in band terms: every
    // band sits at or below floor(log2(cap))
    assert(profile.map(_.getLong(0)).max <= 5L) // 2^5..2^6-1 covers df=50
  }
}
