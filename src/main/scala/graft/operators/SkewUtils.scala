package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins: salting. AQE's skew-join split
  * handles sort-merge skew at runtime; explicit salting is the plan-level
  * tool when one side has pathological hot keys (e.g. a null-heavy FK or
  * a mega-city port code at 100 TB) and the other side is small enough to
  * replicate `nSalts`×.
  */
object SkewUtils {

  /** Per-row salt that spreads even byte-identical duplicate rows.
    * Two modes (ADVICE r13):
    *
    *  - DETERMINISTIC (preferred — pass `uniqueCols`, e.g. the row's
    *    event/order id): `xxhash64(uniqueCols) mod nSalts`. A pure
    *    function of row content, so ANY task retry — including a
    *    partial map re-execution after a fetch failure — reproduces
    *    the same salt for the same row. Spreads byte-identical
    *    hot-KEY rows because the unique id differs by contract.
    *
    *  - POSITIONAL (fallback when no unique id exists):
    *    `monotonically_increasing_id mod nSalts` — uniform within
    *    every partition regardless of row content, but the value
    *    depends on row ORDER within the upstream partition. Spark SQL
    *    does NOT propagate expression-level nondeterminism into the
    *    RDD's DeterministicLevel (only round-robin repartition is
    *    specially marked), so when the fact side is itself SHUFFLE
    *    output, a fetch-failure-driven partial map retry can re-salt
    *    rows differently and reducers can observe duplicated or lost
    *    fact rows. Scope it accordingly: safe when the fact side is
    *    read directly from storage (a rerun scan replays the same
    *    files in the same order, so positions are stable) or on a
    *    single machine; at multi-executor scale with a
    *    shuffle-produced fact side, pass `uniqueCols` (PARITY
    *    rule 20).
    *
    * The r11 whole-ROW hash is the one salt never to use: it
    * collapses a hot key whose rows are byte-identical — the
    * null-FK-flood-with-constant-payload shape salting most targets —
    * into ONE bucket, resurrecting the straggler (VERDICT r12).
    */
  private[graft] def rowSalt(nSalts: Int,
      uniqueCols: Seq[Column] = Nil): Column =
    if (uniqueCols.nonEmpty) pmod(xxhash64(uniqueCols: _*), lit(nSalts.toLong))
    else pmod(monotonically_increasing_id(), lit(nSalts.toLong))

  /** Equi-join `fact ⋈ dim` on `key`, spreading each hot fact key over
    * `nSalts` shuffle partitions: the fact side gets a per-row salt
    * (deterministic from `uniqueCols` when given, positional
    * otherwise — see [[rowSalt]] for the retry-safety scoping), the
    * dim side is exploded once per salt value. Result-identical to
    * the unsalted join.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      nSalts: Int, joinType: String = "inner",
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(nSalts > 0)
    // outer types that preserve unmatched DIM rows would emit them once
    // per salt replica — not expressible under salting without a dedupe
    require(Set("inner", "left", "left_outer", "leftouter")(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      rowSalt(nSalts, uniqueCols.map(fact(_))))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"), joinType)
      .drop(saltedDim(key))
      .drop(saltedFact("__salt")).drop(saltedDim("__salt"))
  }

  /** The hot keys of `df.key` by exact count threshold — the one-pass
    * detection feeding [[saltedFactJoin]]. Hot keys are FEW by
    * definition (a key set that is mostly hot is not skew, it is
    * volume), so the result broadcasts; map-side partial counting
    * makes the pass itself skew-proof.
    */
  def detectHotKeys(df: DataFrame, key: String, minCount: Long): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount).select(col(key))

  /** Hot-key-partial salted FACT⋈FACT equi-join — the explicit
    * counterpart of AQE's runtime skew-join split (ScalingBench's
    * `skew_join` A/B measures all three ways). [[saltedJoin]] replicates
    * the whole dim side `nSalts`×, which is wrong when BOTH sides are
    * facts; here only the HOT slice is treated: hot keys (a broadcast
    * frame from [[detectHotKeys]]) split each side by semi/anti join,
    * the hot-A rows take a per-row salt ([[rowSalt]]), ONLY the hot-B
    * rows replicate `nSalts`×, and the cold mass joins untouched. The
    * union is result-identical to the plain inner join (spec-pinned
    * exactAll both ways).
    *
    * When to prefer which: AQE's split is free and handles unknown
    * skew at runtime, but it only splits the STREAM side of a
    * sort-merge partition and leaves the build-side hot rows sorted in
    * one task; explicit salting pre-spreads both sides at plan time —
    * the tool when the hot keys are KNOWN (null-heavy FKs, bot users,
    * mega-city codes) and the job runs nightly at 100 TB where one
    * straggler task is the whole SLA. Inner joins only: replicated
    * B-rows would emit unmatched outer rows once per salt. Pass
    * `uniqueCols` (a unique id on side A) for the retry-safe
    * deterministic salt — see [[rowSalt]].
    */
  def saltedFactJoin(a: DataFrame, b: DataFrame, key: String,
      nSalts: Int, hotKeys: DataFrame,
      uniqueCols: Seq[String] = Nil): DataFrame = {
    require(nSalts > 0)
    val hk = broadcast(hotKeys.select(col(key)))
    val aHot = a.join(hk, Seq(key), "left_semi")
      .withColumn("__salt", rowSalt(nSalts, uniqueCols.map(a(_))))
    val bHot = b.join(hk, Seq(key), "left_semi")
      .withColumn("__salt",
        explode(sequence(lit(0L), lit(nSalts - 1L))))
    val hot = aHot.join(bHot, Seq(key, "__salt"), "inner").drop("__salt")
    val cold = a.join(hk, Seq(key), "left_anti")
      .join(b.join(hk, Seq(key), "left_anti"), Seq(key), "inner")
    hot.unionByName(cold)
  }

  /** Two-phase SALTED AGGREGATION — the groupBy-side counterpart of
    * [[saltedJoin]]: exact per-key distinct counts with every hot key
    * spread over `nSalts` partial groups.
    *
    * Spark's algebraic aggregates (sum/count/min/max) are already
    * skew-proof — map-side partial aggregation collapses each
    * partition's rows before the shuffle, so a hot key costs one
    * merged row per partition. The shapes that stay hot-key-bound are
    * the HOLISTIC ones, and the everyday offender is distinct-set
    * work: `size(collect_set(v))` (ubiquitous user code for per-key
    * distinct counts) funnels the hot key's ENTIRE value set into one
    * final-merge task — one straggler, one OOM candidate, no matter
    * how many executors exist (ScalingBench's planted-hot-key A/B
    * measures the gap).
    *
    * The salted plan: phase 1 groups by `(key, xxhash64(value) mod
    * nSalts)` — the salt partitions the VALUE SPACE, so per-(key,salt)
    * distinct counts are disjoint and their phase-2 `sum` per key is
    * EXACT, not approximate. The hot key becomes `nSalts` independent
    * reduce groups; phase 2 merges `nSalts` integers per key. Same
    * salt-partitions-the-work idea as [[saltedJoin]], with the
    * additivity argument replacing the dim-side explode (aggregation
    * needs no replication). Deterministic — no RNG salt.
    */
  def saltedDistinctCount(df: DataFrame, key: String, value: String,
      nSalts: Int = 32): DataFrame = {
    require(nSalts > 0)
    df.groupBy(col(key), pmod(xxhash64(col(value)), lit(nSalts)).as("__salt"))
      .agg(count_distinct(col(value)).as("__part"))
      .groupBy(col(key)).agg(sum(col("__part")).as("n_distinct"))
  }

  /** q232: [[saltedDistinctCount]] as an oracle-gated query — distinct
    * props payloads per event type over the events table. The oracle is
    * the plain `count(DISTINCT …)`, so the gate proves the salted
    * two-phase is EXACT end-to-end, not only on the spec fixture.
    * Event types are the natural low-cardinality/hot-key grouping
    * (5 keys over the whole corpus — precisely the shape where the
    * naive collect-set formulation funnels into 5 tasks at 100 TB).
    */
  def q232SaltedDistinct(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame =
    saltedDistinctCount(graft.Tables.events(spark, dir),
        "event_type", "props")
      .orderBy(col("event_type"))
}
