package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame cache machinery shared by the operator
  * families (dedup postings/pairs/clusters/spans, pipeline split
  * assignment). Every cache map created through [[newCache]] is enrolled
  * in one registry, so [[clear]] can release EVERY session-persisted
  * relation — a cache that bypasses the registry is exactly the leak the
  * round-2 `trainValSplit` persist audit found.
  *
  * Keys are tuples whose FIRST element is the owning SparkSession;
  * invalidation = session end (the testdata tables are immutable inputs
  * by contract).
  */
private[operators] object SessionCaches {

  type Cache[K <: Product] = java.util.concurrent.ConcurrentHashMap[K, DataFrame]

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Cache[_ <: Product]]

  /** Create and enroll a session-keyed cache map. */
  def newCache[K <: Product](): Cache[K] = {
    val m = new java.util.concurrent.ConcurrentHashMap[K, DataFrame]
    registry.add(m)
    m
  }

  /** Drop entries whose session has been stopped — a module-level map
    * would otherwise strongly reference dead sessions and their plans
    * forever in a long-lived JVM that cycles sessions.
    */
  private def purgeStopped(): Unit =
    registry.forEach { m =>
      m.keySet.removeIf(k =>
        k.productElement(0).asInstanceOf[SparkSession].sparkContext.isStopped)
    }

  /** get-then-putIfAbsent, NOT computeIfAbsent: the build functions of one
    * cache read the other caches (clusters → pairs → postings) and run the
    * purge, and ConcurrentHashMap forbids a mapping function from mutating
    * the map it runs inside (bin corruption / lost updates). The benign
    * race (two threads building the same value once each) is acceptable
    * for a driver-side cache. The loser's frame is deliberately NOT
    * unpersisted: CacheManager entries are keyed by logical-plan match,
    * so both builds of the same deterministic plan share ONE cache entry
    * (the second persist is a no-op) — unpersisting the loser would evict
    * the winner's entry and leave the map serving a silently-recomputing
    * frame, the exact failure [[clear]]'s scaladoc warns about. No orphan
    * exists to clean up.
    */
  def cached[K <: Product](m: Cache[K], k: K)(build: => DataFrame): DataFrame = {
    purgeStopped()
    val existing = m.get(k)
    if (existing != null) existing
    else {
      val v = build
      val prev = m.putIfAbsent(k, v)
      if (prev != null) prev else v
    }
  }

  /** Live entry count owned by `spark` across every registered cache —
    * the operator-scoped cache footprint. Specs assert THIS is stable
    * across repeated operator calls (and zero after [[clear]]) instead of
    * an equality over the context-global `getPersistentRDDs` census: that
    * census also counts `localCheckpoint` RDDs from other suites' CC
    * fixpoints, which Spark's ContextCleaner unpersists asynchronously
    * when they become unreachable — an equality over it races the
    * cleaner.
    */
  def entryCount(spark: SparkSession): Int = {
    var n = 0
    registry.forEach { m =>
      m.forEach((k, _) =>
        if (k.productElement(0).asInstanceOf[SparkSession] eq spark) n += 1)
    }
    n
  }

  /** Unpersist and forget every cached relation of this session — for
    * callers (ScalingBench) that need each run to measure the full
    * pipeline rather than a cache hit. `spark.catalog.clearCache()` alone
    * is NOT equivalent: it unpersists the data but leaves the maps
    * returning the same now-unpersisted frames, which then silently
    * recompute on every downstream read. Conversely, dropping only the map
    * entries is not enough either: inner relations persisted during a
    * build (e.g. filteredShingleRows' raw stage) would stay in the
    * CacheManager and plan-match a rebuilt pipeline — so this measurement
    * utility clears the session's cache manager too (documented cost:
    * unrelated persisted data of this session is also evicted).
    */
  def clear(spark: SparkSession): Unit = {
    registry.forEach { m =>
      val it = m.entrySet.iterator
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.productElement(0).asInstanceOf[SparkSession] eq spark) {
          e.getValue.unpersist()
          it.remove()
        }
      }
    }
    spark.catalog.clearCache()
  }
}
