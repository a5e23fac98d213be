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
private[graft] object SessionCaches {

  type Cache[K <: Product] = java.util.concurrent.ConcurrentHashMap[K, DataFrame]

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Cache[_ <: Product]]

  /** Byte budget for the session-persisted relations (VERDICT r15 item
    * 2): without one, the registry bench degrades as O(components) —
    * every query family's caches stay persisted for the whole session,
    * and the 356th component's shingle riders/edge grids/codebooks tax
    * the 355 before it through GC/eviction pressure (q113_pagerank's
    * measured +1.1 s composition tax at r15). The budget is measured
    * against the REGISTRY-OWNED real cached bytes (each entry's
    * cache-buffer RDD size from storage info — see [[storageSizes]];
    * never plan-size estimates, which are join-product inflated
    * without CBO), and enforced by LRU unpersist in
    * [[cached]]: when the total exceeds the budget, least-recently-USED
    * entries are unpersisted and forgotten (next access rebuilds and
    * re-persists — correctness is untouched, the entry just pays its
    * build again). Default: a quarter of the JVM heap — under Spark's
    * default on-heap storage fraction (~30% of heap), so the budget
    * trips BEFORE the MemoryStore starts thrashing block eviction.
    * `SPARK_GRAFT_CACHE_BUDGET_MB` overrides (tests pin tiny budgets;
    * a 1000-executor cluster would size it to executor storage).
    */
  @volatile private[graft] var budgetBytes: Long =
    sys.env.get("SPARK_GRAFT_CACHE_BUDGET_MB")
      .map(_.toLong * 1024L * 1024L)
      .getOrElse(Runtime.getRuntime.maxMemory / 4)

  /** Thread-scoped budget override (tests): suites share one JVM and
    * may run in parallel, so a spec that pins a 1-byte budget must not
    * leak it into concurrently-running suites' cached() calls.
    */
  private[graft] val budgetOverride = new ThreadLocal[java.lang.Long]

  private def effectiveBudget: Long = {
    val o = budgetOverride.get
    if (o != null) o.longValue else budgetBytes
  }

  /** LRU order over every live entry (access-ordered LinkedHashMap),
    * keyed by (owning map IDENTITY, key) — two empty cache maps are
    * `equals` by content, so the owner must compare by reference. All
    * access synchronized on the map itself.
    */
  private final class EntryId(val owner: Cache[_ <: Product],
      val key: Product) {
    override def equals(o: Any): Boolean = o match {
      case e: EntryId => (e.owner eq owner) && e.key == key
      case _ => false
    }
    override def hashCode: Int =
      System.identityHashCode(owner) * 31 + key.hashCode
  }
  private val lru =
    new java.util.LinkedHashMap[EntryId, Unit](16, 0.75f, true)

  /** Create and enroll a session-keyed cache map. */
  def newCache[K <: Product](): Cache[K] = {
    val m = new java.util.concurrent.ConcurrentHashMap[K, DataFrame]
    registry.add(m)
    m
  }

  /** Eviction telemetry (VERDICT r16 "what's missing" 4): cumulative
    * counts the bench rides on its durable payload so cache-pressure
    * triage ("did q340 drift because evictions forced rebuilds?") is
    * machine-produced instead of a manual A/B. `admissions` = builds
    * run inside [[cached]]; `evictions` = entries the budget
    * unpersisted; `rebuilds` = admissions whose key had previously
    * been evicted (the budget's actual composition cost — an
    * admission that is NOT a rebuild is first-touch work any session
    * pays once).
    */
  case class Telemetry(admissions: Long, evictions: Long, rebuilds: Long) {
    def -(o: Telemetry): Telemetry = Telemetry(admissions - o.admissions,
      evictions - o.evictions, rebuilds - o.rebuilds)
  }
  private val admissionCount = new java.util.concurrent.atomic.AtomicLong
  private val evictionCount = new java.util.concurrent.atomic.AtomicLong
  private val rebuildCount = new java.util.concurrent.atomic.AtomicLong
  private val evictedKeys =
    java.util.concurrent.ConcurrentHashMap.newKeySet[EntryId]()
  def telemetry: Telemetry =
    Telemetry(admissionCount.get, evictionCount.get, rebuildCount.get)

  /** Bytes the budget meters: storage-info sizes of REGISTRY-OWNED
    * cache-buffer RDDs only. The context-wide `getRDDStorageInfo` sum
    * (the r16 form) also counts localCheckpoint RDDs and other
    * sessions' caches — residency eviction cannot remove; once that
    * remainder alone exceeded the budget, every cached() call evicted
    * ALL registry entries except the one returned, permanent rebuild
    * thrash (ADVICE r16). Metering only owned bytes bounds what the
    * registry holds and leaves foreign residency to Spark's own
    * MemoryStore policy.
    */
  private def storageSizes(spark: SparkSession): Map[Int, Long] =
    spark.sparkContext.getRDDStorageInfo
      .map(i => i.id -> (i.memSize + i.diskSize)).toMap

  private def entryBytes(df: DataFrame, sizes: Map[Int, Long]): Long =
    try org.apache.spark.sql.graftbridge.CacheBridge.cachedRddId(df)
      .flatMap(sizes.get).getOrElse(0L)
    catch { case _: Throwable => 0L }

  /** Unpersist + forget least-recently-used entries until the session's
    * REGISTRY-OWNED cached bytes fit the budget (or only `keep`
    * remains). `keep` — the entry the current call is about to return —
    * is never evicted: evicting it would hand the caller a frame that
    * silently recomputes on every read. Entries of OTHER live sessions
    * are skipped (their bytes live in their own storage entries).
    * Unpersist is plan-matched, so an evicted entry that shares a
    * deterministic plan with a survivor in another family also drops
    * the survivor's data — a rebuild-cost hazard only, never a
    * correctness one (the survivor's next read recomputes).
    *
    * Lock discipline (ADVICE r16): the `lru` monitor is held only for
    * map reads/writes — the LRU-order snapshot and the
    * validate-and-forget of the chosen victims. Byte attribution
    * (cache-manager lookups + one storage-status snapshot) and the
    * blocking unpersists run OUTSIDE it, so a slow unpersist can no
    * longer serialize every concurrent cached() access in the JVM. A
    * victim that raced (rebuilt or already forgotten between snapshot
    * and removal) is skipped at validation, never double-unpersisted.
    */
  private def evictOverBudget(spark: SparkSession, keep: EntryId): Unit = {
    if (spark.sparkContext.isStopped) return
    val budget = effectiveBudget
    // phase 1 (locked, cheap): LRU-ordered snapshot of this session's
    // live entries
    val snapshot: Seq[(EntryId, DataFrame)] = lru.synchronized {
      val b = Seq.newBuilder[(EntryId, DataFrame)]
      val it = lru.entrySet.iterator
      while (it.hasNext) {
        val id = it.next().getKey
        if (id.key.productElement(0).asInstanceOf[SparkSession] eq spark) {
          val df = id.owner.asInstanceOf[Cache[Product]].get(id.key)
          if (df != null) b += ((id, df))
        }
      }
      b.result()
    }
    if (snapshot.isEmpty) return
    // phase 2 (unlocked): attribute bytes to owned entries, pick LRU
    // victims. 0-byte entries (not yet materialized, or storage already
    // dropped) are never victims — evicting them frees nothing and
    // costs a rebuild.
    val sizes = storageSizes(spark)
    val withBytes = snapshot.map { case (id, df) =>
      (id, df, entryBytes(df, sizes))
    }
    var total = withBytes.map(_._3).sum
    if (total <= budget) return
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(EntryId, DataFrame)]
    val it = withBytes.iterator
    while (total > budget && it.hasNext) {
      val (id, df, bytes) = it.next()
      if (!(id == keep) && bytes > 0) { chosen += ((id, df)); total -= bytes }
    }
    // phase 3 (locked, cheap): validate each victim is STILL the frame
    // we measured, forget it; phase 4 (unlocked): blocking unpersist
    val confirmed = lru.synchronized {
      chosen.filter { case (id, df) =>
        val still = id.owner.asInstanceOf[Cache[Product]].get(id.key)
        if (still != null && (still eq df)) {
          id.owner.asInstanceOf[Cache[Product]].remove(id.key)
          lru.remove(id)
          true
        } else false
      }
    }
    confirmed.foreach { case (id, df) =>
      try df.unpersist(blocking = true) catch { case _: Throwable => () }
      evictedKeys.add(id)
    }
    evictionCount.addAndGet(confirmed.size.toLong)
  }

  /** Drop entries whose session has been stopped — a module-level map
    * would otherwise strongly reference dead sessions and their plans
    * forever in a long-lived JVM that cycles sessions.
    */
  private def purgeStopped(): Unit = {
    registry.forEach { m =>
      m.keySet.removeIf(k =>
        k.productElement(0).asInstanceOf[SparkSession].sparkContext.isStopped)
    }
    lru.synchronized {
      lru.keySet.removeIf(id => id.key.productElement(0)
        .asInstanceOf[SparkSession].sparkContext.isStopped)
    }
    evictedKeys.removeIf(id => id.key.productElement(0)
      .asInstanceOf[SparkSession].sparkContext.isStopped)
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
    val spark = k.productElement(0).asInstanceOf[SparkSession]
    val id = new EntryId(m, k)
    val existing = m.get(k)
    val (result, admitted) =
      if (existing != null) (existing, false)
      else {
        val v = build
        // lint observation (r18, VERDICT r17 item 3): a session-cached
        // frame appears as an InMemoryTableScan to every consumer, so
        // the shapes inside its BUILD escaped the registry-wide plan
        // lint; PlanLintSpec sets this observer to walk build plans at
        // admission (same device as MidFrames.observer)
        val obs = MidFrames.observer.get
        if (obs != null) obs(v)
        admissionCount.incrementAndGet()
        if (evictedKeys.remove(id)) rebuildCount.incrementAndGet()
        val prev = m.putIfAbsent(k, v)
        (if (prev != null) prev else v, true)
      }
    // LRU touch on EVERY access (recency is usage, not creation); the
    // budget check only on ADMISSION (r18): owned bytes only grow when
    // an entry is added, while the check itself walks the context-wide
    // RDD storage table — on the hit path that walk taxed every warm
    // consumer of every cache with O(live blocks) driver work for a
    // budget that could not have changed. An admitted-lazy entry whose
    // bytes land at its first action is caught at the next admission.
    lru.synchronized { lru.put(id, ()) }
    if (admitted) evictOverBudget(spark, id)
    result
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
    lru.synchronized {
      lru.keySet.removeIf(id =>
        id.key.productElement(0).asInstanceOf[SparkSession] eq spark)
    }
    spark.catalog.clearCache()
  }
}
