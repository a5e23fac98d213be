package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SessionCaches weight-budget + LRU eviction (VERDICT r15 item 2):
  * over-budget sessions unpersist their least-recently-used entries,
  * forget them in the map, and rebuild them correctly on re-access —
  * registry growth must not tax cache-heavy iterative queries through
  * unbounded persisted state. Budgets are pinned via the thread-local
  * override so parallel suites in the shared JVM never see them.
  */
class SessionCacheBudgetSpec extends SparkSpecBase {

  /** Distinct `mult` per entry is load-bearing: cache-manager identity
    * is plan `sameResult`, which canonicalizes away alias NAMES — two
    * entries differing only in output name share ONE cache entry, and
    * unpersisting either drops both (the SessionCaches scaladoc
    * hazard). The spec separates plans structurally to isolate them.
    */
  private def mkBuild(s: org.apache.spark.sql.SparkSession, name: String,
      mult: Int,
      counter: scala.collection.mutable.Map[String, Int]): DataFrame = {
    counter(name) = counter.getOrElse(name, 0) + 1
    val df = s.range(1000).select(col("id"), (col("id") * mult).as(name))
      .persist()
    df.count() // materialize so the budget meters real bytes
    df
  }

  test("1-byte budget: LRU entry is unpersisted + forgotten, keep survives, re-access rebuilds correctly") {
    val s = spark.newSession()
    val m = SessionCaches.newCache[(org.apache.spark.sql.SparkSession, String)]()
    val builds = scala.collection.mutable.Map.empty[String, Int]
    SessionCaches.budgetOverride.set(1L)
    try {
      val a1 = SessionCaches.cached(m, (s, "a"))(mkBuild(s, "a", 2, builds))
      assert(SessionCaches.entryCount(s) === 1)
      val b1 = SessionCaches.cached(m, (s, "b"))(mkBuild(s, "b", 3, builds))
      // a was LRU: evicted from the map AND its data unpersisted; b —
      // the entry the call returns — must never be evicted by its own
      // admission
      assert(SessionCaches.entryCount(s) === 1)
      assert(a1.storageLevel === StorageLevel.NONE,
        "evicted entry should be unpersisted")
      assert(b1.storageLevel !== StorageLevel.NONE,
        "the just-returned entry must survive its own budget check")
      // re-access a: the map forgot it, so the build runs again and the
      // rebuilt frame is correct (re-materialization correctness)
      val a2 = SessionCaches.cached(m, (s, "a"))(mkBuild(s, "a", 2, builds))
      assert(builds("a") === 2, "evicted entry must rebuild on re-access")
      assert(a2.count() === 1000)
      assert(a2.agg(sum(col("a"))).collect()(0).getLong(0) === 999000L)
      // and now b was the LRU entry -> it paid the eviction
      assert(SessionCaches.entryCount(s) === 1)
    } finally {
      SessionCaches.budgetOverride.remove()
      SessionCaches.clear(s)
    }
  }

  test("generous budget: entries stable across repeated access, each built once") {
    val s = spark.newSession()
    val m = SessionCaches.newCache[(org.apache.spark.sql.SparkSession, String)]()
    val builds = scala.collection.mutable.Map.empty[String, Int]
    SessionCaches.budgetOverride.set(java.lang.Long.MAX_VALUE)
    try {
      SessionCaches.cached(m, (s, "a"))(mkBuild(s, "a", 2, builds))
      SessionCaches.cached(m, (s, "b"))(mkBuild(s, "b", 3, builds))
      assert(SessionCaches.entryCount(s) === 2)
      (1 to 3).foreach { _ =>
        SessionCaches.cached(m, (s, "a"))(mkBuild(s, "a", 2, builds))
        SessionCaches.cached(m, (s, "b"))(mkBuild(s, "b", 3, builds))
      }
      assert(SessionCaches.entryCount(s) === 2)
      assert(builds === Map("a" -> 1, "b" -> 1))
    } finally {
      SessionCaches.budgetOverride.remove()
      SessionCaches.clear(s)
    }
  }

  test("eviction never touches another session's entries") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    val m = SessionCaches.newCache[(org.apache.spark.sql.SparkSession, String)]()
    val builds = scala.collection.mutable.Map.empty[String, Int]
    SessionCaches.budgetOverride.set(java.lang.Long.MAX_VALUE)
    try {
      val f1 = SessionCaches.cached(m, (s1, "x1"))(mkBuild(s1, "x1", 5, builds))
      SessionCaches.budgetOverride.set(1L)
      // two s2 builds, budget 1: s2 evicts its own LRU, never s1's
      SessionCaches.cached(m, (s2, "x2"))(mkBuild(s2, "x2", 7, builds))
      SessionCaches.cached(m, (s2, "y2"))(mkBuild(s2, "y2", 11, builds))
      assert(SessionCaches.entryCount(s1) === 1)
      assert(f1.storageLevel !== StorageLevel.NONE,
        "another session's eviction must not unpersist this session's entry")
    } finally {
      SessionCaches.budgetOverride.remove()
      SessionCaches.clear(s1)
      SessionCaches.clear(s2)
    }
  }
}
