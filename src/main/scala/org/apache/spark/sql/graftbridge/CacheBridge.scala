package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame

/** Cache-introspection bridge: map a persisted DataFrame to the RDD id
  * of its materialized cache buffers, so a cache budget can meter the
  * bytes it OWNS instead of the context-wide `getRDDStorageInfo` total
  * (which also counts localCheckpoint RDDs and other sessions' caches —
  * footprint a registry eviction cannot remove; metering it turns any
  * large non-registry residency into permanent eviction thrash).
  * Lives in an `org.apache.spark.sql` subpackage because the
  * CacheManager lookup is `private[sql]` — same pattern as
  * [[ColumnBridge]].
  */
object CacheBridge {

  /** RDD id of `df`'s cache buffers: Some(id) iff the plan is in the
    * session's CacheManager AND the buffers RDD has been created (a
    * persisted-but-never-materialized entry holds no storage yet).
    * Driver-side plan matching only — no Spark job, no executor RPC.
    */
  def cachedRddId(df: DataFrame): Option[Int] = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    cds.sparkSession.sharedState.cacheManager.lookupCachedData(cds)
      .map(_.cachedRepresentation.cacheBuilder)
      .filter(_.isCachedColumnBuffersLoaded)
      .map(_.cachedColumnBuffers.id)
  }
}
