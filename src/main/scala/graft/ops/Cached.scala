package graft.ops

import org.apache.spark.sql.DataFrame

/** Chainable sugar over [[org.apache.spark.sql.graft.RddCacheBridge]]: the
  * materialization point for corpus-sized SHARED scratch relations —
  * recoverable (RDD lineage intact), spillable, and GC-owned (no session
  * CacheManager entry to leak when helpers are called per query or per
  * micro-batch). See the bridge's scaladoc for why neither
  * `localCheckpoint` nor `Dataset.persist` has all three properties. */
private[graft] object Cached {
  implicit final class CachedViewOps(private val df: DataFrame)
      extends AnyVal {
    def cachedView: DataFrame =
      org.apache.spark.sql.graft.RddCacheBridge.cachedView(df)
  }
}
