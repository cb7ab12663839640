package graft.ops

import org.apache.spark.sql.DataFrame

/** Chainable materialization point for corpus-sized SHARED scratch
  * relations — spillable and GC-owned in both modes (no session
  * CacheManager entry to leak when helpers are called per query or per
  * micro-batch), with recoverability chosen by the SAME config switch
  * [[Lineage]] uses:
  *
  *  - **no checkpoint dir** (every local test/bench run): plain lazy
  *    `localCheckpoint` — non-replicated blocks, zero extra cost. The
  *    round-11→12 A/B on the span/shingle family (q54/q58/q88/q101/q102,
  *    sf0.1, identical conditions) measured the always-recoverable bridge
  *    at ~1.2× this path (8.2s vs 6.8s family total), with the storage
  *    level (MEMORY_AND_DISK vs _SER) within noise — so local runs don't
  *    pay for a recoverability they can't use (a laptop losing its only
  *    executor is dead either way).
  *  - **checkpoint dir configured** (`sc.setCheckpointDir`, the one
  *    config an hours-long cluster job sets anyway):
  *    [[org.apache.spark.sql.graft.RddCacheBridge.cachedView]] — the plan
  *    is cut the same way, but the backing RDD keeps its lineage, so a
  *    lost executor recomputes the scratch instead of failing the query.
  */
private[graft] object Cached {
  implicit final class CachedViewOps(private val df: DataFrame)
      extends AnyVal {
    def cachedView: DataFrame =
      if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
        org.apache.spark.sql.graft.RddCacheBridge.cachedView(df)
      else df.localCheckpoint(false)
  }
}
