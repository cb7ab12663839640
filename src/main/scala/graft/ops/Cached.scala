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
  /** One-time (per JVM) flag for the cluster-without-checkpoint-dir
    * warning below — the condition is a deployment property, so logging
    * it on every cachedView call would be noise. */
  private val warnedClusterFallback =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  implicit final class CachedViewOps(private val df: DataFrame)
      extends AnyVal {
    def cachedView: DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isDefined)
        org.apache.spark.sql.graft.RddCacheBridge.cachedView(df)
      else {
        // localCheckpoint truncates lineage: on a multi-executor cluster a
        // lost executor then FAILS the query instead of recomputing (and
        // it is documented-unsafe under dynamic allocation /
        // decommissioning). Local mode can't lose its only executor, so
        // the warning fires only where the durability actually differs.
        if (!sc.isLocal && warnedClusterFallback.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "graft cachedView: no checkpoint dir is set on a multi-executor " +
              "cluster — falling back to localCheckpoint, which cannot " +
              "recompute lost blocks (a lost executor fails the query, and " +
              "lazy localCheckpoint is unsafe under dynamic allocation). " +
              "Call sc.setCheckpointDir(...) to get the lineage-recoverable " +
              "cache path.")
        df.localCheckpoint(false)
      }
    }
  }
}
