package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.RddCacheBridge
import org.apache.spark.storage.StorageLevel

/** Lineage management for ITERATED operators ([[Graph.pageRank]],
  * [[Graph.triangleCount]], [[Cluster.connectedComponents]],
  * [[Coreset.selectFull]], [[Dedup.cutDuplicatedSpansFixpoint]], [[Bpe]]):
  * truncate the ever-growing plan lineage each round without making the
  * job un-recoverable.
  *
  * The trade it manages: `localCheckpoint` truncates lineage into
  * NON-REPLICATED executor block stores — fast, but a single lost executor
  * (spot reclaim, dynamic-allocation scale-down, OOM kill) mid-iteration
  * loses blocks that can never be recomputed and fails the whole job. On a
  * laptop-scale run that risk is zero and the speed is free; on an
  * hours-long 100 TB PageRank it is the dominant failure mode.
  *
  * So the mode is chosen by the ONE config a cluster job sets anyway:
  *
  *  - **No checkpoint dir configured** (`SparkContext.getCheckpointDir`
  *    empty — every local test/bench run): exactly the historical
  *    behavior, `localCheckpoint` per cut. Zero plan or perf change.
  *  - **Checkpoint dir configured** (`sc.setCheckpointDir("hdfs://…")`,
  *    config-only opt-in): per-round state becomes a
  *    [[RddCacheBridge.cachedView]] — the Catalyst plan is cut to a flat
  *    `LogicalRDD` exactly like localCheckpoint (analysis cost stays O(1)
  *    per round), but the backing RDD keeps its LINEAGE, so a lost block
  *    recomputes through Spark's stage-retry machinery instead of killing
  *    the job — and every `every`-th cut is a reliable
  *    `Dataset.checkpoint` to the configured dir, bounding the recompute
  *    chain to < `every` rounds. After each reliable checkpoint the
  *    interim rounds' blocks are released, so executor storage holds at
  *    most `every` round-states (superseded rounds are also GC-owned:
  *    dropping the DataFrame frees the blocks via the ContextCleaner,
  *    never the session CacheManager). Iteration-INVARIANT tables
  *    (edge⋈degree, node set) go straight to a reliable checkpoint: they
  *    are read every round for the whole job, the exact blocks worth
  *    surviving.
  *
  * Results are bit-identical across modes — both paths only materialize
  * the same deterministic plans — proven by `DurableLineageSpec`.
  */
final class Lineage(spark: SparkSession, every: Int = 4) {
  require(every >= 1, s"every must be >= 1: $every")

  /** Durable mode is on iff the session has a reliable checkpoint dir. */
  val durable: Boolean =
    spark.sparkContext.getCheckpointDir.isDefined

  private var cuts = 0
  private val interim = mutable.Buffer.empty[() => Unit]

  /** Cut lineage under an iteration-invariant table (computed once, read
    * every round). `eager` mirrors the localCheckpoint eagerness. */
  def invariant(df: DataFrame, eager: Boolean = true): DataFrame =
    if (durable) reliable(df, eager) else df.localCheckpoint(eager)

  /** Reliable checkpoint. Eager: the persist-first trick — a bare eager
    * `Dataset.checkpoint` computes the plan twice (once for the
    * materializing count, once for the checkpoint write job); the cache
    * is dropped as soon as the checkpoint files exist, so no CacheManager
    * entry outlives the call. Lazy: plain `checkpoint(false)` — the write
    * job recomputes once at first use, the price of not holding a cache
    * entry of unknowable lifetime. */
  private def reliable(df: DataFrame, eager: Boolean): DataFrame =
    if (!eager) df.checkpoint(false)
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      val c = p.checkpoint(true)
      p.unpersist(false)
      c
    }

  /** Cut lineage under round state (the table that feeds the NEXT round).
    * Call once per round cut; the helper counts cuts and places the
    * reliable checkpoints. */
  def state(df: DataFrame, eager: Boolean = false): DataFrame = {
    cuts += 1
    if (!durable) df.localCheckpoint(eager)
    else if (cuts % every == 0) {
      // eager: once the checkpoint files exist nothing reads the interim
      // rounds again, so their storage is released here
      val c = reliable(df, eager = true)
      interim.foreach(_.apply())
      interim.clear()
      c
    } else {
      val (view, release) = RddCacheBridge.cachedViewWithRelease(df)
      // honor the caller's eagerness: iterations that materialized each
      // round under localCheckpoint (so a self-join of the round reads
      // blocks, not a twice-computed plan) keep that property in durable
      // mode — count() populates the blocks in one job
      if (eager) view.count()
      interim += release
      view
    }
  }

  /** Release any interim round-state blocks still held (call once the
    * final result no longer depends on them — lineage keeps even a
    * released view usable, at recompute cost). */
  def close(): Unit = {
    interim.foreach(_.apply())
    interim.clear()
  }
}
