package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage management for ITERATED operators ([[Graph.pageRank]],
  * [[Graph.triangleCount]], [[Bpe]]): truncate the ever-growing plan/RDD
  * lineage each round without making the job un-recoverable.
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
  *    config-only opt-in): per-round state is `persist(MEMORY_AND_DISK)`
  *    — lineage stays INTACT, so a lost block recomputes from the last
  *    durable point — and every `every`-th cut is a reliable
  *    `Dataset.checkpoint` to the configured dir, which (a) bounds the
  *    recompute window to < `every` rounds and (b) bounds the nested plan
  *    depth Catalyst re-analyzes each round (the other reason iterated ops
  *    must cut lineage at all). After each reliable checkpoint the interim
  *    persisted rounds are dropped, so executor storage holds at most
  *    `every` round-states. Iteration-INVARIANT tables (edge⋈degree,
  *    node set) go straight to a reliable checkpoint: they are read every
  *    round for the whole job, the exact blocks worth surviving.
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
  private val interim = mutable.Buffer.empty[DataFrame]

  /** Cut lineage under an iteration-invariant table (computed once, read
    * every round). `eager` mirrors the localCheckpoint eagerness. */
  def invariant(df: DataFrame, eager: Boolean = true): DataFrame =
    if (durable) reliable(df, eager) else df.localCheckpoint(eager)

  /** Reliable checkpoint with the standard persist-first trick: an eager
    * `Dataset.checkpoint` otherwise computes the plan twice (once for the
    * materializing count, once for the checkpoint write job). Cached
    * blocks are dropped as soon as the checkpoint files exist. Lazy
    * checkpoints stay persisted (the write fires on first use; LRU
    * eviction reclaims the cache). */
  private def reliable(df: DataFrame, eager: Boolean): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    val c = p.checkpoint(eager)
    if (eager) p.unpersist(false)
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
      // persisted rounds again, so their storage is released here
      val c = reliable(df, eager = true)
      interim.foreach(_.unpersist(false))
      interim.clear()
      c
    } else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      // honor the caller's eagerness: iterations that materialized each
      // round under localCheckpoint (so a self-join of the round reads
      // blocks, not a twice-computed plan) keep that property in durable
      // mode — count() populates the cache in one job
      if (eager) p.count()
      interim += p
      p
    }
  }

  /** Release any interim persisted round-states still held (call once the
    * final result has been materialized or cut elsewhere). */
  def close(): Unit = {
    interim.foreach(_.unpersist(false))
    interim.clear()
  }
}
