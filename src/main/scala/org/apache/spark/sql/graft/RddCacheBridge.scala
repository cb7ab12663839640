package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** A materialization point with BOTH properties the engine's shared
  * scratch relations need, which neither public API gives alone:
  *
  *  - `Dataset.localCheckpoint` → blocks are GC-cleaned (ContextCleaner
  *    frees them once the plan is unreachable) but NON-RECOMPUTABLE — one
  *    lost executor aborts every consumer.
  *  - `Dataset.persist` → recomputable from lineage, but the entry lives
  *    in the session CacheManager until an explicit `unpersist()`; a
  *    per-micro-batch caller (the standing media-ingest stream) leaks one
  *    cached corpus-sized relation per batch, filling executor disks.
  *
  * This bridge persists the query's RDD directly (lineage INTACT → lost
  * blocks recompute; `MEMORY_AND_DISK` → spillable) and wraps it back
  * into a DataFrame via `LogicalRDD`, the same construction
  * `Dataset.checkpoint` uses — so the cache is owned by the RETURNED PLAN:
  * when the caller drops the DataFrame, the RDD becomes unreachable and
  * the ContextCleaner frees its blocks. Physical output partitioning and
  * ordering are carried over, so downstream exchanges still elide exactly
  * as they would after a localCheckpoint. */
object RddCacheBridge {

  def cachedView(df: DataFrame): DataFrame =
    cachedViewWithRelease(df)._1

  /** [[cachedView]] plus an explicit early-release handle (unpersists the
    * backing RDD's blocks; lineage keeps the view usable afterwards) for
    * callers that manage round lifetimes themselves ([[graft.ops.Lineage]]). */
  def cachedViewWithRelease(df: DataFrame): (DataFrame, () => Unit) = {
    val session = df.sparkSession.asInstanceOf[ClassicSession]
    val classic = df.asInstanceOf[Dataset[_]]
    // copy() is load-bearing EVEN under serialized storage levels: unsafe
    // rows are buffer-reused per partition, and Spark's cache serializers
    // (Java/Kryo SerializationStream) track object identity — writing the
    // SAME row object N times stores one payload plus N-1 back-references,
    // so a no-copy serialized block deserializes to the first row repeated
    // (DurableLineageSpec caught exactly that: every cachedView consumer
    // saw one aliased row per partition). Storage level: the round-12 A/B
    // on the span/shingle family measured MEMORY_AND_DISK_SER within
    // noise of MEMORY_AND_DISK (8.24s vs 8.18s family total at sf0.1) —
    // the level is not the cost lever (the copy+materialize is), so the
    // deserialized default stays: zero per-read deserialization for the
    // fixpoint ops that re-read their scratch every round.
    val rdd = classic.queryExecution.executedPlan.execute().map(_.copy())
      .persist(StorageLevel.MEMORY_AND_DISK)
    // fromDataset — the exact construction Dataset.localCheckpoint uses —
    // carries the ORIGIN plan's statistics and constraints into the
    // LogicalRDD, so join-side broadcast decisions downstream stay what
    // they were (a bare LogicalRDD defaults to "huge" and silently turns
    // broadcast joins into sort-merge; the exchange-count lint caught it)
    val view = Dataset.ofRows(session,
      LogicalRDD.fromDataset(rdd, classic, isStreaming = false))
    (view, () => { rdd.unpersist(false); () })
  }
}
