package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-order construction: shuffle each key group
  * (source, language) by stable hash and interleave the groups round-robin
  * — the data-ordering step before sequence packing, preventing long
  * same-source runs that bias training, reproducibly across runs, engines,
  * and partitionings (no seed state, no `rand()`).
  *
  * The global position is CLOSED-FORM, not a global window: with per-key
  * sizes `n_k` (one tiny collect, #keys rows), the document ranked `r` in
  * key `k` sits at
  *
  *   pos = Σ_{k'} min(n_{k'}, r−1)  +  #{k' < k : n_{k'} ≥ r}  +  1
  *
  * — everything ranked below r across all keys, plus same-rank documents
  * of lexicographically earlier keys. Keys that run out of documents
  * simply drop out of later rounds (the min/≥ terms), so unequal group
  * sizes interleave correctly. `Window.orderBy` with no partition — the
  * single-task plan the lint bans — never appears; per-key ranks come
  * from the bucketed [[Scale.groupedRank]]. The position expression is
  * O(#keys) terms, the right trade below a few thousand keys; beyond
  * that, join a broadcast prefix table instead. */
object Curriculum {

  /** Interleaved order of `df` rows across `keyCol` groups, each group
    * hash-shuffled by `h60(idCol)` (ties by id). Adds `mix_rank` (1-based
    * rank within key) and `pos` (1-based global training position).
    *
    * Keys of any type are ordered by their STRING form (the round-robin
    * order across groups is an arbitrary-but-deterministic choice, so
    * lexicographic is as good as any); a null key has no place in that
    * order and fails loudly — fill or filter nulls first. */
  def interleave(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      buckets: Int = 32): DataFrame = {
    val keyed = df.withColumn("__k", col(keyCol).cast("string"))
    val sizes: Seq[(String, Long)] = keyed
      .groupBy("__k").agg(count(lit(1)).as("n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"interleave: null $keyCol key has no interleave position — " +
            "fill or filter null keys first")
        r.getString(0) -> r.getLong(1)
      }.sortBy(_._1).toSeq
    require(sizes.nonEmpty, "interleave of an empty frame")
    val ranked = Scale.groupedRank(
      keyed.withColumn("__h",
        graft.functions.H60.of(col(idCol).cast("string"))),
      "__k", "__h", idCol, "mix_rank", buckets).drop("__h")
    val below: Column = sizes.map { case (_, n) =>
      least(lit(n), col("mix_rank") - 1)
    }.reduce(_ + _)
    val sameRank: Column = sizes.map { case (k, n) =>
      when(lit(k) < col("__k") && lit(n) >= col("mix_rank"), lit(1L))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    ranked.withColumn("pos", (below + sameRank + 1).cast("long")).drop("__k")
  }
}
