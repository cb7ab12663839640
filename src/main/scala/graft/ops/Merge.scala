package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upsert (SCD-1 merge) for immutable-file lakes: the MERGE-INTO shape
  * rebuilt as pure relational ops — no transactional table format needed.
  *
  * `upsert(target, updates, keys)` keeps every target row whose key has no
  * update (left anti join) and unions the updates in (updates win on key
  * collision; brand-new keys insert). Two shuffles on the key — at 100 TB
  * the anti join is the standard broadcast/shuffled-hash shape, and the
  * rewrite only touches partitions holding updated keys when the target is
  * bucketed by the key. Deduplicate `updates` first if several update rows
  * can share a key (last-writer-wins needs an explicit ordering column —
  * see [[dedupLatest]]).
  *
  * Publishing the merged/historized result back to storage should go
  * through [[TableManifest.publish]] — it swaps the table to the new
  * snapshot at a single atomic commit point, so a reader racing the
  * publish sees the old version or the new one, never a mix (the plain
  * `write.mode("overwrite")` the reference uses deletes before it writes).
  */
object Merge {

  /** Updates replace target rows on key match; unmatched update rows
    * insert. Column sets must match by name. Key matching is NULL-SAFE
    * (`<=>`): a null-key update replaces the null-key target row — a
    * plain equi-anti-join would never match null and silently keep BOTH
    * rows (duplicate instead of upsert). */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = target.columns.toSeq
    val upKeys = updates.select(keys.map(col): _*).distinct()
    target
      .join(upKeys, keys.map(k => target(k) <=> upKeys(k)).reduce(_ && _),
        "left_anti")
      .unionByName(updates.select(cols.map(col): _*))
  }

  /** SCD-2 historization of a change stream: each (key, ts, payload) change
    * row becomes a validity interval [ts, next change ts) via one `lead`
    * window per key — the current version carries an open (null) upper
    * bound. The window partitions by the business key (high-cardinality by
    * construction: users, parts, accounts), so no single-task ordering; at
    * 100 TB this is the standard keyed-window shuffle.
    *
    * Duplicate `(key, ts)` change rows are inherently ambiguous input
    * (two versions effective at the same instant): the tie is broken
    * DETERMINISTICALLY by a payload hash, the loser gets an empty
    * `[ts, ts)` interval that no [[asOfSnapshot]] can match, and which
    * row loses is stable across runs and partitionings — prefer a total
    * ordering column (log offset) as `tsCol` when the stream has one. */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = changes.columns.toSeq
      .filterNot(c => keys.contains(c) || c == tsCol)
    // each column null-coalesced to a sentinel BEFORE concat_ws: concat_ws
    // SKIPS nulls, so (null, "x") and ("x", null) would otherwise collapse
    // to the same bytes and the tie order between those distinct payloads
    // would be unspecified - breaking the determinism promised above
    val tieBreak =
      if (payload.isEmpty) lit(0L)
      else crc32(concat_ws("",
        payload.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), tieBreak)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Point-in-time lookup over an SCD-2 table: the version of each key
    * effective at `at` — `valid_from <= at < valid_to` with the open
    * current version matching everything after its `valid_from`. Pure
    * filter, no join: the snapshot predicate prunes before any downstream
    * shuffle, and on a table partitioned by `valid_from` date it prunes
    * partitions too. */
  def asOfSnapshot(scd2Table: DataFrame, at: Column): DataFrame =
    scd2Table.filter(
      col("valid_from") <= at &&
        (col("valid_to").isNull || col("valid_to") > at))

  /** Retractable incremental aggregate maintenance — the materialized-view
    * delta-refresh core: `state` holds per-key partial aggregates
    * (`keys ++ cnt ++ sum_<c>` for each value column), `changes` holds
    * delta rows with a ±1 `op` sign (+1 insert, −1 delete/retraction).
    * The new state is `state ⊎ sign-weighted delta aggregate`; keys whose
    * count returns to zero vanish. COUNT and SUM are retractable so this
    * is exact; MIN/MAX are not (a deleted extremum forces a rebuild of
    * that key's group — out of scope by design, as in every delta-view
    * engine).
    *
    * Exactness: pre-cast value columns to DECIMAL in BOTH `state` and
    * `changes` when they carry money/doubles — decimal sums cancel
    * retractions exactly; float sums may not. A negative surviving `cnt`
    * means the change stream retracted rows that were never inserted —
    * it is kept visible (never clamped) so corrupted CDC is detectable.
    *
    * Scale shape: the only SHUFFLE is the groupBy over the delta
    * (≤ |touched keys| result rows, broadcast afterwards); existing state
    * streams through a broadcast semi/anti split — untouched rows pass
    * scan-side with no exchange and only touched keys re-aggregate. The
    * refresh's shuffle cost is O(|delta|), not O(|table|); rewriting the
    * output still scans the state once (unavoidable for a full snapshot —
    * with a key-partitioned state layout only touched partitions need
    * rewriting). Feed inserts from [[TableManifest.addedBetween]]
    * (file-level CDC) and deletes from an upsert/CDC stream's before-rows.
    */
  def maintainAgg(
      state: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    require(changes.columns.contains("op"), "changes needs a ±1 'op' column")
    val deltaAgg = changes.groupBy(keys.map(col): _*)
      .agg(sum(col("op")).as("cnt"),
        sumCols.map(c => sum(col(c) * col("op")).as(s"sum_$c")): _*)
      .select((keys :+ "cnt").map(col) ++ sumCols.map(c => col(s"sum_$c")): _*)
    val deltaKeys = deltaAgg.select(keys.map(col): _*)
    // null-safe key split: groupBy above treats a null key as a real
    // group, so the semi/anti split must too — EqualTo would route the
    // null-key state row to `untouched` AND aggregate the delta alone,
    // emitting two conflicting rows for the null key
    def keyMatch(s: DataFrame, d: DataFrame) =
      keys.map(k => s(k) <=> d(k)).reduce(_ && _)
    val untouched =
      state.join(broadcast(deltaKeys), keyMatch(state, deltaKeys), "left_anti")
    val touched =
      state.join(broadcast(deltaKeys), keyMatch(state, deltaKeys), "left_semi")
      .unionByName(deltaAgg)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("cnt"),
        sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
      .filter(col("cnt") =!= 0L)
    untouched.unionByName(touched)
  }

  /** Last-writer-wins collapse of an update stream: one row per key — the
    * whole max-`versionCol` row survives as a unit (a single `max_by` over
    * the payload struct, map-side combinable; a window row_number would
    * fully sort each partition instead). Version ties are nondeterministic —
    * pass a total version (e.g. a log offset). */
  def dedupLatest(updates: DataFrame, keys: Seq[String],
      versionCol: String): DataFrame = {
    val nonKeys = updates.columns.filterNot(keys.contains).toSeq
    updates.groupBy(keys.map(col): _*)
      .agg(max_by(struct(nonKeys.map(col): _*), col(versionCol)).as("__r"))
      .select(keys.map(col) ++ nonKeys.map(c => col(s"__r.$c")): _*)
      .select(updates.columns.toSeq.map(col): _*)
  }
}
