package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM event-time interval join — the attribution
  * pattern (impression at t joined to conversions inside `[t, t+window]`,
  * both bounds inclusive) run continuously instead of as a nightly batch.
  * The exact batch twin is q137's equi+range join over the events table
  * (q79 is the related but different window-function attribution).
  *
  * Why this shape at 100 TB: both inputs are keyed shuffles, and the time
  * constraint is what lets Spark BOUND the join state — each side buffers
  * only rows younger than `watermark + interval` for its keys, so state is
  * (arrival-rate × horizon), not stream-length. Without the time bound a
  * stream-stream join's state grows forever; with it, eviction is exact
  * and replay-deterministic (event-time watermarks, not wall-clock).
  * `left_outer` additionally emits unmatched left rows with nulls — but
  * only once the watermark proves no match can still arrive, which makes
  * the null rows themselves evidence that state eviction ran.
  *
  * Column names must be disjoint between the two sides (stream-stream
  * joins resolve the time constraint by name); the right key column is
  * dropped from the output — it equals the left key on matches and is
  * null on outer rows.
  */
object StreamJoin {

  /** Join `left` (watermarked `leftDelay` on `leftTs`) to `right` rows of
    * the same key whose `rightTs` lies in `[leftTs, leftTs + upper]`.
    * `joinType`: `inner` or `left_outer`. */
  def intervalJoin(
      left: DataFrame, leftTs: String, leftKey: String, leftDelay: String,
      right: DataFrame, rightTs: String, rightKey: String, rightDelay: String,
      upper: String, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"intervalJoin supports inner/left_outer, not $joinType")
    val overlap =
      left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoin: column names must be disjoint across sides " +
        s"(shared: ${overlap.mkString(", ")})")
    val l = left.withWatermark(leftTs, leftDelay)
    val r = right.withWatermark(rightTs, rightDelay)
    l.join(r,
        col(rightKey) === col(leftKey) &&
          col(rightTs) >= col(leftTs) &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $upper"),
        joinType)
      .drop(rightKey)
  }
}
