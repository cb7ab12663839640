package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the single latest right row of the same
  * key whose timestamp is ≤ the left timestamp (event attribution, slowly-
  * changing-dimension lookup, market-data alignment).
  *
  * Spark-first formulation — no per-row subquery, no range cross join: tag
  * and union both sides, then one window pass per key ordered by
  * (ts, side, tiebreak) carrying the last right id forward (`last(...,
  * ignoreNulls)` over an unbounded-preceding frame). One shuffle on the key,
  * linear scan within each key — the 100 TB shape. A right row at exactly
  * the left timestamp matches (right sorts before left on equal ts).
  */
object AsOfJoin {

  /** Shared tag/align/union scaffolding of every as-of variant: left rows
    * keep their columns (plus NULL `__rid`/`__rts`), right rows are
    * projected to (key, ts, id), tagged with `rightKind`, and aligned to
    * the left schema with NULLs. Right rows with a NULL id are dropped —
    * they can never be matched, and [[nearestWithin]]'s separate (id, ts)
    * carries would otherwise desynchronize on them, attributing a
    * different row's timestamp to the carried id. Right rows with a NULL
    * TIMESTAMP are dropped for the same reason: no ≤/≥/|Δ| comparison can
    * ever hold against a null time, yet ascending nulls-FIRST ordering
    * would sort them before every real row, where [[latestPreceding]]'s
    * backward carry picks up their `__rid` as a spurious "preceding" match
    * for left rows that in truth have none. */
  private def unionTagged(
      left: DataFrame, right: DataFrame, key: String, tsCol: String,
      idCol: String, rightKind: Int, withRts: Boolean): DataFrame = {
    val leftCols = left.columns
    val idType = right.schema(idCol).dataType // keep the id's own type —
    // a lossy cast (e.g. string UUIDs to long) would null every match
    val extras = Seq("__kind", "__rid") ++ (if (withRts) Seq("__rts") else Nil)
    val l0 = left.withColumn("__kind", lit(1 - rightKind))
      .withColumn("__rid", lit(null).cast(idType))
    val l = if (withRts) l0.withColumn("__rts", lit(null).cast("long")) else l0
    val r0 = right
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull)
      .select(right.columns.collect {
        case c if c == key || c == tsCol || c == idCol => col(c)
      }.toSeq: _*)
      .withColumn("__kind", lit(rightKind))
      .withColumn("__rid", col(idCol))
    val r = if (withRts) r0.withColumn("__rts", col(tsCol).cast("long"))
            else r0
    // align schemas: right side carries nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ extras.map(col)): _*)
    l.select((leftCols.map(col) ++ extras.map(col)): _*).union(rAligned)
  }

  /** Returns the left rows (original columns) + `asof_id` = the matched
    * right `idCol` (null when no right row precedes). `key` and `tsCol` must
    * be present in both sides; `idCol` only needs to exist on the RIGHT and
    * must be unique per (key, ts) there — it tie-breaks which right row wins
    * when several share a timestamp (ordering among left rows is irrelevant:
    * they carry null `__rid` and cannot affect each other's carried value). */
  def latestPreceding(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      idCol: String): DataFrame = {
    // right kind 0 < left kind 1: an equal-ts right row precedes
    val combined = unionTagged(left, right, key, tsCol, idCol,
      rightKind = 0, withRts = false)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__kind"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("asof_id", last(col("__rid"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .drop("__kind", "__rid")
  }

  /** FORWARD as-of: for every left row, the single EARLIEST right row of
    * the same key whose timestamp is ≥ the left timestamp — "the next
    * event after this one" (next maintenance slot, next price tick,
    * next-session attribution). Same union + one-window-pass shape as
    * [[latestPreceding]], mirrored: left sorts BEFORE right on equal ts
    * (so an exactly-simultaneous right row matches, Δ = 0) and the carry
    * is `first(..., ignoreNulls)` over the current-row→unbounded-following
    * frame. Returns left columns + `asof_id` (null when nothing
    * follows). */
  def earliestFollowing(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      idCol: String): DataFrame = {
    // left kind 0 < right kind 1: an equal-ts right row follows
    val combined = unionTagged(left, right, key, tsCol, idCol,
      rightKind = 1, withRts = false)
    val w = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__kind"), col("__rid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    combined
      // a null-ts LEFT row sorts before every real timestamp (ascending
      // nulls first), so the forward carry would hand it the key's
      // globally earliest right row — but "first right at or after null"
      // is no match at all. (latestPreceding needs no twin guard: there a
      // null-ts left row only ever has other null-ts left rows before it
      // — null-ts rights are dropped above — so its carry is already null.)
      .withColumn("asof_id",
        when(col(tsCol).isNotNull,
          first(col("__rid"), ignoreNulls = true).over(w)))
      .filter(col("__kind") === 0)
      .drop("__kind", "__rid")
  }

  /** NEAREST as-of within a tolerance — pandas `merge_asof
    * (direction='nearest')` semantics: for every left row, the right row
    * of the same key with the smallest |Δts|, matched only when
    * `|Δts| <= tolerance`; ties (equidistant before/after) go to the
    * PRECEDING row, deterministically. `tsCol` must be an integral
    * column on both sides (unix micros, epoch days — convert timestamps
    * first), so distances are exact longs, never float time math.
    *
    * Shape: ONE shuffle on the key feeding two window passes over the
    * same partitioning (backward carry of the last preceding (id, ts),
    * forward carry of the first following), then a row-local pick.
    * Returns left columns + `asof_id`. */
  def nearestWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      idCol: String,
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0: $tolerance")
    val integral: Set[org.apache.spark.sql.types.DataType] = {
      import org.apache.spark.sql.types._
      Set(ByteType, ShortType, IntegerType, LongType)
    }
    require(Seq(left, right).forall(df =>
      integral(df.schema(tsCol).dataType)),
      s"nearestWithin needs an integral `$tsCol` on both sides " +
        "(unix micros / epoch days) — convert timestamps first")
    val idType = right.schema(idCol).dataType
    val combined = unionTagged(left, right, key, tsCol, idCol,
      rightKind = 0, withRts = true)

    // backward: right sorts BEFORE left on equal ts (kind 0 < 1) so a
    // simultaneous right row is a Δ=0 preceding match; forward mirrors
    // with left first — both windows share the one key partitioning
    val back = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__kind"), col("__rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(key)
      .orderBy(col(tsCol), col("__kind").desc, col("__rid"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dB = abs(col(tsCol).cast("long") - col("__bts"))
    val dF = abs(col("__fts") - col(tsCol).cast("long"))
    combined
      .withColumn("__bid", last(col("__rid"), ignoreNulls = true).over(back))
      .withColumn("__bts", last(col("__rts"), ignoreNulls = true).over(back))
      .withColumn("__fid", first(col("__rid"), ignoreNulls = true).over(fwd))
      .withColumn("__fts", first(col("__rts"), ignoreNulls = true).over(fwd))
      .filter(col("__kind") === 1)
      .withColumn("asof_id",
        when(col("__bts").isNotNull && dB <= tolerance &&
          (col("__fts").isNull || dF > tolerance || dB <= dF), col("__bid"))
        .when(col("__fts").isNotNull && dF <= tolerance, col("__fid"))
        .otherwise(lit(null).cast(idType)))
      .drop("__kind", "__rid", "__rts", "__bid", "__bts", "__fid", "__fts")
  }
}
