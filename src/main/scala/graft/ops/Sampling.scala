package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent *and* partition-layout-dependent — rerun
  * the job with different file splits and the sample changes, which breaks
  * reproducibility audits and cross-engine verification. Hash-gating on a
  * stable id (the q34 split idiom: `h60(id) % 10000 < rate_bp`) gives every
  * engine, every run, and every partitioning the identical sample, and
  * composes with stratification by making the rate a per-stratum column.
  * Per-row, shuffle-free, codegen'd.
  */
object Sampling {

  /** Keep rows where `h60(id) % 10000 < rateBp` (basis points: 10000 = all).
    * `id` should be a stable string-castable row identity. */
  def hashSample(df: DataFrame, id: Column, rateBp: Int): DataFrame = {
    require(rateBp >= 0 && rateBp <= 10000, s"rateBp out of [0,10000]: $rateBp")
    df.filter(pmod(graft.functions.H60.of(id.cast("string")), lit(10000)) < rateBp)
  }

  /** Stratified variant: per-stratum rates in basis points, `defaultBp` for
    * strata not in the map. Downsampling hot strata (e.g. boilerplate-heavy
    * sources) while keeping rare ones is the standard corpus-balancing
    * move; the gate stays per-row and deterministic. */
  def stratifiedHashSample(
      df: DataFrame,
      id: Column,
      stratum: Column,
      ratesBp: Map[String, Int],
      defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      "rates must be in [0,10000] basis points")
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, bp)) =>
      when(stratum === k, lit(bp)).otherwise(acc)
    }
    df.filter(pmod(graft.functions.H60.of(id.cast("string")), lit(10000)) < rate)
  }
}
