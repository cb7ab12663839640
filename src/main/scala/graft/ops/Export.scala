package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last mile of the curation pipeline: write the curated corpus as N
  * deterministic, size-balanced training shards under a reader-atomic
  * manifest — the artifact a training job actually consumes.
  *
  * Shard assignment is the stateless h60 hash of the id column (mod N):
  * deterministic under any partitioning, no global sort, no rank window —
  * the same gate discipline every sampling operator here uses. Balance is
  * statistical (±√ expected-per-shard), which is what hash-sharded
  * training corpora accept in exchange for embarrassingly-parallel
  * assignment; a re-export of the same input writes byte-identical shard
  * MEMBERSHIP (file bytes depend on partition layout, membership does
  * not).
  *
  * Scale shape: one `repartition(n, shard)` shuffle — the unavoidable
  * bytes-to-their-shard move — then flat parquet files with `shard` as a
  * data column (the manifest pins top-level files; membership, not file
  * layout, is the contract). Visibility goes through
  * [[TableManifest.publish]]: the new shard set is written to a hidden
  * temp dir, moved in under unique snapshot names, and committed as one
  * manifest version — so a reader (or a concurrent training job holding
  * the previous version) sees whole snapshots only, and a RE-export never
  * deletes the files a current reader is scanning (run
  * [[TableManifest.vacuum]] after a grace period). A plain
  * overwrite-then-init would delete the live manifest at job start and
  * expose partially written shards through the untracked-dir fallback.
  */
object Export {

  /** Write `df` hash-sharded into `n` groups under `outDir` and pin the
    * files with a manifest. Returns the per-shard report `(shard, n_rows)`
    * — assert balance on it, feed it to the data card. */
  def shards(
      df: DataFrame,
      idCol: String,
      outDir: String,
      n: Int): DataFrame = {
    require(n >= 1, s"shard count must be >= 1: $n")
    val spark = df.sparkSession
    TableManifest.publish(
      // a null id would hash to a null shard OUTSIDE 0..n-1: published,
      // but invisible to a loader iterating shards — silent row loss.
      // Fail loudly; the caller decides (filter, or impute an id).
      df.withColumn("shard",
          when(col(idCol).isNull,
            raise_error(lit(s"shards: null $idCol cannot be sharded — " +
              "filter or impute first")))
            .otherwise(pmod(graft.functions.H60.of(col(idCol).cast("string")),
              lit(n.toLong))))
        .repartition(n, col("shard")),
      outDir)
    read(spark, outDir)
      .groupBy("shard").agg(count(lit(1)).as("n_rows"))
      .orderBy("shard")
  }

  /** Read an exported corpus through its manifest (reader-atomic view). */
  def read(spark: SparkSession, outDir: String): DataFrame =
    TableManifest.readTable(spark, outDir)
}
