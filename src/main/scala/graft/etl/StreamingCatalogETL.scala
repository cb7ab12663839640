package graft.etl

import graft.Tables
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming variant of the catalog ETL — the reference's `while True /
  * sleep(60)` re-run loop (services/spark_batch_processor.py:104-111)
  * replaced by a file-source stream: new `*.txt` drops in `inDir` are
  * discovered by the source, each batch is pivoted with the full batch ETL
  * and appended to a parquet catalog, with checkpointed exactly-once file
  * handling (no re-reads, no timer).
  *
  * Block atomicity is per-file: a catalog text file contains whole ITEM
  * blocks (the reference's input is one such file), so running the block
  * parser over a batch of complete files is exact. Rows carry `batch_id`;
  * (batch_id, item_id) is the globally unique key across appends.
  *
  * Exactly-once: each batch lands through
  * [[graft.streaming.ManifestAppendSink.applyBatch]] — an atomic manifest
  * commit carrying the batch-id high-water mark — so a checkpoint-replayed
  * batch (crash between the parquet job and the checkpoint advance, or a
  * task retry after commit) is detected and SKIPPED instead of appended
  * twice; a raw `mode(append)` write here would silently duplicate every
  * (batch_id, item_id) on replay. Read the catalog through
  * [[graft.ops.TableManifest.readTable]] (schemas merge across evolved
  * appends, crashed-attempt debris is invisible); a plain parquet read of
  * the directory sees data files only through whatever schema Spark
  * samples and may include uncommitted debris.
  */
object StreamingCatalogETL {

  /** `schemaKeys`: the declared attribute-column superset. The pivot
    * discovers columns per batch, so two batches with different key sets
    * would append divergent parquet schemas that a plain read silently
    * narrows; aligning every batch to the declared set keeps the output a
    * single stable table (at 100 TB the catalog schema is a contract, not
    * a per-batch discovery — same reasoning as q6's explicit pivot values).
    * Keys discovered in a batch but missing from `schemaKeys` still appear —
    * alignment only adds, never drops. */
  def start(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      checkpoint: String,
      schemaKeys: Seq[String] = Seq("Title", "Genre", "ListPrice")): StreamingQuery = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .option("maxFilesPerTrigger", 8)
      .text(inDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // the batch carries raw lines of complete files; run the exact
          // batch pipeline on them (parse → pivot → clean)
          val (parsedLong, cachedLines) =
            MovieCatalogETL.parseLinesDfCached(batch)
          try {
            val parsed = MovieCatalogETL.pivotCatalog(parsedLong)
            val cleaned = MovieCatalogETL.clean(parsed)
              .withColumn("batch_id", lit(batchId))
            val aligned = schemaKeys.foldLeft(cleaned) { (df, c) =>
              if (df.columns.contains(c)) df
              else df.withColumn(c, lit(null).cast("string"))
            }
            graft.streaming.ManifestAppendSink.applyBatch(
              aligned, batchId, outDir)
          } finally {
            // the write above materialized the batch; drop the per-batch
            // cache entry so a long-running stream doesn't accumulate them
            cachedLines.unpersist()
          }
        }
      }
      .start()
  }
}
