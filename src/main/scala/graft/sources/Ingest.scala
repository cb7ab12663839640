package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced text-format ingestion with corrupt-row quarantine.
  *
  * A 100 TB crawl always contains malformed lines; the three stock modes
  * are each wrong for pipeline use (`FAILFAST` kills the job on one bad
  * row, `DROPMALFORMED` silently loses data, bare `PERMISSIVE` nulls the
  * fields and loses the evidence). The quarantine pattern keeps both
  * halves as DataFrames: typed good rows for the pipeline, raw offending
  * lines for audit/replay — the same bad-input-is-data philosophy as
  * [[graft.ops.Multimodal]]'s decoders.
  *
  * Implementation: one `text` read, then a per-row `from_csv`/`from_json`
  * parse (the codegen'd failure-safe parser) and two filters on the parsed
  * struct's corrupt field. This deliberately avoids the file-source
  * `columnNameOfCorruptRecord` path, whose corrupt-column-only query
  * restriction (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
  * forces callers to cache the whole parsed file — a non-starter at scale.
  * No shuffle, no cache, and the quarantine carries the exact input line.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  /** CSV lines with explicit schema; returns (typed good rows, quarantined
    * raw lines in a `_corrupt_record` column). Header/multiline handling is
    * out of scope — this is the pipeline-ingestion path for line-oriented
    * data. */
  def csvWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) =
    quarantine(spark, path, v =>
      from_csv(v, withCorrupt(schema), parseOptions(options)))

  /** JSON-lines with explicit schema; same contract as [[csvWithQuarantine]]. */
  def jsonWithQuarantine(
      spark: SparkSession,
      path: String,
      schema: StructType,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) =
    quarantine(spark, path, v =>
      from_json(v, withCorrupt(schema), parseOptions(options)))

  /** Quarantine split over an ALREADY-LOADED `value: string` DataFrame —
    * batch or STREAMING (the split is two stateless per-row filters, so it
    * composes with `readStream.text(...)`/Kafka `value` casts and each half
    * can feed its own sink; in a `foreachBatch` both halves share the one
    * micro-batch scan). This is the transformation core the path-based
    * readers above wrap. */
  def jsonSplit(lines: DataFrame, schema: StructType,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) =
    split(lines, v => from_json(v, withCorrupt(schema), parseOptions(options)))

  /** CSV-lines twin of [[jsonSplit]]. */
  def csvSplit(lines: DataFrame, schema: StructType,
      options: Map[String, String] = Map.empty): (DataFrame, DataFrame) =
    split(lines, v => from_csv(v, withCorrupt(schema), parseOptions(options)))

  private def parseOptions(options: Map[String, String]): Map[String, String] =
    options ++ Map(
      "mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptCol)

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema already has a $CorruptCol column")
    schema.add(CorruptCol, StringType)
  }

  private def quarantine(
      spark: SparkSession,
      path: String,
      parse: Column => Column): (DataFrame, DataFrame) =
    split(spark.read.text(path), parse)

  private def split(
      lines: DataFrame,
      parse: Column => Column): (DataFrame, DataFrame) = {
    val parsed = lines
      .select(col("value"), parse(col("value")).as("__parsed"))
    val corrupt = col(s"__parsed.$CorruptCol")
    // A literal `null` line (or blank line) parses to a NULL struct, whose
    // corrupt field is also null — without the isNotNull guard such lines
    // would masquerade as all-null "good" rows and the evidence would be
    // lost, the exact failure mode this object exists to prevent.
    val good = corrupt.isNull && col("__parsed").isNotNull
    (parsed.filter(good).select(col("__parsed.*")).drop(CorruptCol),
      parsed.filter(!good).select(col("value").as(CorruptCol)))
  }
}
