package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, Write, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector over a [[FileLog]] directory — the engine-side
  * stand-in for `format("kafka")` (SURVEY.md §2.1 S4), exposing the same
  * read surface: fixed schema `offset long, key binary, value binary,
  * timestamp timestamp`, batch and micro-batch reads, monotonically
  * increasing record offsets, and checkpointed restart-resume (offsets are
  * (de)serialized through the standard `Offset` JSON contract, so the
  * streaming engine's WAL drives replay exactly as it would Kafka's).
  *
  * `spark.read.format("graft-log").load(dir)` or
  * `spark.readStream.format("graft-log").load(dir)`; downstream decode
  * ([[graft.streaming.EventDecode]]) is source-agnostic and works unchanged.
  *
  * Scale notes: `planInputPartitions` yields one partition per segment (a
  * producer batch) — at cluster scale segments map 1:1 onto tasks the way
  * Kafka topic-partition offset ranges do, and `maxRecordsPerTrigger`
  * bounds a micro-batch the way `maxOffsetsPerTrigger` would (admission is
  * segment-granular: whole segments are taken until the cap is met, so
  * offsets never split a segment).
  */
class FileLogProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-log"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileLogTable.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    require(path != null && path.nonEmpty,
      "graft-log requires a path (`.load(dir)` or `.option(\"path\", dir)`)")
    new FileLogTable(path,
      Option(opts.get("maxRecordsPerTrigger")).map(_.toLong),
      Option(opts.get("startingOffset")))
  }
}

object FileLogTable {
  val Schema: StructType = new StructType()
    .add("offset", LongType, nullable = false)
    .add("key", BinaryType, nullable = true)
    .add("value", BinaryType, nullable = true)
    .add("timestamp", TimestampType, nullable = false)
}

class FileLogTable(
    path: String,
    maxRecordsPerTrigger: Option[Long],
    startingOffset: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = s"graft-log:$path"
  override def schema(): StructType = FileLogTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write =
        new FileLogWrite(path, info.schema(), info.queryId())
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = FileLogTable.Schema
        override def toBatch: Batch = new FileLogBatch(path, startingOffset)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new FileLogMicroBatchStream(path, maxRecordsPerTrigger, startingOffset)
      }
    }
}

/** One input partition per committed segment; `startOffset` is the global
  * record offset of the segment's first record (cumulative counts come free
  * from segment names — no data reads at planning time). */
case class FileLogInputPartition(file: String, startOffset: Long, records: Long)
    extends InputPartition

class FileLogBatch(path: String, startingOffset: Option[String] = None)
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    FileLogMicroBatchStream.partitionsFor(path,
      FileLogMicroBatchStream.resolveStart(path, startingOffset), Long.MaxValue)
  override def createReaderFactory(): PartitionReaderFactory =
    new FileLogReaderFactory
}

/** Offset = count of records below it (Kafka's next-offset convention). */
case class FileLogOffset(recordCount: Long) extends Offset {
  override def json(): String = s"""{"recordCount":$recordCount}"""
}

object FileLogMicroBatchStream {
  private val CountRe = """.*"recordCount"\s*:\s*(\d+).*""".r

  def parseOffset(json: String): FileLogOffset = json match {
    case CountRe(n) => FileLogOffset(n.toLong)
    case _ => throw new IllegalArgumentException(s"bad graft-log offset: $json")
  }

  /** Resolve a `startingOffset` option (the `startingOffsets` analogue of
    * `format("kafka")`): "earliest" (default) → 0, "latest" → everything
    * committed at resolution time (a streaming query then reads only what
    * arrives after it starts), or a record offset that must sit on a
    * segment boundary — batches are planned at whole-segment granularity,
    * so an intra-segment start would silently skip the segment's tail;
    * fail fast and list the valid boundaries instead. */
  def resolveStart(path: String, startingOffset: Option[String]): Long =
    startingOffset.map(_.trim.toLowerCase) match {
      case None | Some("earliest") => 0L
      case Some("latest") => FileLog.latestOffset(path)
      case Some(n) =>
        val want = try n.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"startingOffset must be 'earliest', 'latest', or a record offset: '$n'")
        }
        val boundaries = FileLog.segments(path)
          .scanLeft(0L)(_ + _.records)
        require(boundaries.contains(want),
          s"startingOffset $want is not a segment boundary of $path " +
            s"(valid: ${boundaries.mkString(", ")})")
        want
    }

  /** Segments whose record range intersects [from, until) — segment
    * boundaries always align with batch boundaries (offsets are only ever
    * taken at whole-segment granularity), so intersection is containment. */
  def partitionsFor(path: String, from: Long, until: Long): Array[InputPartition] = {
    val parts = Array.newBuilder[InputPartition]
    var cum = 0L
    FileLog.segments(path).foreach { s =>
      if (cum >= from && cum + s.records <= until)
        parts += FileLogInputPartition(s.file.getAbsolutePath, cum, s.records)
      cum += s.records
    }
    parts.result()
  }
}

class FileLogMicroBatchStream(
    path: String,
    maxRecordsPerTrigger: Option[Long],
    startingOffset: Option[String] = None)
    extends MicroBatchStream with SupportsAdmissionControl {

  /** Only consulted on a fresh checkpoint — a restart resumes from the
    * checkpointed offset and never re-resolves "latest". */
  override def initialOffset(): Offset = FileLogOffset(
    FileLogMicroBatchStream.resolveStart(path, startingOffset))

  override def deserializeOffset(json: String): Offset =
    FileLogMicroBatchStream.parseOffset(json)

  /** Plain (no-admission-control) latest: everything committed. */
  override def latestOffset(): Offset = FileLogOffset(FileLog.latestOffset(path))

  /** Admission control (the `maxOffsetsPerTrigger` analogue): whole
    * segments are admitted until the record cap is met — at least one
    * segment per batch so the stream always advances. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    maxRecordsPerTrigger match {
      case None => latestOffset()
      case Some(cap) =>
        val from = FileLogMicroBatchStream.parseOffset(start.json()).recordCount
        var cum = 0L
        var admittedUntil = from
        FileLog.segments(path).foreach { s =>
          val segStart = cum
          cum += s.records
          if (segStart >= from &&
              (cum - from <= cap || admittedUntil == from))
            admittedUntil = cum
        }
        FileLogOffset(admittedUntil)
    }

  override def getDefaultReadLimit: ReadLimit =
    maxRecordsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def reportLatestOffset(): Offset = latestOffset()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = FileLogMicroBatchStream.parseOffset(start.json()).recordCount
    val until = FileLogMicroBatchStream.parseOffset(end.json()).recordCount
    FileLogMicroBatchStream.partitionsFor(path, from, until)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FileLogReaderFactory

  /** Commit is a retention hook: the log keeps everything (replayable, like
    * Kafka with retention) — nothing to delete here. */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

class FileLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileLogInputPartition]
    new PartitionReader[InternalRow] {
      private val it = FileLog.read(new java.io.File(p.file))
      private var offset = p.startOffset - 1
      private val row = new GenericInternalRow(4)
      override def next(): Boolean =
        if (it.hasNext) {
          val r = it.next()
          offset += 1
          row.update(0, offset)
          row.update(1, r.key)
          row.update(2, r.value)
          row.update(3, r.tsMicros)
          true
        } else false
      override def get(): InternalRow = row
      override def close(): Unit = it.close()
    }
  }
}
