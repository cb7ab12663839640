package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, File, FileOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, Write,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StructType, TimestampType}

/** The producer half of the graft-log connector as a real DataSource V2
  * batch write (`df.write.format("graft-log").mode("append").save(dir)`),
  * with the standard two-phase commit shape `format("kafka")`'s producer
  * path or any file sink would use at cluster scale:
  *
  *  - each TASK streams its partition into a hidden temp file in segment
  *    wire format (one record resident at a time, executor-side — no
  *    driver hop, unlike [[FileLogSink.publish]], which remains the
  *    single-process convenience path);
  *  - task commit hands the driver a (tempPath, recordCount) message;
  *    speculative/retried tasks abort by deleting their temp file and
  *    never publish;
  *  - the driver's `commit` concatenates the temp files in deterministic
  *    partition order into ONE staged file (wire-format segments
  *    concatenate byte-wise) and adopts it with a SINGLE atomic rename
  *    ([[FileLog.adopt]]) — so readers genuinely observe the whole write
  *    or none of it. Adopting the temps one rename at a time would leave
  *    the already-renamed partitions permanently visible when a later
  *    rename fails mid-commit (a failed job with partial data, duplicated
  *    on retry); the one-file concat trades a driver-side byte copy —
  *    the same per-epoch cost the streaming half already pays — for real
  *    all-or-nothing semantics and fewer segments for readers to list.
  *    A crash mid-concat leaves only a hidden `.stage-` orphan that
  *    readers ignore.
  *
  * Requires the log directory to be on a filesystem all executors share
  * (true in local mode and for any DFS path — the same assumption every
  * Spark file sink makes). Input schema: `value binary` required,
  * `key binary` and `timestamp` optional.
  */
class FileLogWrite(path: String, schema: StructType, queryId: String)
    extends Write {
  FileLogWrite.validate(schema)
  override def toBatch: BatchWrite = new FileLogBatchWrite(path, schema)
  override def toStreaming: StreamingWrite =
    new FileLogStreamingWrite(path, schema, queryId)
}

object FileLogWrite {
  def validate(schema: StructType): Unit = {
    require(schema.fieldNames.contains("value"),
      s"graft-log write requires a `value binary` column, got: ${schema.simpleString}")
    require(schema("value").dataType == BinaryType,
      s"`value` must be binary, got ${schema("value").dataType.simpleString}")
    if (schema.fieldNames.contains("key"))
      require(schema("key").dataType == BinaryType,
        s"`key` must be binary, got ${schema("key").dataType.simpleString}")
    if (schema.fieldNames.contains("timestamp"))
      require(schema("timestamp").dataType == TimestampType,
        s"`timestamp` must be timestamp, got ${schema("timestamp").dataType.simpleString}")
  }
}

case class FileLogTaskCommit(tmpPath: String, records: Long, partitionId: Int)
    extends WriterCommitMessage

class FileLogBatchWrite(path: String, schema: StructType) extends BatchWrite {

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new FileLogWriterFactory(path, schema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: FileLogTaskCommit => m }
    val total = msgs.map(_.records).sum
    if (total == 0) { msgs.foreach(m => new File(m.tmpPath).delete()); return }
    val d = new File(path)
    val staged = File.createTempFile(".stage-", "", d)
    var adopted = false
    try {
      val out = new BufferedOutputStream(new FileOutputStream(staged), 1 << 16)
      try msgs.sortBy(_.partitionId).foreach { m =>
        val f = new File(m.tmpPath)
        if (m.records > 0) java.nio.file.Files.copy(f.toPath, out)
        f.delete()
      } finally out.close()
      FileLog.adopt(path, staged, total) // the single commit point
      adopted = true
    } finally if (!adopted) staged.delete()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: FileLogTaskCommit => m }
      .foreach(m => new File(m.tmpPath).delete())
}

class FileLogWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FileLogDataWriter(path, schema, partitionId)
}

/** Streams one task's rows into a hidden temp file in [[FileLog]] wire
  * format. The temp name never matches the committed-segment pattern, so
  * concurrent readers ignore it until the driver's commit renames it. */
class FileLogDataWriter(dir: String, schema: StructType, partitionId: Int)
    extends DataWriter[InternalRow] {

  private val d = new File(dir)
  require(d.isDirectory || d.mkdirs() || d.isDirectory, s"cannot create $dir")
  private val tmp = File.createTempFile(".tmp-task-", "", d)
  private val out = new DataOutputStream(
    new BufferedOutputStream(new FileOutputStream(tmp), 1 << 16))
  private val keyIdx =
    if (schema.fieldNames.contains("key")) schema.fieldIndex("key") else -1
  private val valueIdx = schema.fieldIndex("value")
  private val tsIdx =
    if (schema.fieldNames.contains("timestamp")) schema.fieldIndex("timestamp")
    else -1
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (keyIdx < 0 || row.isNullAt(keyIdx)) out.writeInt(-1)
    else {
      val k = row.getBinary(keyIdx)
      out.writeInt(k.length); out.write(k)
    }
    if (row.isNullAt(valueIdx)) out.writeInt(-1)
    else {
      val v = row.getBinary(valueIdx)
      out.writeInt(v.length); out.write(v)
    }
    out.writeLong(if (tsIdx < 0 || row.isNullAt(tsIdx)) 0L else row.getLong(tsIdx))
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FileLogTaskCommit(tmp.getAbsolutePath, n, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    tmp.delete()
  }

  override def close(): Unit = ()
}

/** Streaming producer half: `df.writeStream.format("graft-log")` with the
  * epoch-aware two-phase commit Structured Streaming expects. Tasks stream
  * rows into hidden temp files exactly like the batch path; the driver's
  * per-epoch `commit` concatenates them (wire-format segments concatenate
  * byte-wise) into ONE staged file and adopts it with a single atomic
  * rename whose target name carries `-q<queryId>-e<epochId>`.
  *
  * Exactly-once over restart: Spark re-executes an epoch when the query
  * dies between sink commit and checkpoint advance, and `commit(epochId)`
  * is then called AGAIN for the same epoch. The tagged segment name makes
  * the RENAME itself the durable commit record — a replayed commit scans
  * for its tag, finds the segment, and deletes its temps instead of
  * re-appending. There is no separate marker write to crash between:
  * either the rename happened (replay skips) or it didn't (replay
  * re-stages and renames). Readers parse seq/records and ignore the tag. */
class FileLogStreamingWrite(dir: String, schema: StructType, queryId: String)
    extends StreamingWrite {

  private def tag(epochId: Long) = s"q$queryId-e$epochId"

  /** Committed iff a segment carries this epoch's tag — or, for a log
    * written by the earlier marker-based build of this sink, iff the
    * legacy `.epoch-<queryId>` high-water file covers the epoch (without
    * this, a checkpoint replay spanning the protocol change would
    * double-append the epoch it already adopted untagged). */
  private def alreadyCommitted(epochId: Long): Boolean = {
    if (FileLog.segments(dir)
        .exists(_.file.getName.contains(s"-${tag(epochId)}."))) return true
    val legacy = new File(dir, s".epoch-$queryId")
    legacy.isFile && {
      val covered = scala.util.Try(new String(
        java.nio.file.Files.readAllBytes(legacy.toPath), "UTF-8").trim.toLong)
        .toOption.exists(_ >= epochId)
      covered
    }
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FileLogStreamingWriterFactory(dir, schema)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.collect { case m: FileLogTaskCommit => m }
    if (alreadyCommitted(epochId)) {
      msgs.foreach(m => new File(m.tmpPath).delete()) // replayed epoch
      return
    }
    val total = msgs.map(_.records).sum
    if (total == 0) { msgs.foreach(m => new File(m.tmpPath).delete()); return }
    val d = new File(dir)
    if (!d.isDirectory) require(d.mkdirs() || d.isDirectory, s"cannot create $dir")
    // sweep staged leftovers from a crashed earlier commit (single-writer
    // contract: nothing else stages here) — they hold whole-epoch bytes
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(".stage-")).foreach(_.delete())
    val staged = File.createTempFile(".stage-", "", d)
    var adopted = false
    try {
      val out = new BufferedOutputStream(new FileOutputStream(staged), 1 << 16)
      try msgs.sortBy(_.partitionId).foreach { m =>
        val f = new File(m.tmpPath)
        if (m.records > 0) java.nio.file.Files.copy(f.toPath, out)
        f.delete()
      } finally out.close()
      FileLog.adoptTagged(dir, staged, total, tag(epochId))
      adopted = true
    } finally if (!adopted) staged.delete()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: FileLogTaskCommit => m }
      .foreach(m => new File(m.tmpPath).delete())
}

/** Top-level (serializable) streaming factory — an inner anonymous class
  * would capture the non-serializable driver-side StreamingWrite. */
class FileLogStreamingWriterFactory(path: String, schema: StructType)
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new FileLogDataWriter(path, schema, partitionId)
}
