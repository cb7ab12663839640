package graft.ops

import java.io.{DataInputStream, DataOutputStream}
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, not}
import org.apache.spark.util.SerializableConfiguration

import graft.functions.DvDeleted

/** DELETION-VECTOR sidecars — the merge-on-read half of row-level DML.
  *
  * A DV names the deleted ROW POSITIONS of exactly one immutable data
  * file; it lives as `_dv/dv-<uuid>.bin` under the table root and is
  * referenced from the manifest's `"dvs"` section (data file →
  * (dv name, cardinality)). DVs are WRITE-ONCE like every other
  * manifest-referenced artifact: growing a file's deletion set writes a
  * NEW sidecar holding the union and re-points the manifest entry — time
  * travel keeps resolving each version's own dv, and vacuum reclaims
  * sidecars no retained version references.
  *
  * Why positions, not keys: a one-row DELETE in a 1 GB file then costs
  * O(rows-in-file) compute (the victim scan that found the match was
  * already paid for victim discovery) but only O(deleted rows) WRITE —
  * the copy-on-write asymmetry this closes. Reads apply the bitmap as a
  * codegen'd filter ([[graft.functions.DvDeleted]]) over the v1 parquet
  * scan's `_metadata.row_index`; clean files never enter that branch.
  * Compaction/OPTIMIZE materializes deletions (rewrites serve the
  * filtered rows) and the entries drop with the rewritten files.
  *
  * Format: `GDV1` magic + int32 count + count × int64 ASCENDING row
  * indices (positions are parquet row indices within the file — the
  * same `_metadata.row_index` the scan serves). Raw longs keep the
  * codec trivial and seek-free; DVs are meant for SPARSE deletion (the
  * write path falls back to whole-file removal when every row dies, and
  * OPTIMIZE materializes heavy ones), so the 8 B/row constant is paid
  * on small sets. */
private[graft] object Dv {

  val DirName = "_dv"
  private val Magic = Array[Byte]('G', 'D', 'V', '1')

  def isDvName(name: String): Boolean =
    name.startsWith("dv-") && name.endsWith(".bin")

  /** Write one sidecar holding `sorted` (ascending, distinct) positions;
    * returns its `_dv/`-relative name. Callable from EXECUTORS (the DML
    * paths write per-victim-file sidecars in parallel). */
  def write(fs: FileSystem, tableRoot: Path, sorted: Array[Long]): String = {
    val name = s"dv-${UUID.randomUUID()}.bin"
    val dir = new Path(tableRoot, DirName)
    fs.mkdirs(dir)
    val out = new DataOutputStream(fs.create(new Path(dir, name), false))
    try {
      out.write(Magic)
      out.writeInt(sorted.length)
      var i = 0
      while (i < sorted.length) { out.writeLong(sorted(i)); i += 1 }
    } finally out.close()
    name
  }

  def read(fs: FileSystem, tableRoot: Path, name: String): Array[Long] = {
    val in = new DataInputStream(fs.open(new Path(new Path(tableRoot, DirName), name)))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(java.util.Arrays.equals(magic, Magic),
        s"$name is not a graft deletion vector (bad magic)")
      val n = in.readInt()
      val arr = new Array[Long](n)
      var i = 0
      while (i < n) { arr(i) = in.readLong(); i += 1 }
      arr
    } finally in.close()
  }

  /** Write-once cache of decoded sidecars (names are uuid-fresh per
    * write, so an entry can never go stale). Bounded by entry count —
    * DV sets are sparse by contract. */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, String), Array[Long]](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Array[Long]]): Boolean =
        size() > 256
    })

  /** The broadcast-ready deletion index of one table snapshot: the
    * table's QUALIFIED root prefix plus basename-bucketed
    * (dir-relative name, sorted positions) entries.
    *
    * File identity resolution (`positionsOf`) is EXACT when the scan
    * path carries the root prefix — strip it, compare the relative
    * path verbatim — so one live file's relative path being a suffix
    * of another's (`part-0.parquet` at the root vs
    * `k=1/part-0.parquet`) can never bind positions to the wrong
    * file. If the scan's rendering doesn't carry the prefix (a
    * foreign scheme spelling), the fallback is the LONGEST matching
    * segment-anchored suffix — most specific wins, which is exact
    * whenever the ambiguous sibling is also indexed and conservative
    * ordering otherwise. Buckets are keyed by basename because a
    * hive-partitioned write can mint the same basename under
    * different `k=v/` directories. */
  final case class Index(rootPrefix: String,
      buckets: Map[String, Seq[(String, Array[Long])]])
      extends Serializable {
    def positionsOf(absPath: String): Array[Long] = {
      val base = absPath.substring(absPath.lastIndexOf('/') + 1)
      buckets.get(base) match {
        case None => null
        case Some(entries) =>
          if (absPath.startsWith(rootPrefix)) {
            val rel = absPath.substring(rootPrefix.length)
            val it = entries.iterator
            while (it.hasNext) {
              val (name, arr) = it.next()
              if (name == rel) return arr
            }
            null
          } else {
            var bestLen = -1
            var best: Array[Long] = null
            val it = entries.iterator
            while (it.hasNext) {
              val (name, arr) = it.next()
              if (name.length > bestLen && absPath.endsWith("/" + name)) {
                bestLen = name.length
                best = arr
              }
            }
            best
          }
      }
    }
  }

  /** The qualified `<root>/` prefix scan paths of this table start
    * with — what exact relative-path identity strips. */
  def rootPrefixOf(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.makeQualified(p).toString.stripSuffix("/") + "/"
  }

  /** Decode every referenced sidecar into an [[Index]]. Driver-side,
    * cached; the result is broadcast to the scan filter. */
  def loadBitmaps(spark: SparkSession, dir: String,
      dvs: Map[String, (String, Long)]): Index = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = dvs.toSeq.map { case (dataFile, (dvName, _)) =>
      val key = (dir, dvName)
      val arr = Option(cache.get(key)).getOrElse {
        val a = read(fs, p, dvName)
        cache.put(key, a)
        a
      }
      val base = dataFile.substring(dataFile.lastIndexOf('/') + 1)
      (base, (dataFile, arr))
    }.groupBy(_._1).map { case (b, es) => b -> es.map(_._2) }
    Index(rootPrefixOf(spark, dir), buckets)
  }

  /** Apply `dvs` to a scan of (some of) the table's files: requires the
    * frame to be a V1 file-source scan (so `_metadata` resolves), keeps
    * only rows whose position is not deleted, and serves the original
    * columns. */
  def applyToScan(spark: SparkSession, dir: String, df: DataFrame,
      dvs: Map[String, (String, Long)]): DataFrame = {
    if (dvs.isEmpty) return df
    val bc: Broadcast[Index] =
      spark.sparkContext.broadcast(loadBitmaps(spark, dir, dvs))
    val keep = df.columns.map(col).toSeq
    df.filter(not(deletedCol(bc)))
      .select(keep: _*)
  }

  /** The `DvDeleted(_metadata.file_path, _metadata.row_index)` column. */
  def deletedCol(bc: Broadcast[Index]): Column =
    DvDeleted.of(col("_metadata.file_path"), col("_metadata.row_index"), bc)

  /** A serializable FS handle factory for executor-side sidecar writes. */
  def confBroadcast(spark: SparkSession): Broadcast[SerializableConfiguration] =
    spark.sparkContext.broadcast(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration))
}
