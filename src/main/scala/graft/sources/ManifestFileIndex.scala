package graft.sources

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{PartitionSpec, PartitioningAwareFileIndex}

/** A [[org.apache.spark.sql.execution.datasources.FileIndex]] fabricated
  * ENTIRELY from one manifest body — names, byte lengths, and mtimes all
  * come from the committed `filestat` inventory, so planning a scan of a
  * tracked table makes ZERO filesystem calls: no per-file stat, no
  * directory listing, no distributed listing job. This is the planning
  * cost profile a million-file table needs (the measured alternative:
  * handing Spark's `ParquetTable` an explicit list of N file paths costs
  * an O(N) `InMemoryFileIndex` discovery — ~8s at 2048 files on a warm
  * LOCAL fs, unbounded on an object store — and that cost was paid at
  * EVERY query even when the schema was already carried).
  *
  * Byte lengths must be exact (the parquet footer is located at
  * `len - 8`); they come from real `FileStatus` values captured at commit
  * time, and files missing from the inventory (manifests written before
  * the field, stat failures at commit) are filled by the caller with ONE
  * `listStatus` of the table dir — a single RPC, not O(files) stats
  * ([[ManifestTableProvider]]).
  *
  * HIVE-PARTITIONED layouts: manifest file names may carry directory
  * segments (`date=2024-01-01/part-….parquet` — [[graft.ops.TableManifest
  * .init]] sweeps them recursively), and the partition spec is inferred
  * from those NAME-embedded `k=v` segments by Spark's own
  * `inferPartitioning` over the fabricated statuses — the partition
  * columns and their values come out of the manifest body alone, so
  * partition PRUNING is as zero-FS-call as the rest of planning. A flat
  * layout short-circuits to the empty spec without running inference
  * (the hot path is unchanged). `basePath` is pinned to the table root
  * so inference can never mis-anchor on a single-partition snapshot.
  *
  * Everything downstream of planning is stock Spark: the index feeds the
  * normal `ParquetScanBuilder`, so split sizing (`maxPartitionBytes`),
  * pushdown, partition pruning, vectorized reads, and
  * `sizeInBytes`-driven broadcast decisions all see the same numbers a
  * listed index would serve.
  *
  * `userSchema`: when the table DECLARES its partition column types (the
  * manifest's `partschemab64`, e.g. a `CREATE TABLE … PARTITIONED BY`
  * declaring `bucket BIGINT`), those types are handed to Spark's own
  * inference so the name-carried VALUES are cast to the declared types —
  * exactly how catalog-typed partition columns behave everywhere else in
  * Spark. Without it, `bucket=0` would infer as INT even on a
  * declared-BIGINT table (and an EMPTY snapshot of the same table, which
  * serves the declared schema, would disagree with the live one).
  * Columns absent from `userSchema` keep plain inference. */
private[graft] final class ManifestFileIndex(
    spark: SparkSession, dir: Path, statuses: Array[FileStatus],
    userSchema: Option[org.apache.spark.sql.types.StructType] = None)
    extends PartitioningAwareFileIndex(spark,
      Map("basePath" -> dir.toString), userSchema) {

  private lazy val spec: PartitionSpec =
    if (statuses.forall(_.getPath.getParent == dir)) PartitionSpec.emptySpec
    else inferPartitioning()

  override def partitionSpec(): PartitionSpec = spec

  override val leafFiles: mutable.LinkedHashMap[Path, FileStatus] =
    mutable.LinkedHashMap(statuses.map(s => s.getPath -> s).toSeq: _*)

  override val leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    statuses.groupBy(_.getPath.getParent)

  override def rootPaths: Seq[Path] = Seq(dir)

  /** The manifest snapshot is immutable — a "refresh" would be a
    * different version, i.e. a different index. */
  override def refresh(): Unit = ()
}
