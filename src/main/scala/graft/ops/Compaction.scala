package graft.ops

import java.util.UUID

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet directories.
  *
  * A streaming sink or a fine-grained partitioned write leaves thousands of
  * KB-sized part files; at 100 TB that is the difference between a scan
  * scheduling a handful of multi-file tasks and a scan scheduling one task
  * (plus one open + footer read) per tiny file. The fix is periodic
  * compaction: rewrite ONLY the under-sized files into ~`targetBytes`
  * outputs and leave right-sized files untouched (rewriting data that is
  * already well laid out wastes the cluster's IO budget — incremental
  * compaction touches each byte once, full rewrites touch every byte every
  * run).
  *
  * Scale notes:
  *   - The rewrite is `spark.read.parquet(smallFiles).coalesce(n)`:
  *     coalesce is a partition merge, NOT a shuffle — each output task
  *     streams several input files and writes one output file, so the job
  *     moves every rewritten byte exactly once and nothing else.
  *   - Only file METADATA (names + lengths) is listed on the driver; at a
  *     million files that is an RPC problem for the namenode, not a memory
  *     problem here.
  *   - The in-place swap (write to `_compaction_tmp`, move outputs in,
  *     delete originals) is not atomic on a plain filesystem: a reader
  *     racing the swap can see both copies, and a crash between move and
  *     delete leaves duplicates. Real table formats (Delta/Iceberg) solve
  *     this with a metadata commit; on raw directories, schedule compaction
  *     when the directory has no concurrent readers, or compact into a
  *     fresh directory with [[compactTo]] and swap at the path level.
  *
  * Mirrors the maintenance job the reference leaves implicit — its batch
  * ETL rewrites the whole catalog every cycle
  * (`/root/reference/services/spark_batch_processor.py:106`), which only
  * works at 1.5 MB; this is the scale-safe form.
  */
object Compaction {

  /** What a compaction run would touch: `small` get rewritten into
    * `targetFiles` outputs, `large` are left in place. */
  final case class Plan(
      small: Seq[FileStatus],
      large: Seq[FileStatus],
      smallBytes: Long,
      targetFiles: Int)

  final case class Stats(filesBefore: Int, filesAfter: Int, bytesRewritten: Long)

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Data files in `dir` (skips `_SUCCESS`, checksums and other hidden
    * bookkeeping the parquet committer leaves behind). */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[FileStatus] =
    fs.listStatus(dir).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Data files under `dir` at any depth (hidden dirs pruned). */
  private def dataFilesRecursive(fs: FileSystem, dir: Path): Seq[FileStatus] =
    dataFiles(fs, dir) ++ fs.listStatus(dir).toSeq
      .filter { s =>
        val n = s.getPath.getName
        s.isDirectory && !n.startsWith("_") && !n.startsWith(".")
      }
      .flatMap(s => dataFilesRecursive(fs, s.getPath))

  /** Leaf partition directories of a hive-layout table: descend `k=v`
    * directories to any depth; a leaf is a `k=v` directory with no `k=v`
    * children. Empty when `dir` is not partitioned. */
  private def partitionLeaves(fs: FileSystem, dir: Path): Seq[Path] = {
    val parts = fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    parts.flatMap { d =>
      val deeper = partitionLeaves(fs, d.getPath)
      if (deeper.isEmpty) Seq(d.getPath) else deeper
    }
  }

  /** Split the directory's files into rewrite candidates (< `minFileBytes`)
    * and keepers, and size the output file count so each output lands near
    * `targetBytes` (parquet in ≈ parquet out: same encoding + compression,
    * so input bytes are an honest estimate of output bytes).
    *
    * The candidate set comes from the SAME source [[compactInPlace]] will
    * use: the head manifest on a [[TableManifest]]-tracked directory (so a
    * dry run never sizes a maintenance window from delisted-but-not-yet-
    * vacuumed fragments the real run would not touch), the directory
    * listing otherwise. */
  def plan(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      minFileBytes: Long): Plan = {
    val (fs, p) = fsFor(spark, dir)
    val files = trackedFiles(spark, fs, p, dir).getOrElse(dataFiles(fs, p))
    val (small, large) = files.partition(_.getLen < minFileBytes)
    val smallBytes = small.map(_.getLen).sum
    val n = math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
    Plan(small, large, smallBytes, n)
  }

  /** Statuses of the head manifest's files on a tracked dir (None when
    * untracked). ONE `listStatus` filtered to the manifest set — never a
    * per-file `getFileStatus` loop, which at 100k head files is 100k
    * serial driver→namenode RPCs per call (the exact RPC storm the
    * scaladoc above warns about). A manifest-listed file missing from the
    * listing fails loudly: the head must always be a complete file set. */
  private def trackedFiles(spark: SparkSession, fs: FileSystem, p: Path,
      dir: String): Option[Seq[FileStatus]] =
    TableManifest.readHead(spark, dir)
      .map { case (_, names, _) => resolveListed(fs, p, dir, names) }

  /** Shared body of the manifest-set lookup: one `listStatus`, filtered to
    * `names`, loud on a missing file. Callers that already hold the head
    * (e.g. [[compactInPlace]]'s CAS loop) pass its name list directly so
    * the candidate set and the CAS expectation come from the SAME read. */
  private def resolveListed(fs: FileSystem, p: Path, dir: String,
      names: Seq[String]): Seq[FileStatus] = {
    val listed = dataFiles(fs, p).map(s => s.getPath.getName -> s).toMap
    names.map(n => listed.getOrElse(n,
      sys.error(s"manifest-listed file missing from $dir: $n")))
  }

  /** Incremental in-place compaction of one directory: rewrite the
    * under-sized files into ~`targetBytes` outputs alongside the untouched
    * right-sized ones. Returns what changed. No-op (zero bytes moved) when
    * fewer than two files are under the threshold.
    *
    * When the directory is [[TableManifest]]-tracked, the swap is
    * READER-ATOMIC: the candidate set comes from the head manifest, the
    * rewritten files move in under fresh names (invisible until listed),
    * and the single commit point is the next manifest version listing
    * keepers + compacted outputs. The replaced fragments are NOT deleted
    * here — readers of the old head keep a complete file set until the
    * caller's [[TableManifest.vacuum]] grace period expires. On an
    * untracked plain directory the legacy move-in-then-delete swap applies,
    * with the non-atomicity documented above. */
  def compactInPlace(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L << 20,
      minFileBytes: Long = 64L << 20): Stats = {
    val (fs, p) = fsFor(spark, dir)
    // Tracked tables: compaction is a READ-MODIFY-WRITE of the file list,
    // so the commit must be a compare-and-swap against the head version
    // the candidate set was read from — a plain commit would overwrite
    // manifest versions landed mid-rewrite (e.g. streaming-append
    // batches), and the next vacuum would delete their data. On conflict
    // the rewritten outputs are discarded and the whole pass retries
    // against the fresh head (the rewrite cost is the price of losing the
    // race; correctness never depends on winning it).
    var attempt = 0
    while (true) {
      attempt += 1
      val tracked = TableManifest.readHead(spark, dir)
      val files = tracked match {
        case Some((_, names, _)) =>
          // hive-partitioned layouts: rewriting fragments at the table
          // root would strip the name-carried partition values (the
          // TableManifest.requireFlatLayout rationale) — refuse loudly
          // instead of failing with a confusing missing-file error
          require(!names.exists(_.contains("/")),
            s"compactInPlace: $dir is hive-partitioned (manifest names " +
              "carry directory segments); compaction would strip the " +
              "name-carried partition values")
          resolveListed(fs, p, dir, names)
        case None => dataFiles(fs, p)
      }
      val (small, large) = files.partition(_.getLen < minFileBytes)
      val before = files.size
      if (small.size < 2) return Stats(before, before, 0L)
      val smallBytes = small.map(_.getLen).sum
      val targetFiles =
        math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt

      val tmp = new Path(p, s"_compaction_tmp-${UUID.randomUUID()}")
      // mergeSchema: fragments written under an evolved schema keep their
      // later-added columns instead of being silently projected away —
      // but on a TRACKED table the rewrite is projected to the DECLARED
      // schema, so a dropColumns'd column in old footers is physically
      // purged by compaction instead of re-entering the carried schema
      // renamed tables: fold old physical columns into the logical names
      // BEFORE the declared projection, so compaction rewrites carriers
      // to the logical schema (shrinking the rename's carrier set)
      // deletion vectors applied FIRST: compaction is what MATERIALIZES
      // merge-on-read deletions — the rewrite must not resurrect them,
      // and the rewritten files drop their dv references with the swap
      val rewritten = TableManifest.projectToDeclared(
        TableManifest.coalesceRenamed(
          TableManifest.dropDeleted(spark, dir,
            // declared-schema scan when footers are provably homogeneous
            // (the rewriteScan rationale) — mergeSchema inference over
            // every small file otherwise precedes each compaction pass
            TableManifest.rewriteScanPaths(spark, dir,
              small.map(_.getPath.toString), tracked.flatMap(_ =>
                TableManifest.headSnapOpt(spark, dir)), Seq.empty),
            small.map(_.getPath.getName),
            if (tracked.isDefined) TableManifest.readDvs(spark, dir)
            else Map.empty),
          if (tracked.isDefined) TableManifest.readRenames(spark, dir)
          else Seq.empty),
        if (tracked.isDefined) TableManifest.readSchema(spark, dir) else None,
        Seq.empty)
      rewritten.coalesce(targetFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      // Move the rewritten files in first: a crash mid-swap duplicates rows
      // on an untracked dir (documented above) but never loses them; on a
      // tracked dir unlisted files are simply invisible.
      val moved = dataFiles(fs, tmp).map { s =>
        val dest = new Path(p, s"compacted-${s.getPath.getName}")
        require(fs.rename(s.getPath, dest), s"rename failed: ${s.getPath}")
        dest
      }
      fs.delete(tmp, true)
      tracked match {
        case Some((headV, _, hwm)) => // CAS commit; old fragments await vacuum
          // declare the rewrite's schema: skips commitIf's delta footer
          // inference, and the fragments' columns are all in it (merged)
          TableManifest.commitIf(spark, dir,
            large.map(_.getPath.getName) ++ moved.map(_.getName),
            expectedHead = headV, hwm = hwm,
            schema = Some(rewritten.schema)) match {
            case Some(_) =>
              return Stats(before, large.size + moved.size, smallBytes)
            case None =>
              moved.foreach(m => fs.delete(m, false)) // lost the race
              if (attempt >= 5) sys.error(
                s"compaction of $dir lost $attempt manifest races; giving up")
          }
        case None =>
          small.foreach(s => fs.delete(s.getPath, false))
          return Stats(before, large.size + moved.size, smallBytes)
      }
    }
    Stats(0, 0, 0L) // unreachable
  }

  /** PARTITION-scoped compaction of a hive-partitioned MANIFEST table —
    * the maintenance a partitioned tracked table gets, since whole-table
    * [[compactInPlace]] refuses the layout (a root-level rewrite would
    * strip the name-carried partition values). The under-sized files of
    * exactly ONE partition (`partition` = its `k=v[/k2=v2]` prefix) are
    * rewritten into ~`targetBytes` outputs that move back in UNDER THE
    * SAME partition directory, so the name-carried values are preserved
    * and every other partition stays byte-identical. Reader-atomic via
    * the victim-splice CAS ([[TableManifest]] internals — concurrent
    * maintenance commits retry, never blend); file lengths come from the
    * committed filestat inventory (no per-file stats; gaps stat
    * directly, O(partition)). Replaced fragments await
    * [[TableManifest.vacuum]], which walks partition dirs. */
  def compactPartition(
      spark: SparkSession,
      dir: String,
      partition: String,
      targetBytes: Long = 128L << 20,
      minFileBytes: Long = 64L << 20): Stats = {
    val prefix = partition.stripSuffix("/") + "/"
    val (fs, p) = fsFor(spark, dir)
    var attempt = 0
    while (attempt < 5) {
      attempt += 1
      val (headV, names, hwm) = TableManifest.readHead(spark, dir)
        .getOrElse(sys.error(s"compactPartition: $dir is not manifest-tracked"))
      require(names.exists(_.contains("/")),
        s"compactPartition: $dir is not hive-partitioned; use compactInPlace")
      val inPart = names.filter(_.startsWith(prefix))
      // a vanished partition is LOUD on the first attempt (typo'd spec,
      // silent no-op is the failure mode); on a retry it means a racing
      // drop won the CAS — nothing left to compact is then a clean no-op
      if (inPart.isEmpty) {
        if (attempt == 1) sys.error(
          s"compactPartition: no files under partition '$partition' in $dir")
        return Stats(0, 0, 0L)
      }
      // the spec must address a LEAF partition: compacting a prefix of a
      // deeper layout would read the sub-partition files WITHOUT their
      // name-carried values and rewrite them one level up — permanently
      // stripping those values (the requireFlatLayout corruption class)
      val deeper = inPart.filter(_.stripPrefix(prefix).contains("/"))
      require(deeper.isEmpty,
        s"compactPartition: '$partition' is not a leaf partition " +
          s"(deeper levels exist, e.g. ${deeper.head}); address the full " +
          "k=v/.../kN=vN prefix")
      val inventory = TableManifest.readFileStat(spark, dir)
      def len(n: String): Long = inventory.get(n).map(_._1).getOrElse(
        fs.getFileStatus(new Path(p, n)).getLen)
      val (small, large) = inPart.partition(len(_) < minFileBytes)
      if (small.size < 2) return Stats(inPart.size, inPart.size, 0L)
      val smallBytes = small.map(len).sum
      val targetFiles =
        math.max(1L, (smallBytes + targetBytes - 1) / targetBytes).toInt
      val tmp = new Path(p, s"_compaction_tmp-${UUID.randomUUID()}")
      // projected to the declared schema (the compactInPlace rationale)
      // same rename folding as compactInPlace
      val rewritten = TableManifest.projectToDeclared(
        TableManifest.coalesceRenamed(
          TableManifest.dropDeleted(spark, dir,
            // declared-schema scan when footers are provably homogeneous
            // (rewriteScan rationale); partCols deliberately empty — a
            // partition-scoped rewrite reads data columns only, the
            // name-carried values stay in the directory name
            TableManifest.rewriteScanPaths(spark, dir,
              small.map(n => s"$dir/$n"),
              TableManifest.headSnapOpt(spark, dir), Seq.empty),
            small, TableManifest.readDvs(spark, dir)),
          TableManifest.readRenames(spark, dir)),
        TableManifest.readSchema(spark, dir), Seq.empty)
      rewritten.coalesce(targetFiles)
        .write.mode("overwrite").parquet(tmp.toString)
      val moved = dataFiles(fs, tmp).map { s =>
        val name = s"${prefix}compacted-${s.getPath.getName}"
        require(fs.rename(s.getPath, new Path(p, name)),
          s"rename failed: ${s.getPath}")
        name
      }
      fs.delete(tmp, true)
      val smallSet = small.toSet
      // dv state the rewrite APPLIED — a re-CAS below is only sound while
      // the victims' dv entries still read exactly like this (a racing dv
      // DELETE on a victim otherwise resurrects its rows in the rewrite)
      val dvApplied = TableManifest.readDvs(spark, dir)
        .filter(kv => smallSet(kv._1))
      // CHEAP re-CAS: a lost race whose winner left every victim listed
      // with unchanged dvs (the common case — another LEAF's concurrent
      // compaction, a stats commit, an append elsewhere) re-attempts the
      // commit against the fresh head without re-running the rewrite;
      // only a winner that actually touched the victims (vanished file,
      // dv drift) discards the outputs and re-plans. This is what makes
      // compacting leaves CONCURRENTLY converge without quadratic
      // rewrite waste — the spliceCommit discipline applied here.
      var cas = 0
      var replan = false
      while (!replan && cas < 64) {
        cas += 1
        val (hv2, snapNow) = TableManifest.headSnapVersioned(spark, dir)
          .getOrElse(
            sys.error(s"compactPartition: manifest vanished under $dir"))
        if (!smallSet.subsetOf(snapNow.files.toSet) ||
          snapNow.dvs.filter(kv => smallSet(kv._1)) != dvApplied) {
          moved.foreach(m => fs.delete(new Path(p, m), false))
          replan = true // victims touched: outputs are stale, re-plan
        } else TableManifest.commitIf(spark, dir,
          snapNow.files.filterNot(smallSet) ++ moved,
          expectedHead = hv2, hwm = snapNow.hwm) match {
          case Some(_) =>
            return Stats(inPart.size, large.size + moved.size, smallBytes)
          case None => () // head moved again; loop re-validates victims
        }
      }
      if (!replan)
        sys.error(s"compactPartition of $dir:$partition lost $cas CAS races")
    }
    sys.error(s"compactPartition of $dir:$partition lost 5 manifest races")
  }

  /** Layout-dispatching OPTIMIZE of one tracked table — what SQL
    * `OPTIMIZE t` (no PARTITION clause) runs: a flat table goes through
    * [[compactInPlace]]; a hive-partitioned one compacts EVERY leaf
    * partition via [[compactPartition]] (leaves enumerated from the head
    * manifest NAMES — no filesystem listing), stats summed. Leaves stay
    * independent commits: each is its own CAS splice, so a failure (or a
    * lost race) affects one partition and every untouched leaf remains
    * byte-identical — the per-leaf isolation a 100 TB maintenance window
    * needs, at the cost of one manifest version per compacted leaf. */
  def compactTracked(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L << 20,
      minFileBytes: Long = 64L << 20): Stats =
    TableManifest.read(spark, dir) match {
      case Some((_, names)) if names.exists(_.contains("/")) =>
        val leaves = names.filter(_.contains("/"))
          .map(n => n.substring(0, n.lastIndexOf('/'))).distinct.sorted
        // Overlap independent leaf compactions from a small driver pool
        // (guide §2.6): leaves touch disjoint victim sets, so the only
        // interaction is the manifest CAS — which the cheap re-CAS in
        // [[compactPartition]] absorbs without re-rewriting. Serially,
        // every leaf's read+write+commit latency added up end-to-end; a
        // few in flight keep the cluster busy through each leaf's tail
        // (a 100 TB table has thousands of leaves). Bounded at 4: enough
        // to fill commit/straggler gaps, not enough to thrash the CAS.
        val par = math.max(1, math.min(4, leaves.size))
        val results =
          if (par == 1)
            leaves.map(compactPartition(spark, dir, _, targetBytes,
              minFileBytes))
          else {
            val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.fromExecutor(pool)
            try scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(leaves.map(leaf =>
                scala.concurrent.Future(
                  compactPartition(spark, dir, leaf, targetBytes,
                    minFileBytes)))),
              scala.concurrent.duration.Duration.Inf)
            finally pool.shutdown()
          }
        results.foldLeft(Stats(0, 0, 0L)) { (acc, s) =>
          Stats(acc.filesBefore + s.filesBefore,
            acc.filesAfter + s.filesAfter,
            acc.bytesRewritten + s.bytesRewritten)
        }
      case _ => compactInPlace(spark, dir, targetBytes, minFileBytes)
    }

  /** Z-order OPTIMIZE of one tracked table — what SQL
    * `OPTIMIZE t [PARTITION (k=v)] ZORDER BY (a, b)` runs. Dispatch:
    * one addressed leaf → [[TableManifest.optimizeZOrderPartition]];
    * partitioned, no spec → every leaf, one CAS splice each (the
    * compactTracked isolation); flat → whole-table
    * [[TableManifest.optimizeZOrderRange]]. The output file count per
    * scope targets ~`targetBytes` from the committed filestat inventory
    * (gaps stat directly), so a re-cluster never funnels a big scope
    * through one file or shatters a small one. Returns compaction-shaped
    * stats: files before/after in the rewritten scope and bytes
    * rewritten (a z-order rewrites every byte in scope — that's the
    * point; scope it with PARTITION, or at the library level with
    * optimizeZOrderRange's bounds, when the table is large). */
  def zorderTracked(
      spark: SparkSession,
      dir: String,
      partition: Option[String],
      a: String,
      b: String): Stats =
    zorderTracked(spark, dir, partition, Seq(a, b))

  def zorderTracked(
      spark: SparkSession,
      dir: String,
      partition: Option[String],
      cols: Seq[String],
      targetBytes: Long = 128L << 20): Stats = {
    val (_, names) = TableManifest.read(spark, dir).getOrElse(
      sys.error(s"zorderTracked: $dir is not manifest-tracked"))
    val inventory = TableManifest.readFileStat(spark, dir)
    val (fs, p) = fsFor(spark, dir)
    def len(n: String): Long = inventory.get(n).map(_._1).getOrElse(
      fs.getFileStatus(new Path(p, n)).getLen)
    def filesOf(scope: Seq[String]): (Long, Int) =
      (scope.map(len).sum, scope.size)
    def nFiles(bytes: Long): Int =
      math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    def scopeAfter(pred: String => Boolean): Int =
      TableManifest.read(spark, dir).get._2.count(pred)
    val partitioned = names.exists(_.contains("/"))
    partition match {
      case Some(part) =>
        val prefix = part.stripSuffix("/") + "/"
        val scope = names.filter(_.startsWith(prefix))
        val (bytes, before) = filesOf(scope)
        TableManifest.optimizeZOrderPartition(spark, dir, part, cols,
          nFiles(bytes))
        Stats(before, scopeAfter(_.startsWith(prefix)), bytes)
      case None if partitioned =>
        val leaves = names.filter(_.contains("/"))
          .map(n => n.substring(0, n.lastIndexOf('/'))).distinct.sorted
        // overlap independent leaf re-clusters (the compactTracked
        // pool rationale): per-leaf victim sets are disjoint, sibling
        // commits converge through spliceCommit's cheap CAS retry, and
        // withMaintenanceRetry re-plans only a leaf whose victims were
        // actually touched
        val par = math.max(1, math.min(4, leaves.size))
        val results =
          if (par == 1)
            leaves.map(l => zorderTracked(spark, dir, Some(l), cols,
              targetBytes))
          else {
            val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
            implicit val ec: scala.concurrent.ExecutionContext =
              scala.concurrent.ExecutionContext.fromExecutor(pool)
            try scala.concurrent.Await.result(
              scala.concurrent.Future.sequence(leaves.map(leaf =>
                scala.concurrent.Future(
                  zorderTracked(spark, dir, Some(leaf), cols,
                    targetBytes)))),
              scala.concurrent.duration.Duration.Inf)
            finally pool.shutdown()
          }
        results.foldLeft(Stats(0, 0, 0L)) { (acc, s) =>
          Stats(acc.filesBefore + s.filesBefore,
            acc.filesAfter + s.filesAfter,
            acc.bytesRewritten + s.bytesRewritten)
        }
      case None =>
        val (bytes, before) = filesOf(names)
        TableManifest.optimizeZOrderRange(spark, dir, cols, Seq.empty,
          nFiles(bytes))
        Stats(before, scopeAfter(_ => true), bytes)
    }
  }

  /** Full rewrite of `src` into `dest` at ~`targetBytes` per file — the
    * safe variant when the path-level swap can be done by the caller.
    * Sizes the output from ALL bytes under `src` (any nesting depth), so a
    * hive-partitioned source is rewritten into `ceil(bytes/target)` files,
    * never funneled through one task. Note: partition-directory columns of
    * a partitioned `src` become ordinary data columns in `dest` — use
    * [[compactPartitioned]] to keep the layout. */
  def compactTo(
      spark: SparkSession,
      src: String,
      dest: String,
      targetBytes: Long = 128L << 20): Stats = {
    val (fs, s) = fsFor(spark, src)
    val files = dataFilesRecursive(fs, s)
    val bytes = files.map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src)
      .coalesce(n)
      .write.mode("overwrite").parquet(dest)
    val (dfs, d) = fsFor(spark, dest)
    Stats(files.size, dataFiles(dfs, d).size, bytes)
  }

  /** Compact every leaf partition of a hive-layout table
    * (`dir/k=v/.../part-*.parquet`, any partition depth), one in-place run
    * per leaf — partitions are independent, so each stays a separate small
    * job and a failure affects one partition, not the table. Keys of the
    * returned map are the leaf paths relative to `dir`
    * (e.g. `date=2026-08-13/lang=en`). */
  def compactPartitioned(
      spark: SparkSession,
      dir: String,
      targetBytes: Long = 128L << 20,
      minFileBytes: Long = 64L << 20): Map[String, Stats] = {
    val (fs, p) = fsFor(spark, dir)
    // qualify the base like the listed leaf statuses are, so the relativize
    // below can't silently no-op when `dir` is relative or scheme-less
    val base = fs.makeQualified(p).toUri.getPath
    partitionLeaves(fs, p).map { leaf =>
      val rel = fs.makeQualified(leaf).toUri.getPath
        .stripPrefix(base).stripPrefix("/")
      rel -> compactInPlace(spark, leaf.toString, targetBytes, minFileBytes)
    }.toMap
  }
}
