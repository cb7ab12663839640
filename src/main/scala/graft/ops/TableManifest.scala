package graft.ops

import java.nio.charset.StandardCharsets
import java.util.{Base64, UUID}

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graft.SchemaBridge
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Reader-atomic, LOG-STRUCTURED commit protocol for raw parquet
  * directories — the public Delta/Iceberg core idea at file-listing
  * scale, with none of the format: a table's live data files are
  * whatever its newest manifest RESOLVES to, and a commit is the atomic
  * creation of the next manifest version. Data files themselves are
  * immutable and only ever ADDED; removal is a version that stops
  * listing them plus a later [[vacuum]].
  *
  * Layout: `dir/_manifest/v<20-digit>.json`. A version's body is either
  * a CHECKPOINT — the complete snapshot
  * `{"version":N,…,"files":["name", ...]}` of dir-relative names — or a
  * DELTA record (`"delta":1,"base":B` + added/removed names + stat
  * overlays; see [[DeltaBaseRe]]), the log-structured form that makes a
  * commit cost O(what changed) instead of O(table): the hot append path
  * writes ~batch-sized records ([[commitAppendDelta]] — measured 28 ms
  * at 1M files vs the 11 s full-body render+parse it replaced), and a
  * checkpoint re-anchors the chain every [[checkpointInterval]] commits
  * (or whenever the delta would not be materially smaller — snapshot
  * replaces, analyze sweeps), bounding every replay. Readers list
  * `_manifest/`, take the highest version, and resolve it by replaying
  * checkpoint+deltas ([[resolveSnap]], cache-amortized to one listing
  * per unchanged head) — so a reader that starts mid-commit sees the old
  * state or the new one, never a mix, on ANY filesystem with atomic
  * single-file rename (local, HDFS; the rename-into-place is the commit
  * point). Concurrent committers race on creating the same version name:
  * the loser's rename fails (destination exists) and retries against the
  * refreshed head, giving last-writer-wins snapshot semantics without
  * locks.
  *
  * Crash safety: a crash before the rename leaves only a `.tmp-` file
  * (ignored by readers, removed by [[vacuum]]); a crash after the rename
  * but before any cleanup leaves orphan data files that no manifest head
  * references — invisible to readers, reclaimed by [[vacuum]]. There is no
  * window in which a reader can observe duplicated or missing rows.
  *
  * Same-version races: manifest creation is EXCLUSIVE — local
  * filesystems use an O_EXCL `CREATE_NEW` (the kernel linearizes racing
  * creators; POSIX rename would overwrite silently and lose a confirmed
  * commit), HDFS uses rename-into-place which fails on an existing
  * destination. Versions are dense, so winning the create of `v+1` IS the
  * commit's linearization point: [[commitIf]] exposes that as
  * compare-and-swap for read-modify-write callers (tracked compaction,
  * the streaming append sink), while [[commit]] retries it for
  * last-writer-wins snapshot replacement (publish).
  *
  * Deliberately NOT here: optimistic-conflict RESOLUTION beyond
  * last-writer-wins / CAS-retry (no column-level conflict analysis — a
  * racing writer re-reads and re-derives), and multi-table transactions
  * — at that point use a real table format. File names are written by
  * this module (UUID-based ASCII), so the JSON needs no string
  * escaping.
  *
  * The manifest DOES carry the table schema (base64 of Spark's schema
  * JSON — base64's charset keeps the no-escaping invariant): without it,
  * every read must either sample ONE footer (silently dropping columns a
  * later commit added — the order-dependent bug
  * `ManifestProviderEvolutionSpec` pins) or merge ALL footers — an
  * O(files) metadata sweep at every planning, which at 100 TB is exactly
  * the cost table formats exist to avoid. Appends MERGE their batch
  * schema into the head's (same merge as parquet's own `mergeSchema`);
  * snapshot replacement ([[publish]]) REPLACES it. Manifests written
  * before the field existed read through the merged-footer fallback until
  * [[analyzeSchema]] bootstraps them.
  *
  * The reference overwrites its one output in place
  * (`/root/reference/services/spark_batch_processor.py:106`) and relies on
  * nobody reading during the batch window; this is the scale- and
  * concurrency-safe replacement.
  */
object TableManifest {

  private val ManifestDir = "_manifest"

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".json"))
      name.stripPrefix("v").stripSuffix(".json").toLongOption
    else None

  private def manifestPath(table: Path, v: Long): Path =
    new Path(new Path(table, ManifestDir), f"v$v%020d.json")

  /** Highest committed (version, files) under `dir`, if any. */
  def read(spark: SparkSession, dir: String): Option[(Long, Seq[String])] =
    readHead(spark, dir).map { case (v, files, _) => v -> files }

  /** Per-file → per-column → (min, max) data-skipping stats. */
  type FileStats = Map[String, Map[String, (Long, Long)]]

  /** String twin of [[FileStats]] for category columns (source, lang). */
  type FileStringStats = Map[String, Map[String, (String, String)]]

  /** Per-file → per-column → hex-encoded bloom bitmap, for POINT-lookup
    * skipping on high-cardinality long columns (ids) where min/max ranges
    * prune nothing — every file's range spans the key space, but a 1 KiB
    * bloom answers "this id is definitely not here" per file. */
  type FileBloom = Map[String, Map[String, String]]

  /** Bits / hash-count of the manifest blooms: 8192 bits (1 KiB hex) and
    * 6 hashes ≈ 2% false-positive at ~800 distinct keys per file-bloom
    * saturating gracefully — a saturated bloom only stops pruning. */
  val BloomBits = 8192
  val BloomHashes = 6

  /** String stat values must keep the manifest's no-escaping invariant: a
    * value outside this charset (or too long / possibly truncated by the
    * parquet writer) is DROPPED, which only costs pruning power, never
    * correctness. */
  private val SafeStatValue = "[A-Za-z0-9_.:/+=@%-]{0,64}".r

  /** The `"files":[...]` array specifically — anchored on its key, never on
    * the first/last bracket of the body, because the trailing `stats`
    * object also contains brackets. File names are this module's ASCII
    * UUIDs, so neither quotes nor brackets appear inside a name. */
  private def parseFiles(json: String): Seq[String] =
    parseNameArray(json, "files")

  /** A top-level `"<key>":["name", ...]` array of file names. The name
    * sections (`files` / `adds` / `removes`) are always rendered BEFORE
    * the stat objects, so a stats column that happens to share a key name
    * can never win the indexOf. */
  private def parseNameArray(json: String, key: String): Seq[String] = {
    val k = "\"" + key + "\":["
    val start = json.indexOf(k)
    require(start >= 0, s"malformed manifest (missing $key): $json")
    val end = json.indexOf(']', start)
    require(end > start, s"malformed manifest: $json")
    "\"([^\"]*)\"".r.findAllMatchIn(json.substring(start + k.length, end))
      .map(_.group(1)).toSeq
  }

  private val HwmRe = """"hwm":(-?[0-9]+)""".r
  private val StatsVRe = """"statsv":([0-9]+)""".r
  /** Commit wall-clock millis recorded IN the manifest body ([[commitIf]]
    * stamps it). `TIMESTAMP AS OF`, [[history]], and DESCRIBE DETAIL read
    * this instead of the manifest FILE's mtime: filesystem mtimes have
    * 1-second granularity on many local filesystems and unreliable
    * semantics on object stores, while the recorded stamp is exact and
    * survives a manifest copy/backup-restore. Absent on manifests written
    * before the field (readers fall back to mtime). */
  private val CtimeRe = """"ctime":([0-9]+)""".r
  private def parseCtime(json: String): Option[Long] =
    CtimeRe.findFirstMatchIn(json).map(_.group(1).toLong)

  /** DELTA-record marker: a manifest body carrying `"delta":1,"base":B` is
    * a LOG record (added/removed names + stat overlays relative to the
    * resolved state of version-1, with `B` the CHECKPOINT version its
    * replay chain starts at), not a full snapshot. The marker string can
    * never occur in a full body: the only writer-controlled keys are this
    * module's, stat column names render as `"name":[` / `"name":"` (a
    * bracket or quote after the colon, never the bare digit `1` followed
    * by `"base"`), and every value charset is guarded at render. Written
    * immediately after the token so detection needs no full-body scan. */
  private val DeltaBaseRe = """"delta":1,"base":([0-9]+)""".r
  /** The streaming append sink's batch-stamped data-file names
    * (`b<batchId>-<uuid>-pN.parquet`) — [[vacuum]] uses the id to protect
    * not-yet-committed batches. */
  private val AppendBatchFile = "b([0-9]+)-.*".r

  /** The SQL INSERT path's data-file names (`sql-<tag>-pN.parquet`,
    * [[graft.sources.ManifestTableProvider]]). Unlike append-batch files
    * there is no hwm to distinguish committed from in-flight, so [[vacuum]]
    * protects any UNLISTED one purely by the in-flight age floor: within
    * the floor it may be in the rename→commit window; past it, a crashed
    * insert's orphans reclaim like any dead file. */
  private val SqlInsertFile = "sql-[0-9a-f]{8}-.*".r

  /** Minimum age before [[vacuum]] may reclaim an above-hwm (uncommitted)
    * append file — the rename→manifest-commit window protection floor. */
  private val InflightAppendFloorMs = 10L * 60L * 1000L

  /** A data-file name minted by a protocol writer's move-in step: in an
    * UNTRACKED dir such a file is either a racing writer's uncommitted
    * move-in or a crash orphan — never plain-directory data ([[init]]
    * must not sweep it). */
  private def inFlightProtocolName(n: String): Boolean = n match {
    case SqlInsertFile() | AppendBatchFile(_) => true
    case _ => false
  }

  /** Numeric-stats FORMAT version. Bumped to 2 when timestamp footer
    * bounds started being normalized to unix-micros: a manifest written
    * before the bump may hold a timestamp column's bounds in RAW writer
    * units (e.g. millis), and re-interpreting those as micros would prune
    * day slices 1000× off — silently wrong results. Readers therefore
    * IGNORE the numeric `stats` of any manifest whose `statsv` predates
    * the current format (conservative: every file stays a candidate until
    * re-analyzed under the new format); string stats and blooms are
    * unit-free and unaffected. */
  private val StatsFormat = 2L
  private val FileStatsRe = """"([^"]+)":\{([^}]*)\}""".r
  private val ColRangeRe = """"([^"]+)":\[(-?[0-9]+),(-?[0-9]+)\]""".r
  private val ColStrRangeRe = """"([^"]+)":\["([^"]*)","([^"]*)"\]""".r

  /** The body of the top-level `"<key>":{...}` object. Values are
    * charset-guarded (never contain braces), so depth counting is exact. */
  private def sliceObject(json: String, key: String): Option[String] = {
    val k = "\"" + key + "\":{"
    val start = json.indexOf(k)
    if (start < 0) return None
    var depth = 1
    var i = start + k.length
    while (depth > 0 && i < json.length) {
      json(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1
        case _ =>
      }
      i += 1
    }
    Some(json.substring(start + k.length, i - 1))
  }

  /** The `"stats":{...}` object, absent on manifests written before the
    * field existed — and treated as absent when written under an older
    * [[StatsFormat]] (see there: pre-2 timestamp bounds may be in raw
    * writer units; carrying or pruning on them would be unsound). */
  private def parseStats(json: String): FileStats = {
    val fmt = StatsVRe.findFirstMatchIn(json).map(_.group(1).toLong)
    if (!fmt.contains(StatsFormat)) return Map.empty
    sliceObject(json, "stats").map { body =>
      FileStatsRe.findAllMatchIn(body).map { fm =>
        fm.group(1) -> ColRangeRe.findAllMatchIn(fm.group(2)).map { cm =>
          cm.group(1) -> (cm.group(2).toLong, cm.group(3).toLong)
        }.toMap
      }.toMap
    }.getOrElse(Map.empty)
  }

  /** The `"sstats":{...}` string-stats object. */
  private def parseStringStats(json: String): FileStringStats =
    sliceObject(json, "sstats").map { body =>
      FileStatsRe.findAllMatchIn(body).map { fm =>
        fm.group(1) -> ColStrRangeRe.findAllMatchIn(fm.group(2)).map { cm =>
          cm.group(1) -> (cm.group(2), cm.group(3))
        }.toMap
      }.toMap
    }.getOrElse(Map.empty)

  private val ColBloomRe = """"([^"]+)":"([0-9a-f]*)"""".r

  private val SchemaB64Re = """"schemab64":"([A-Za-z0-9+/=]*)"""".r

  /** The DECLARED partition schema of a hive-partitioned table — the
    * name-inferred partition columns (with their inferred types) persisted
    * at [[init]]/[[publishPartitioned]] and carried through every later
    * commit, so the table's served schema is STABLE: a retention delete
    * that drops the last file of every partition (or an empty partitioned
    * table between an erase-all and its next append) must not silently
    * stop serving `bucket`/`d` and break queries that reference them.
    * Live reads still type partition VALUES from the live names (the
    * values and their types must agree with what the scan serves); this
    * field is the fallback when no name is left to infer from, and the
    * writers' source of the partition column CHAIN. Absent on flat
    * tables and manifests written before the field. */
  /** One COLUMN-MAPPING entry of a renamed column (`ALTER TABLE …
    * RENAME COLUMN`): logical column `to` is physically stored as
    * `from` in exactly the data files named in `carriers` — the files
    * that were live when the rename committed and have not been
    * rewritten since. Renames are METADATA-ONLY: no data file is
    * touched; reads group the file list by which physical name each
    * file carries (carrier sets of successive renames are NESTED — a
    * file predating an earlier rename predates every later one — so the
    * groups are linear, one per rename boundary) and alias each group's
    * physical columns back to the logical names. Entries shrink as
    * carrier files are removed/rewritten (copy-on-write emits the
    * logical name) and DROP once no live file carries the old name —
    * the table self-heals to single-scan plans via compaction/OPTIMIZE.
    * Chained renames update older entries' `to` in place, so an entry
    * always maps physical `from` → the CURRENT logical name. Entries
    * are stored oldest-first; a file's group is the FIRST entry whose
    * carriers contain it. */
  private[graft] final case class Rename(to: String, from: String,
      carriers: Set[String])

  /** One DROP-COLUMN tombstone: physical column `name` is no longer
    * declared, but its BYTES are still carried in the footers of exactly
    * the data files in `carriers` (the files of the renameGroups group
    * that physically held the name when the drop committed). The
    * tombstone exists for ONE reason: re-introducing the name — `ADD
    * COLUMN`, an evolved append, or `RENAME … TO name` — while carriers
    * live would make reads serve the DROPPED column's stale footer bytes
    * under the new column (merged-footer victim reads, coalesceRenamed
    * chains, and committed-stat pruning would all prefer the leftover).
    * Both commit choke points reject that collision until the carriers
    * age out of the data (copy-on-write rewrites project victims to the
    * declared schema, so every rewrite shrinks the set); the entry DROPS
    * once no live file carries the bytes, and the name is free again.
    * Same carry/shrink mechanics as [[Rename]] carriers. */
  private[graft] final case class Dropped(name: String,
      carriers: Set[String])

  /** The column-mapping field: base64 of a compact JSON array (like the
    * schemas — one regex parse, zero interaction with the body's other
    * regex-parsed sections, and the no-escaping invariant holds
    * trivially). Carried by CHECKPOINT bodies only; delta records
    * INHERIT the previous state's entries minus their removed files
    * (carriers are O(files-at-rename) — restating them per record would
    * break the O(delta) commit hot path), which is why any commit that
    * CHANGES the mapping forces a checkpoint.
    *
    * Carrier-set encoding: carriers are always a subset of the same
    * body's `files` array, so a checkpoint stores each set as `carrbm` —
    * a base64 BITMAP over the body's SORTED file list (bit i = files(i)
    * is a carrier) — instead of restating O(carriers) names per entry: k
    * chained renames on a 1M-file table cost k × 125 KB of bitmap
    * instead of k × ~40 MB of names, keeping checkpoint render/replay
    * within noise of an un-renamed table's. The explicit
    * `"carriers":[…]` shape is still parsed (pre-round-17 bodies) and
    * still written for the never-expected case of a carrier missing
    * from the file list (soundness over compactness). The same array
    * carries [[Dropped]] tombstones as `{"dropped":name,…}` entries. */
  private val ColmapB64Re = """"colmapb64":"([A-Za-z0-9+/=]*)"""".r
  private val ColmapEntryRe =
    ("""\{"to":"([^"]*)","from":"([^"]*)",""" +
      """(?:"carriers":\[([^\]]*)\]|"carrbm":"([A-Za-z0-9+/=]*)")\}""").r
  private val DroppedEntryRe =
    ("""\{"dropped":"([^"]*)",""" +
      """(?:"carriers":\[([^\]]*)\]|"carrbm":"([A-Za-z0-9+/=]*)")\}""").r

  /** Bitmap over `sortedFiles` for a carrier set, or None when some
    * carrier is not in the list (fall back to the explicit shape). One
    * pass over the FILE list with a set-membership probe per name — no
    * files→index map is ever built (a 1M-entry boxed map per checkpoint
    * was the measurable cost of the encoding); every carrier found ⟺
    * the set bits count matches the set's size (names are distinct). */
  private def carrierBitmap(carriers: Set[String],
      sortedFiles: Seq[String]): Option[String] = {
    val n = sortedFiles.length
    val bytes = new Array[Byte]((n + 7) / 8)
    var found = 0
    var i = 0
    val it = sortedFiles.iterator
    while (it.hasNext) {
      if (carriers(it.next())) {
        bytes(i >> 3) = (bytes(i >> 3) | (1 << (i & 7))).toByte
        found += 1
      }
      i += 1
    }
    if (found == carriers.size)
      Some(Base64.getEncoder.encodeToString(bytes))
    else None
  }

  private def carriersOf(explicit: String, bm: String,
      sortedFiles: Seq[String]): Set[String] =
    if (explicit != null)
      "\"([^\"]*)\"".r.findAllMatchIn(explicit).map(_.group(1)).toSet
    else {
      val bytes = Base64.getDecoder.decode(bm)
      val out = Set.newBuilder[String]
      var i = 0
      val n = math.min(sortedFiles.length, bytes.length * 8)
      while (i < n) {
        if ((bytes(i >> 3) & (1 << (i & 7))) != 0) out += sortedFiles(i)
        i += 1
      }
      out.result()
    }

  private[graft] def encodeColmap(renames: Seq[Rename],
      dropped: Seq[Dropped], sortedFiles: Seq[String]): String = {
    renames.foreach { r =>
      require(r.to.matches("[A-Za-z_]\\w*") && r.from.matches("[A-Za-z_]\\w*"),
        s"rename entry ${r.from} -> ${r.to}: plain identifiers only " +
          "(no-escaping invariant)")
    }
    dropped.foreach { d =>
      require(d.name.matches("[A-Za-z_]\\w*"),
        s"drop tombstone ${d.name}: plain identifiers only " +
          "(no-escaping invariant)")
    }
    def carr(cs: Set[String]): String =
      carrierBitmap(cs, sortedFiles) match {
        case Some(bm) => s""""carrbm":"$bm""""
        case None =>
          requireJsonSafeNames(cs.toSeq)
          "\"carriers\":[" +
            cs.toSeq.sorted.map("\"" + _ + "\"").mkString(",") + "]"
      }
    val json = (renames.map { r =>
      s"""{"to":"${r.to}","from":"${r.from}",""" + carr(r.carriers) + "}"
    } ++ dropped.map { d =>
      s"""{"dropped":"${d.name}",""" + carr(d.carriers) + "}"
    }).mkString("[", ",", "]")
    Base64.getEncoder.encodeToString(json.getBytes(StandardCharsets.UTF_8))
  }

  private[graft] def parseColmap(json: String,
      sortedFiles: Seq[String]): (Seq[Rename], Seq[Dropped]) =
    ColmapB64Re.findFirstMatchIn(json).map { m =>
      val decoded = new String(Base64.getDecoder.decode(m.group(1)),
        StandardCharsets.UTF_8)
      val renames = ColmapEntryRe.findAllMatchIn(decoded).map { em =>
        Rename(em.group(1), em.group(2),
          carriersOf(em.group(3), em.group(4), sortedFiles))
      }.toSeq
      val dropped = DroppedEntryRe.findAllMatchIn(decoded).map { em =>
        Dropped(em.group(1),
          carriersOf(em.group(2), em.group(3), sortedFiles))
      }.toSeq
      (renames, dropped)
    }.getOrElse((Seq.empty, Seq.empty))

  private val PartSchemaB64Re = """"partschemab64":"([A-Za-z0-9+/=]*)"""".r
  private def parsePartSchema(json: String): Option[StructType] =
    PartSchemaB64Re.findFirstMatchIn(json).flatMap { m =>
      scala.util.Try {
        DataType.fromJson(new String(
          Base64.getDecoder.decode(m.group(1)), StandardCharsets.UTF_8))
          .asInstanceOf[StructType]
      }.toOption
    }

  /** The head's declared partition schema (see [[PartSchemaB64Re]]) —
    * `None` on flat tables and pre-field manifests. */
  def readPartitionSchema(spark: SparkSession, dir: String): Option[StructType] =
    headSnap(spark, dir).flatMap(_._2.partSchema)

  /** Stored deep-nullable: the manifest schema describes what a SCAN of
    * the table serves, and a file scan serves every column nullable (any
    * listed file may predate the column) — the same view merged footer
    * inference reports, so schema-carried and fallback reads agree
    * exactly. */
  private def encodeSchema(s: StructType): String =
    Base64.getEncoder.encodeToString(
      SchemaBridge.asNullable(s).json.getBytes(StandardCharsets.UTF_8))

  /** The manifest-carried table schema, absent on manifests written before
    * the field existed. A value that fails to decode is treated as absent
    * (the reader falls back to merged footer inference — costs planning
    * time, never correctness), but the field is only ever written by
    * [[render]] from a real `StructType`, so that path is corruption-only. */
  private def parseSchema(json: String): Option[StructType] =
    SchemaB64Re.findFirstMatchIn(json).flatMap { m =>
      scala.util.Try {
        DataType.fromJson(new String(
          Base64.getDecoder.decode(m.group(1)), StandardCharsets.UTF_8))
          .asInstanceOf[StructType]
      }.toOption
    }

  /** The `"filestat":{"<name>":[len,mtimeMs],...}` object: the exact
    * byte length (the parquet footer lives at `len - 8`, so this must be
    * byte-exact — it comes from a real `FileStatus`, never an estimate)
    * and modification time of every data file, captured at commit. This
    * is what lets scan PLANNING fabricate the file index from the
    * manifest alone — zero filesystem calls per query, the flat-cost
    * planning a million-file table needs — instead of stat-ing every
    * listed file. */
  private val FileStatRe = """"([^"]+)":\[(-?[0-9]+),(-?[0-9]+)\]""".r
  private def parseFileStat(json: String): Map[String, (Long, Long)] =
    sliceObject(json, "filestat").map { body =>
      FileStatRe.findAllMatchIn(body).map { m =>
        m.group(1) -> (m.group(2).toLong, m.group(3).toLong)
      }.toMap
    }.getOrElse(Map.empty)

  /** The DELETION-VECTOR section: data file → (sidecar name under
    * `_dv/`, deleted-row cardinality). Rendered BEFORE the stat objects
    * (the name-section ordering rule — a stats column or file named
    * "dvs" must never win the indexOf), carried by checkpoints like the
    * stats and OVERLAID by delta records (a DELETE marking rows in an
    * existing file is the O(delta) hot path). Entries drop with their
    * data file — a rewrite/compaction materializes the deletions, so the
    * removed file takes its dv reference with it; [[vacuum]] reclaims
    * unreferenced sidecars. */
  private val DvEntryRe = """"([^"]+)":\["([^"]+)",(-?[0-9]+)\]""".r
  private def parseDvs(json: String): Map[String, (String, Long)] =
    sliceObject(json, "dvs").map { body =>
      DvEntryRe.findAllMatchIn(body).map { m =>
        m.group(1) -> (m.group(2), m.group(3).toLong)
      }.toMap
    }.getOrElse(Map.empty)

  /** Leading-comma section string, like the [[statSections]] pieces. */
  private def dvsSection(dvs: Map[String, (String, Long)]): String =
    if (dvs.isEmpty) ""
    else {
      requireJsonSafeNames(dvs.keys.toSeq)
      requireJsonSafeNames(dvs.values.map(_._1).toSeq)
      dvs.toSeq.sortBy(_._1).map { case (f, (dv, card)) =>
        "\"" + f + "\":[\"" + dv + "\"," + card + "]"
      }.mkString(""","dvs":{""", ",", "}")
    }

  /** The head manifest's per-file (length, mtimeMs) inventory — empty on
    * manifests written before the field existed (planning then falls back
    * to one directory listing). */
  def readFileStat(spark: SparkSession, dir: String): Map[String, (Long, Long)] =
    headSnap(spark, dir).map(_._2.fstat).getOrElse(Map.empty)

  /** The `"bloom":{...}` point-lookup object. */
  private def parseBloom(json: String): FileBloom =
    sliceObject(json, "bloom").map { body =>
      FileStatsRe.findAllMatchIn(body).map { fm =>
        fm.group(1) -> ColBloomRe.findAllMatchIn(fm.group(2)).map { cm =>
          cm.group(1) -> cm.group(2)
        }.toMap
      }.toMap
    }.getOrElse(Map.empty)

  /** Head (version, files, stream high-water mark). The hwm is writer
    * metadata carried INSIDE the manifest (see [[commit]]) so maintenance
    * commits that rename data files — compaction, publish — cannot erase
    * it. Absent on manifests written before the field existed. */
  def readHead(spark: SparkSession, dir: String): Option[(Long, Seq[String], Option[Long])] =
    headSnap(spark, dir).map { case (v, s) => (v, s.files, s.hwm) }

  /** Head manifest's data-skipping stats (empty until [[analyze]] ran). */
  def readStats(spark: SparkSession, dir: String): FileStats =
    headSnap(spark, dir).map(_._2.stats).getOrElse(Map.empty)

  /** Head manifest's string-column data-skipping stats. */
  def readStringStats(spark: SparkSession, dir: String): FileStringStats =
    headSnap(spark, dir).map(_._2.sstats).getOrElse(Map.empty)

  /** Head manifest's point-lookup blooms (empty until [[analyzeBloom]]). */
  def readBloom(spark: SparkSession, dir: String): FileBloom =
    headSnap(spark, dir).map(_._2.bloom).getOrElse(Map.empty)

  /** The head manifest's table schema — `None` for untracked dirs and for
    * manifests written before the schema field existed (bootstrap those
    * with [[analyzeSchema]]). */
  def readSchema(spark: SparkSession, dir: String): Option[StructType] =
    headSnap(spark, dir).flatMap(_._2.schema)

  /** Head (version, files, schema, filestat) from ONE resolved snapshot —
    * what the DSv2 provider pins, so schema inference, the scan's file
    * list, and the planning file index can never split across different
    * versions. Served from the resolution caches when this head version
    * was resolved before: repeat planning against an unchanged head costs
    * one `_manifest/` listing, no body read, no parse. */
  def readFull(spark: SparkSession, dir: String)
      : Option[(Long, Seq[String], Option[StructType],
          Map[String, (Long, Long)], Option[StructType], Seq[Rename],
          Map[String, (String, Long)])] =
    headSnap(spark, dir).map { case (v, s) =>
      (v, s.files, s.schema, s.fstat, s.partSchema, s.renames, s.dvs)
    }

  /** (files, schema, filestat, partition schema, column mapping,
    * deletion vectors) of one SPECIFIC version — [[readAt]]'s snapshot
    * twin for time travel: the schema AS OF that version, not the
    * head's. */
  def readAtFull(spark: SparkSession, dir: String, version: Long)
      : Option[(Seq[String], Option[StructType],
          Map[String, (Long, Long)], Option[StructType], Seq[Rename],
          Map[String, (String, Long)])] =
    snapAt(spark, dir, version).map(s =>
      (s.files, s.schema, s.fstat, s.partSchema, s.renames, s.dvs))

  /** The fully-RESOLVED state of one committed version: a checkpoint
    * body's fields verbatim, or a delta chain's replay. `base` is the
    * checkpoint version the chain starts at (= the version itself for a
    * checkpoint body) — what a successor commit records as its replay
    * anchor. Immutable once resolved (manifests are write-once), so every
    * cache below is sound by construction. */
  private[graft] final case class Snap(
      files: Seq[String],
      schema: Option[StructType],
      partSchema: Option[StructType],
      stats: FileStats,
      sstats: FileStringStats,
      bloom: FileBloom,
      fstat: Map[String, (Long, Long)],
      hwm: Option[Long],
      ctime: Option[Long],
      base: Long,
      renames: Seq[Rename] = Seq.empty,
      dropped: Seq[Dropped] = Seq.empty,
      dvs: Map[String, (String, Long)] = Map.empty)

  /** One parsed DELTA record: names added/removed vs the previous
    * version's resolved state, stat/inventory OVERLAYS for (at least) the
    * added files, and the commit's own whole-table metadata — hwm, ctime,
    * and the COMPLETE output schema / partition declaration (tiny,
    * O(columns), so each record is self-contained on those and replay
    * never has to inherit them). */
  private final case class DeltaRec(base: Long, adds: Seq[String],
      removes: Seq[String], schema: Option[StructType],
      partSchema: Option[StructType], stats: FileStats,
      sstats: FileStringStats, bloom: FileBloom,
      fstat: Map[String, (Long, Long)], hwm: Option[Long],
      ctime: Option[Long],
      dvs: Map[String, (String, Long)] = Map.empty)

  private def parseHwm(json: String): Option[Long] =
    HwmRe.findFirstMatchIn(json).map(_.group(1).toLong)

  /** READER PROTOCOL STAMP. A body whose content an old build would
    * silently misread — deleted rows served because the `dvs` section
    * was never parsed, stale physical columns because the column
    * mapping was ignored — carries `"features":[...]` naming the reader
    * capabilities it REQUIRES. Readers refuse unknown required features
    * with a NAMED error instead of producing a wrong answer: version
    * skew becomes loud, never silent. Bodies that need no capability
    * beyond the base protocol (plain tables) carry no section at all,
    * so they stay readable by every build that ever existed.
    *
    * Granularity rule: a feature name covers one section's CURRENT
    * grammar in full — any future change to a stamped section's grammar
    * that an existing build would misread must mint a NEW name, never
    * widen an old one (widening would defeat the stamp for every build
    * already in the field). */
  private[graft] val SupportedReaderFeatures: Set[String] =
    Set("colmap", "dvs")
  private val FeaturesRe = """"features":\[([^\]]*)\]""".r

  /** Named refusal for version skew: the manifest requires a reader
    * capability this build does not implement. */
  final class UnsupportedTableFeatureException(msg: String)
    extends RuntimeException(msg)

  private def featuresSection(features: Set[String]): String =
    if (features.isEmpty) ""
    else {
      requireJsonSafeNames(features.toSeq)
      features.toSeq.sorted.map("\"" + _ + "\"")
        .mkString(""""features":[""", ",", "],")
    }

  private def parseFeatures(body: String): Set[String] =
    FeaturesRe.findFirstMatchIn(body).map { m =>
      "\"([^\"]*)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet
    }.getOrElse(Set.empty)

  private def requireSupportedFeatures(v: Long, body: String): Unit = {
    val unknown = parseFeatures(body) -- SupportedReaderFeatures
    if (unknown.nonEmpty)
      throw new UnsupportedTableFeatureException(
        s"manifest v$v requires reader feature(s) " +
          s"${unknown.toSeq.sorted.mkString("[", ", ", "]")} this build " +
          "does not implement (supported: " +
          s"${SupportedReaderFeatures.toSeq.sorted.mkString(", ")}); " +
          "upgrade the engine to read this table")
  }

  /** Parse one manifest body: `Right(Snap)` for a checkpoint (full
    * snapshot), `Left(DeltaRec)` for a delta record. Refuses first —
    * loudly, by name — when the body stamps a required reader feature
    * this build does not know (see [[SupportedReaderFeatures]]). */
  private def parseBody(v: Long, body: String): Either[DeltaRec, Snap] = {
    requireSupportedFeatures(v, body)
    DeltaBaseRe.findFirstMatchIn(body) match {
      case Some(m) => Left(DeltaRec(m.group(1).toLong,
        parseNameArray(body, "adds"), parseNameArray(body, "removes"),
        parseSchema(body), parsePartSchema(body), parseStats(body),
        parseStringStats(body), parseBloom(body), parseFileStat(body),
        parseHwm(body), parseCtime(body), dvs = parseDvs(body)))
      // files as a Vector: the append fast path advances it by
      // structural sharing (`++` of a small batch is O(log n + batch))
      case None =>
        // the body's files array is rendered SORTED — exactly the order
        // the colmap's carrier bitmaps index into
        val files = parseFiles(body).toVector
        val (renames, dropped) = parseColmap(body, files)
        Right(Snap(files, parseSchema(body),
          parsePartSchema(body), parseStats(body), parseStringStats(body),
          parseBloom(body), parseFileStat(body), parseHwm(body),
          parseCtime(body), base = v, renames = renames, dropped = dropped,
          dvs = parseDvs(body)))
    }
  }

  /** Apply one delta record to the previous version's resolved state —
    * EXACTLY the merge a full commit's carry used to bake into the body:
    * stat maps filter to the new file list and overlay PER COLUMN (an
    * overlay for column B must not erase a file's committed column-A
    * stats); the inventory overlays per file; hwm/ctime/schema/partition
    * declaration are the record's own (each commit fully determines
    * them, absent = absent). */
  private def applyDelta(s: Snap, d: DeltaRec): Snap = {
    if (d.removes.isEmpty) {
      // APPEND fast path — the streaming/INSERT hot loop: with nothing
      // removed, no filter-to-the-new-file-set pass is needed, so every
      // structure advances by STRUCTURAL SHARING (immutable-Map `++` /
      // `updated` of a small overlay is O(overlay); Vector `++` is
      // O(log + overlay)) — the step that keeps a commit chain's cache
      // advance O(delta) instead of O(table) per link
      def overlay[A](base: Map[String, Map[String, A]],
          over: Map[String, Map[String, A]]): Map[String, Map[String, A]] =
        if (over.isEmpty) base
        else over.foldLeft(base) { case (m, (f, cols)) =>
          val merged = m.getOrElse(f, Map.empty[String, A]) ++ cols
          if (merged.isEmpty) m else m.updated(f, merged)
        }
      // column-mapping entries INHERIT through delta records (a record
      // never restates them — see ColmapB64Re); with nothing removed the
      // carrier sets are untouched (adds are post-rename files)
      Snap(s.files ++ d.adds, d.schema, d.partSchema,
        overlay(s.stats, d.stats), overlay(s.sstats, d.sstats),
        overlay(s.bloom, d.bloom), s.fstat ++ d.fstat,
        d.hwm, d.ctime, d.base, renames = s.renames, dropped = s.dropped,
        dvs = if (d.dvs.isEmpty) s.dvs else s.dvs ++ d.dvs)
    } else {
      val removed = d.removes.toSet
      val files = s.files.filterNot(removed) ++ d.adds
      val fset = files.toSet
      def merge[A](base: Map[String, Map[String, A]],
          over: Map[String, Map[String, A]]): Map[String, Map[String, A]] =
        (base.keySet ++ over.keySet).iterator
          .filter(fset)
          .map(f => f -> (base.getOrElse(f, Map.empty[String, A]) ++
            over.getOrElse(f, Map.empty[String, A])))
          .filter(_._2.nonEmpty)
          .toMap
      // removed carrier files leave their mapping entries; an entry no
      // live file carries is DROPPED (the rename has fully aged out) —
      // drop tombstones shrink the same way
      val renames = s.renames
        .map(r => r.copy(carriers = r.carriers.filter(fset)))
        .filter(_.carriers.nonEmpty)
      val dropped = s.dropped
        .map(t => t.copy(carriers = t.carriers.filter(fset)))
        .filter(_.carriers.nonEmpty)
      Snap(files, d.schema, d.partSchema,
        merge(s.stats, d.stats), merge(s.sstats, d.sstats),
        merge(s.bloom, d.bloom),
        (s.fstat ++ d.fstat).filter(kv => fset(kv._1)),
        d.hwm, d.ctime, d.base, renames = renames, dropped = dropped,
        dvs = (s.dvs ++ d.dvs).filter(kv => fset(kv._1)))
    }
  }

  /** One listing of `_manifest/`: version → status for every committed
    * manifest file. This is the freshness check every head read pays, and
    * it doubles as the zero-extra-RPC source of chain-replay statuses and
    * cache-identity (len, mtime) checks. */
  private def manifestListing(fs: FileSystem, table: Path)
      : Map[Long, org.apache.hadoop.fs.FileStatus] = {
    val mdir = new Path(table, ManifestDir)
    if (!fs.exists(mdir)) Map.empty
    else fs.listStatus(mdir).iterator
      .flatMap(s => versionOf(s.getPath.getName).map(_ -> s)).toMap
  }

  private def readBody(fs: FileSystem, path: Path): String = {
    val in = fs.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Resolved-snapshot cache, keyed by the manifest FILE's identity
    * (dir, version, len, mtime) — not just the version number: a table
    * wiped and re-created at the same path mints a fresh v1, and serving
    * the old parse for it would be the one way to break the write-once
    * soundness argument. Bounded at 4 entries because an entry for a
    * 1M-file head is ~100 MB of parsed names+inventory: memory-motivated,
    * sized for a driver actively planning against a handful of tables.
    * This is what collapses the metadata envelope's PER-QUERY cost — an
    * O(files) body read + regex parses, measured 0.74 s at 100k files /
    * 11 s at 1M — to one `_manifest/` listing for every read after the
    * first against an unchanged version. */
  private val snapCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long, Long), Snap](
        8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long, Long), Snap])
        : Boolean = size() > cacheEntriesBound
    })

  /** Resolved HISTORICAL versions (time travel, DESCRIBE HISTORY,
    * vacuum re-anchors) — separate from [[snapCache]] so a history sweep
    * over a large table cannot evict the hot HEAD snapshots of
    * actively-planned tables. Same identity keying; bounded like
    * [[snapCache]]. */
  private val histCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(String, Long, Long, Long), Snap](
        8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, Long, Long, Long), Snap])
        : Boolean = size() > cacheEntriesBound
    })

  /** Newest resolved version per table dir — the INCREMENTAL-replay
    * anchor that makes a commit chain O(delta) instead of O(table):
    * resolving head v as a delta replays from this snapshot (one
    * [[applyDelta]] per unseen record) instead of re-reading the base
    * checkpoint's O(files) body every commit. Entries carry their
    * version's (len, mtime) and are trusted only when the CURRENT listing
    * shows the same identity (wiped-and-recreated tables re-resolve).
    * Same 4-entry memory bound as [[snapCache]]. */
  private val latestByDir = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, (Long, Long, Long, Snap)](
        8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, Long, Snap)])
        : Boolean = size() > cacheEntriesBound
    })

  /** Record a freshly-resolved (or commit-computed) snapshot in both
    * caches. */
  private def cacheSnap(dir: String, v: Long,
      status: org.apache.hadoop.fs.FileStatus, snap: Snap): Unit = {
    snapCache.put((dir, v, status.getLen, status.getModificationTime), snap)
    val cur = latestByDir.get(dir)
    if (cur == null || cur._1 <= v)
      latestByDir.put(dir,
        (v, status.getLen, status.getModificationTime, snap))
  }

  /** Resolve version `v` of `dir` to its full snapshot state, given the
    * current manifest listing. Checkpoint bodies parse directly; delta
    * bodies replay from the nearest trusted anchor — the cached newest
    * resolved version of this dir when its identity still matches the
    * listing and it sits inside the chain, else the record's base
    * CHECKPOINT — applying each intermediate record in version order.
    * Loud when a chain link is missing (a hand-pruned intermediate delta
    * makes the state unknowable; [[vacuum]]'s retention never creates
    * such a gap — it keeps everything from the oldest retained version's
    * base forward). */
  private def resolveSnap(fs: FileSystem, table: Path, dir: String, v: Long,
      listing: Map[Long, org.apache.hadoop.fs.FileStatus],
      forceHist: Boolean = false): Snap = {
    def statusOf(w: Long): org.apache.hadoop.fs.FileStatus =
      listing.getOrElse(w, scala.util.Try(
        fs.getFileStatus(manifestPath(table, w))).getOrElse(sys.error(
        s"manifest v$w of $dir is missing but v$v's delta chain needs " +
          "it — the chain was pruned out-of-protocol; only vacuum may " +
          "prune manifests (it keeps every version from the oldest " +
          "retained version's checkpoint base forward)")))
    val st = statusOf(v)
    val key = (dir, v, st.getLen, st.getModificationTime)
    val hit = snapCache.get(key)
    if (hit != null) return hit
    // HISTORICAL versions (time travel, DESCRIBE HISTORY sweeps, vacuum
    // re-anchors) resolve through their own small cache so a history
    // sweep over a large table can never evict the ~100 MB hot HEAD
    // snapshots of actively-planned tables out of [[snapCache]].
    // `forceHist`: [[snapAt]] passes a SINGLETON listing (its whole
    // point is not paying the full one), which would otherwise make
    // every time-travel version look like a head
    val isHead = !forceHist && (listing.isEmpty || v >= listing.keys.max)
    if (!isHead) {
      val histHit = histCache.get(key)
      if (histHit != null) return histHit
    }
    val snap = parseBody(v, readBody(fs, st.getPath)) match {
      case Right(full) => full
      case Left(d) =>
        val anchor: (Long, Snap) = {
          val cached = Option(latestByDir.get(dir)).filter {
            case (w, len, mt, _) => w >= d.base && w < v &&
              listing.get(w).exists(s =>
                s.getLen == len && s.getModificationTime == mt)
          }
          cached match {
            case Some((w, _, _, s0)) => (w, s0)
            case None =>
              val bst = statusOf(d.base)
              parseBody(d.base, readBody(fs, bst.getPath)) match {
                case Right(s0) => (d.base, s0)
                case Left(_) => sys.error(
                  s"manifest v${d.base} of $dir is a delta record but " +
                    s"v$v references it as a chain BASE — corrupt chain")
              }
          }
        }
        var s = anchor._2
        var w = anchor._1 + 1
        while (w < v) {
          s = parseBody(w, readBody(fs, statusOf(w).getPath)) match {
            case Right(full) => full
            case Left(dw) => applyDelta(s, dw)
          }
          w += 1
        }
        applyDelta(s, d)
    }
    if (isHead) cacheSnap(dir, v, st, snap)
    else histCache.put(key, snap)
    snap
  }

  /** The advisory head-hint file (`_manifest/_head`): the last committed
    * version, written BEST-EFFORT after every successful commit. Purely
    * an RPC optimization — the CAS linearization point stays the
    * exclusive create of the versioned manifest file, and correctness
    * never depends on the hint: a stale hint costs forward probes, a
    * missing/garbled/too-stale one falls back to the full `_manifest/`
    * listing. What it buys at scale: a head read against a
    * long-retained table (a 1 Hz streaming table accumulates 86k
    * manifest files per un-vacuumed day) costs a FLAT ~3 metadata RPCs
    * (hint read + head probe + first-miss probe) instead of one
    * O(#retained versions) directory listing per read. */
  private val HeadHintName = "_head"

  /** How far past a stale hint the head probe walks before giving up on
    * the hint and paying the one full listing (beyond this the listing
    * is the cheaper recovery, and it re-finds the head exactly). */
  private val HeadProbeLimit = 32

  private def readHeadHint(fs: FileSystem, mdir: Path): Option[Long] =
    scala.util.Try {
      val body = readBody(fs, new Path(mdir, HeadHintName))
      """"v":(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toLong)
    }.toOption.flatten

  /** Overwrite the hint with `v` — best-effort (tmp + rename; any
    * failure is swallowed: the hint is advisory). Concurrent committers
    * may interleave; a torn or out-of-date result only costs the next
    * reader probes. */
  private def writeHeadHint(fs: FileSystem, table: Path, v: Long): Unit = {
    scala.util.Try {
      val mdir = new Path(table, ManifestDir)
      val tmp = new Path(mdir, s".head-tmp-${UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(s"""{"v":$v}""".getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val target = new Path(mdir, HeadHintName)
      if (!fs.rename(tmp, target)) {
        // HDFS-style rename refuses an existing destination: replace
        fs.delete(target, false)
        if (!fs.rename(tmp, target)) fs.delete(tmp, false)
      }
    }
    ()
  }

  /** Hint-guided head resolution: read the hint, probe FORWARD from it
    * (versions are dense — the first missing version ends the probe, so
    * a hint stale by k commits costs k+1 probes), and resolve through
    * the normal chain machinery with the probed statuses standing in
    * for the listing (chain links the probe didn't touch fall back to
    * per-version getFileStatus inside [[resolveSnap]] — bounded by the
    * checkpoint interval, and normally skipped entirely because the
    * [[latestByDir]] anchor short-circuits replay to the just-probed
    * records). None = hint absent, its version gone (wiped table), or
    * too stale to chase — the caller pays the full listing. */
  private def headViaHint(fs: FileSystem, table: Path, dir: String)
      : Option[(Long, Snap)] = {
    val mdir = new Path(table, ManifestDir)
    val hint = readHeadHint(fs, mdir).getOrElse(return None)
    var v = hint
    var st = scala.util.Try(fs.getFileStatus(manifestPath(table, v)))
      .getOrElse(return None)
    val partial = scala.collection.mutable.Map[
      Long, org.apache.hadoop.fs.FileStatus](v -> st)
    var advance = 0
    var growing = true
    while (growing && advance < HeadProbeLimit) {
      scala.util.Try(fs.getFileStatus(manifestPath(table, v + 1)))
        .toOption match {
        case Some(s2) =>
          v += 1; st = s2; partial(v) = s2; advance += 1
        case None => growing = false
      }
    }
    if (growing) return None // hint too stale: one listing is cheaper
    // the replay anchor's identity check consults the listing map — make
    // sure the cached anchor's own status is in it, or a perfectly good
    // anchor would be rejected and the read would re-parse the base
    // checkpoint (O(files)) every time
    Option(latestByDir.get(dir)).foreach { case (w, _, _, _) =>
      if (w < v && !partial.contains(w))
        scala.util.Try(fs.getFileStatus(manifestPath(table, w)))
          .foreach(s => partial(w) = s)
    }
    Some((v, resolveSnap(fs, table, dir, v, partial.toMap)))
  }

  /** The head's (version, resolved snapshot), or None for untracked
    * dirs. Freshness = the hint-guided probe (~3 flat RPCs) when the
    * advisory `_head` hint is usable, else one `_manifest/` listing;
    * the parse/replay is cache-amortized either way. */
  private def headSnap(spark: SparkSession, dir: String)
      : Option[(Long, Snap)] = {
    val (fs, p) = fsFor(spark, dir)
    // A hostile-retention race: between finding the head (hint probe or
    // listing) and reading its body, newer commits can land AND a
    // zero-grace vacuum can prune the version we resolved — the head
    // legitimately moved, so re-resolve from scratch rather than
    // surfacing a raw FileNotFound for a table that is perfectly whole.
    // Bounded: a chain genuinely broken (a bug, or hand-deleted bodies)
    // keeps throwing and surfaces loudly on the last attempt.
    var attempt = 0
    while (true) {
      try {
        return headViaHint(fs, p, dir).orElse {
          val listing = manifestListing(fs, p)
          if (listing.isEmpty) None
          else {
            val v = listing.keys.max
            Some((v, resolveSnap(fs, p, dir, v, listing)))
          }
        }
      } catch {
        case _: java.io.FileNotFoundException if attempt < 5 =>
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** One SPECIFIC version's resolved snapshot — None when that version's
    * manifest file no longer exists (retention pruned it).
    *
    * FLAT in retained-version count (round 17): a version-specific read
    * needs only the version's own manifest file (one getFileStatus —
    * which IS the retention-floor check: vacuum deletes pruned versions'
    * files) plus its delta chain back to a checkpoint (statusOf's
    * per-version fallback inside [[resolveSnap]], bounded by the
    * effective checkpoint interval ≤ 64) — never the full `_manifest/`
    * listing head freshness pays. A CDC poller doing `VERSION AS OF`
    * sweeps against a long-retained table (86k versions per un-vacuumed
    * day at 1 Hz) stops re-paying O(#retained versions) RPCs per
    * resolution. The newest-resolved anchor is pre-seeded like
    * [[headViaHint]] does, so an ascending sweep replays O(sweep step)
    * records, not O(interval) per version. */
  private def snapAt(spark: SparkSession, dir: String,
      version: Long): Option[Snap] = {
    val (fs, p) = fsFor(spark, dir)
    var attempt = 0
    while (true) {
      // the getFileStatus doubles as the retention-floor check: a pruned
      // version converges to None here, and the caller raises the NAMED
      // "no manifest v…" error instead of a raw IO failure
      val st = scala.util.Try(
        fs.getFileStatus(manifestPath(p, version))).getOrElse(return None)
      val partial = scala.collection.mutable.Map(version -> st)
      Option(latestByDir.get(dir)).foreach { case (w, _, _, _) =>
        if (w < version && !partial.contains(w))
          scala.util.Try(fs.getFileStatus(manifestPath(p, w)))
            .foreach(s => partial(w) = s)
      }
      try return Some(
        resolveSnap(fs, p, dir, version, partial.toMap, forceHist = true))
      catch {
        // a racing vacuum is pruning this version RIGHT NOW: the floor
        // check passed but the body (or a chain record behind it —
        // deletion order is not ordered relative to this read) vanished
        // mid-resolution. Re-probe: once the prune completes, the floor
        // check above converges to None; a chain that stays broken WITH
        // its version file retained is genuine corruption and rethrows
        // after the bounded re-probes.
        case e: java.io.FileNotFoundException =>
          if (attempt >= 3) throw e
          attempt += 1
          Thread.sleep(20L * attempt)
      }
    }
    sys.error("unreachable")
  }

  /** Commit-protocol checkpoint cadence: a commit whose head chain has
    * grown to this many records (or whose delta would not be materially
    * smaller than a snapshot — see [[commitIf]]) writes a full CHECKPOINT
    * body instead of a delta record, bounding every replay to < interval
    * small reads past the last O(files) checkpoint. 1 disables deltas
    * entirely (every commit a full snapshot — the pre-round-15 behavior,
    * and what a test drilling hand-pruned histories should pin). */
  private def checkpointInterval(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.manifest.checkpointInterval")
      .flatMap(_.trim.toIntOption).map(math.max(1, _)).getOrElse(8)

  /** ADAPTIVE checkpoint cadence: the configured interval is the FLOOR,
    * and the effective interval grows with the table's file count —
    * one extra delta record per `checkpointFilesPerDelta` (default
    * 16384) files, capped at 64 — because the checkpoint's O(files)
    * render is the one commit cost that still scales with table size
    * (measured 7.5 s @ 1M files vs the 28 ms delta record). At the
    * default floor of 8 a small table keeps its exact round-15 cadence
    * (files/16384 = 0), while a 1M-file table re-anchors every ~61
    * commits — amortized ~0.12 s/commit instead of ~0.94 s — at the
    * price of a cold replay chain of ≤ 64 SMALL records past the
    * checkpoint (cache-amortized after the first read). An explicit
    * interval of 1 (legacy every-commit-checkpoint mode) disables the
    * scaling entirely. */
  private def effectiveCheckpointInterval(spark: SparkSession,
      headFileCount: Int): Int = {
    val floor = checkpointInterval(spark)
    if (floor <= 1) floor
    else {
      val filesPerDelta = spark.conf
        .getOption("spark.graft.manifest.checkpointFilesPerDelta")
        .flatMap(_.trim.toIntOption).map(math.max(1, _)).getOrElse(16384)
      math.min(64, math.max(floor, headFileCount / filesPerDelta))
    }
  }

  /** Snapshot-cache entry budget (`spark.graft.manifest.cacheEntries`,
    * default 4): how many resolved HEAD snapshots the driver keeps hot.
    * An entry for a 1M-file table is ~100 MB of parsed names+inventory,
    * so the default stays deliberately small; a driver round-robin
    * planning more than 4 hot LARGE tables raises it (at that memory
    * price) instead of thrashing back to full checkpoint re-parses.
    * Read from the active session at eviction time — the caches are
    * process-wide, so the bound follows whichever session is driving. */
  private def cacheEntriesBound: Int =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .flatMap(_.conf.getOption("spark.graft.manifest.cacheEntries"))
      .flatMap(_.trim.toIntOption).map(math.max(1, _)).getOrElse(4)

  private def safeStatName(c: String): Boolean =
    c.nonEmpty && SafeStatValue.matches(c)

  /** Drop stat entries that would break the no-escaping invariant (only
    * costs pruning power — the file stays a candidate). Applied BEFORE
    * both rendering and commit-time cache updates, so the cached snapshot
    * and a fresh parse of the written body can never diverge. */
  private def cleanStats(stats: FileStats): FileStats = stats
    .map { case (f, cols) => f -> cols.filter(kv => safeStatName(kv._1)) }
    .filter(_._2.nonEmpty)
  private def cleanSStats(sstats: FileStringStats): FileStringStats = sstats
    .map { case (f, cols) => f -> cols.filter { case (c, (lo, hi)) =>
      safeStatName(c) && SafeStatValue.matches(lo) && SafeStatValue.matches(hi)
    } }
    .filter(_._2.nonEmpty)
  private def cleanBloom(bloom: FileBloom): FileBloom = bloom
    .map { case (f, cols) => f -> cols.filter { case (c, hex) =>
      safeStatName(c) && hex.matches("[0-9a-f]*")
    } }
    .filter(_._2.nonEmpty)

  /** The no-escaping invariant for load-bearing file names: loud, never
    * silently dropped. */
  private def requireJsonSafeNames(files: Seq[String]): Unit =
    files.foreach(f => require(
      f.nonEmpty && !f.exists(c =>
        c == '"' || c == '[' || c == ']' || c == '{' || c == '}' ||
          c == '\\'),
      s"manifest file name not JSON-safe: $f"))

  /** The shared stat/inventory tail of both body kinds. Inputs must be
    * pre-cleaned. */
  private def statSections(stats: FileStats, sstats: FileStringStats,
      bloom: FileBloom, fstat: Map[String, (Long, Long)]): String = {
    val statsJson =
      if (stats.isEmpty) ""
      else stats.toSeq.sortBy(_._1).map { case (f, cols) =>
        "\"" + f + "\":" + cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
          "\"" + c + "\":[" + lo + "," + hi + "]"
        }.mkString("{", ",", "}")
      }.mkString(s""","statsv":$StatsFormat,"stats":{""", ",", "}")
    val sstatsJson =
      if (sstats.isEmpty) ""
      else sstats.toSeq.sortBy(_._1).map { case (f, cols) =>
        "\"" + f + "\":" + cols.toSeq.sortBy(_._1).map { case (c, (lo, hi)) =>
          "\"" + c + "\":[\"" + lo + "\",\"" + hi + "\"]"
        }.mkString("{", ",", "}")
      }.mkString(",\"sstats\":{", ",", "}")
    val bloomJson =
      if (bloom.isEmpty) ""
      else bloom.toSeq.sortBy(_._1).map { case (f, cols) =>
        "\"" + f + "\":" + cols.toSeq.sortBy(_._1).map { case (c, hex) =>
          "\"" + c + "\":\"" + hex + "\""
        }.mkString("{", ",", "}")
      }.mkString(",\"bloom\":{", ",", "}")
    val fstatJson =
      if (fstat.isEmpty) ""
      else fstat.toSeq.sortBy(_._1).map { case (f, (len, mtime)) =>
        "\"" + f + "\":[" + len + "," + mtime + "]"
      }.mkString(",\"filestat\":{", ",", "}")
    statsJson + sstatsJson + bloomJson + fstatJson
  }

  private def metaSections(hwm: Option[Long], ctimeMillis: Option[Long],
      schemaB64: Option[String], partSchemaB64: Option[String],
      colmapB64: Option[String] = None): String = {
    schemaB64.foreach(s => require(s.matches("[A-Za-z0-9+/=]*"),
      "manifest schema must be base64 (no-escaping invariant)"))
    partSchemaB64.foreach(s => require(s.matches("[A-Za-z0-9+/=]*"),
      "manifest partition schema must be base64 (no-escaping invariant)"))
    colmapB64.foreach(s => require(s.matches("[A-Za-z0-9+/=]*"),
      "manifest column mapping must be base64 (no-escaping invariant)"))
    hwm.map(h => s""""hwm":$h,""").getOrElse("") +
      ctimeMillis.map(t => s""""ctime":$t,""").getOrElse("") +
      schemaB64.map(s => s""""schemab64":"$s",""").getOrElse("") +
      partSchemaB64.map(s => s""""partschemab64":"$s",""").getOrElse("") +
      colmapB64.map(s => s""""colmapb64":"$s",""").getOrElse("")
  }

  /** Render a CHECKPOINT (full-snapshot) body. Stat maps must be
    * pre-cleaned ([[cleanStats]] family). The no-escaping invariant is
    * enforced HERE, not only in the footer reader: commitIf is public
    * API, and one unsafe caller-supplied value would either corrupt the
    * whole body (a brace breaks sliceObject's depth count) or round-trip
    * to FABRICATED ranges (an embedded quote re-splits under the regex)
    * → unsound pruning. */
  private def render(version: Long, token: String, files: Seq[String],
      hwm: Option[Long], stats: FileStats,
      sstats: FileStringStats, bloom: FileBloom,
      schemaB64: Option[String],
      fstat: Map[String, (Long, Long)] = Map.empty,
      ctimeMillis: Option[Long] = None,
      partSchemaB64: Option[String] = None,
      colmapB64: Option[String] = None,
      dvs: Map[String, (String, Long)] = Map.empty): String = {
    requireJsonSafeNames(files)
    val meta = metaSections(hwm, ctimeMillis, schemaB64, partSchemaB64,
      colmapB64)
    val filesJson = files.sorted.map(f => "\"" + f + "\"")
      .mkString("[", ",", "]")
    // the reader-protocol stamp derives from the body's OWN content —
    // a body only ever requires what it actually carries
    val feats = featuresSection(
      (if (colmapB64.isDefined) Set("colmap") else Set.empty[String]) ++
        (if (dvs.nonEmpty) Set("dvs") else Set.empty[String]))
    // dvs rendered right after the files array, BEFORE the stat
    // objects (the name-section ordering rule sliceObject anchoring
    // depends on)
    s"""{"version":$version,"token":"$token",$feats$meta"files":$filesJson""" +
      dvsSection(dvs) +
      statSections(cleanStats(stats), cleanSStats(sstats),
        cleanBloom(bloom), fstat) + "}"
  }

  /** Render a DELTA record body (see [[DeltaBaseRe]]): names
    * added/removed vs the previous version plus stat OVERLAYS for the
    * commit's fresh entries — O(delta) bytes written instead of the
    * complete O(files) snapshot. Schema / partition declaration / hwm /
    * ctime ride every record in full (tiny), so a record is
    * self-contained on whole-table metadata and replay only folds the
    * name and stat sections. */
  private def renderDelta(version: Long, token: String, base: Long,
      adds: Seq[String], removes: Seq[String], hwm: Option[Long],
      stats: FileStats, sstats: FileStringStats, bloom: FileBloom,
      schemaB64: Option[String], fstat: Map[String, (Long, Long)],
      ctimeMillis: Option[Long], partSchemaB64: Option[String],
      dvs: Map[String, (String, Long)] = Map.empty): String = {
    requireJsonSafeNames(adds)
    requireJsonSafeNames(removes)
    val meta = metaSections(hwm, ctimeMillis, schemaB64, partSchemaB64)
    def arr(names: Seq[String]): String =
      names.sorted.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    // a delta record never restates the colmap (it inherits — and the
    // base checkpoint it replays from carries its own stamp), so the
    // only capability a RECORD can require is its dv overlay
    val feats = featuresSection(
      if (dvs.nonEmpty) Set("dvs") else Set.empty[String])
    s"""{"version":$version,"token":"$token","delta":1,"base":$base,""" +
      feats + meta + s""""adds":${arr(adds)},"removes":${arr(removes)}""" +
      dvsSection(dvs) +
      statSections(cleanStats(stats), cleanSStats(sstats),
        cleanBloom(bloom), fstat) + "}"
  }

  /** Atomically create the manifest file for exactly this version: local
    * filesystems get an O_EXCL exclusive create (`CREATE_NEW` — the
    * kernel linearizes racing creators, no check-then-act window); others
    * get write-to-temp + rename, atomic-and-failing-on-existing on HDFS.
    * Filesystems whose rename silently overwrites AND that are not local
    * would re-introduce a lost-update window — none is in scope here.
    * Returns false when another committer claimed the version. */
  private def createExclusive(fs: FileSystem, mdir: Path, target: Path,
      body: Array[Byte]): Boolean =
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(target.toUri.getPath), body,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      val tmp = new Path(mdir, s".tmp-${UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      try out.write(body)
      finally out.close()
      if (fs.rename(tmp, target)) true
      else { fs.delete(tmp, false); false }
    }

  /** Compare-and-swap commit: publish `files` as version
    * `expectedHead + 1`, succeeding ONLY if no other manifest version was
    * committed since the caller read `expectedHead` (versions are dense,
    * so winning the exclusive create of `v+1` is the linearization
    * point). This is what read-modify-write callers — tracked compaction,
    * the streaming append sink — must use: a plain [[commit]] would
    * overwrite the file list with a stale read and silently drop a
    * concurrent committer's files. Returns None on conflict; the caller
    * re-reads the head and reconciles. */
  def commitIf(spark: SparkSession, dir: String, files: Seq[String],
      expectedHead: Long, hwm: Option[Long] = None,
      stats: FileStats = Map.empty,
      sstats: FileStringStats = Map.empty,
      bloom: FileBloom = Map.empty,
      schema: Option[StructType] = None,
      replaceSchema: Boolean = false,
      fstat: Map[String, (Long, Long)] = Map.empty,
      partSchema: Option[StructType] = None,
      replacePartSchema: Boolean = false,
      colmap: Option[Seq[Rename]] = None,
      replaceColmap: Boolean = false,
      dropTombstones: Option[Seq[Dropped]] = None,
      dvs: Map[String, (String, Long)] = Map.empty,
      replaceDvs: Boolean = false): Option[Long] = {
    val (fs, p) = fsFor(spark, dir)
    val mdir = new Path(p, ManifestDir)
    fs.mkdirs(mdir)
    val headMeta = headSnap(spark, dir)
    val head = headMeta.map(_._1).getOrElse(0L)
    if (head != expectedHead) return None
    val headS = headMeta.map(_._2)
    val headFiles = headS.map(_.files).getOrElse(Seq.empty)
    val headFileSet = headFiles.toSet
    val fileSet = files.toSet
    val added = files.filterNot(headFileSet)
    val removed = headFiles.filterNot(fileSet)
    // the table schema survives commits that didn't restate it, like the
    // stats: an append MERGES its batch schema into the head's (so an
    // evolved batch widens the table and a narrow batch cannot shrink it),
    // a snapshot replacement REPLACES it (a publish that dropped a column
    // really drops it). A commit that ADDS files WITHOUT declaring a
    // schema merges the added files' footer schemas in — O(files in the
    // delta, just-written hot footers), never the table — because a
    // carried schema that stopped covering the file list would hide an
    // undeclared evolved append's new columns: the exact silent-drop bug
    // the field exists to prevent, moved into the metadata. On a
    // PRE-SCHEMA table, a non-replacing commit stores nothing — the delta
    // is not evidence about columns the un-inventoried older files might
    // hold; [[analyzeSchema]] bootstraps those. A fresh table (no manifest
    // at all) has no older files, so the first commit's delta IS the
    // table.
    val headSchema = headS.flatMap(_.schema)
    // the commit PROTOCOL never requires data files to be scannable (a
    // manifest is just a name list), so a delta whose footers can't be
    // read doesn't fail the commit — it DROPS the stored schema instead:
    // readers fall back to merged footer inference (always correct, just
    // O(files)), and [[analyzeSchema]] restores the fast path. Keeping the
    // head's schema would be the wrong conservative: it might not cover
    // the uninventoried add.
    def inferAdded(): Option[StructType] =
      scala.util.Try(spark.read.option("mergeSchema", "true")
        .parquet(added.map(f => s"$dir/$f"): _*).schema).toOption
    val outSchema: Option[StructType] =
      if (replaceSchema) schema
      else (headSchema, schema) match {
        case (Some(a), Some(b)) => Some(SchemaBridge.merge(a, b))
        case (Some(a), None) =>
          if (added.isEmpty) Some(a)
          else inferAdded().map(SchemaBridge.merge(a, _))
        case (None, Some(b)) => if (headMeta.isEmpty) Some(b) else None
        case (None, None) =>
          if (headMeta.isEmpty && files.nonEmpty) inferAdded() else None
      }
    // the per-file (length, mtime) inventory survives like the stats
    // (checkpoint carry / delta-record overlay — see below): the caller's
    // entries are taken for still-listed files, and whatever the delta
    // still misses is STATted here (the files were just written — hot
    // metadata, O(new files)). This is the field that makes scan planning
    // zero-FS-call; a file whose stat fails is silently dropped (planning
    // falls back to one directory listing for the gaps — costs a listing,
    // never correctness).
    val callerFstat = fstat.filter(kv => fileSet(kv._1))
    val statted = added
      .filterNot(f => callerFstat.contains(f) ||
        headS.exists(_.fstat.contains(f)))
      .flatMap { f =>
        scala.util.Try {
          val s = fs.getFileStatus(new Path(p, f))
          f -> (s.getLen, s.getModificationTime)
        }.toOption
      }
    // the declared partition schema survives commits that didn't restate
    // it (the hwm posture): a drop/erase/compaction must not strip the
    // table of its partition columns. Only init/publishPartitioned set
    // it; a restore RE-STATES the restored version's field verbatim
    // (replacePartSchema — restoring a flat version of a since-
    // partitioned table must not keep the newer layout declaration).
    val outPartSchema0 =
      if (replacePartSchema) partSchema
      else partSchema.orElse(headS.flatMap(_.partSchema))
    // normalized ONCE, before both the body render and the cache poke: the
    // stored schema is deep-nullable (what a scan serves — encodeSchema's
    // contract), and a cached snapshot whose nullability diverged from a
    // fresh parse of the same body would make the read path's plan depend
    // on cache state
    val outSchemaStored = outSchema.map(SchemaBridge.asNullable)
    val outPartSchema = outPartSchema0.map(SchemaBridge.asNullable)
    // the column mapping survives commits that didn't restate it (the
    // partition-declaration posture), with carriers filtered to the
    // still-listed files — entries no live file carries drop (the rename
    // has fully aged out of the data). Only renameColumn/restore restate
    // it (replaceColmap).
    // carriers can only SHRINK by removed files — a commit that removes
    // nothing reuses the head's entries by reference (structural
    // sharing) instead of re-filtering O(files-at-rename) sets per
    // commit: measured 3 chained renames at 1M files cost ~3.5s of set
    // rebuild per commit before this, ~0 after (the carrbm micro-bench
    // phase pins the checkpoint ratio)
    val outRenames = (if (replaceColmap) colmap.getOrElse(Seq.empty)
      else headS.map(_.renames).getOrElse(Seq.empty)) match {
      case rs if rs.isEmpty => rs
      case rs if !replaceColmap && removed.isEmpty => rs
      case rs => rs.map(r => r.copy(carriers = r.carriers.filter(fileSet)))
        .filter(_.carriers.nonEmpty)
    }
    // DROP-COLUMN tombstones survive and shrink exactly like the rename
    // entries (replaceColmap governs both — a caller restating the
    // mapping restates the tombstones it read from the same head)
    val outDropped = (if (replaceColmap) dropTombstones.getOrElse(Seq.empty)
      else headS.map(_.dropped).getOrElse(Seq.empty)) match {
      case ts if ts.isEmpty => ts
      case ts if !replaceColmap && removed.isEmpty => ts
      case ts => ts.map(t => t.copy(carriers = t.carriers.filter(fileSet)))
        .filter(_.carriers.nonEmpty)
    }
    // deletion vectors survive like the stats (carry + caller overlay,
    // filtered to the listed files — a removed/rewritten file takes its
    // dv reference with it); RESTORE restates them (replaceDvs)
    val callerDvs = dvs.filter(kv => fileSet(kv._1))
    val outDvs =
      (if (replaceDvs) callerDvs
       else headS.map(_.dvs).getOrElse(Map.empty) ++ callerDvs)
        .filter(kv => fileSet(kv._1))
    // a NEW column whose name collides with a live entry's physical
    // `from` — or with a DROPPED column's tombstoned physical name —
    // would make old carrier files serve the OLD column's bytes under
    // the new column's name — rejected here, at the one choke point
    // every schema-widening path (declared or footer-merged) funnels
    // through
    if (outRenames.nonEmpty || outDropped.nonEmpty)
      outSchemaStored.foreach { s =>
        val headNames = headSchema.map(_.fieldNames.map(_.toLowerCase).toSet)
          .getOrElse(Set.empty)
        val fresh = s.fieldNames.filterNot(n => headNames(n.toLowerCase))
        val collide = fresh.filter(n =>
          outRenames.exists(_.from.equalsIgnoreCase(n)) ||
            outDropped.exists(_.name.equalsIgnoreCase(n)))
        require(collide.isEmpty,
          s"cannot add column(s) ${collide.mkString(", ")} to $dir: the " +
            "name is still physically carried by files written before a " +
            "RENAME/DROP COLUMN (old footers would serve the stale " +
            "bytes under it); OPTIMIZE the table to rewrite the " +
            "carriers first. A DROP tombstone's carrier set is " +
            "CONSERVATIVE — every file of the column's generation, " +
            "since committed metadata cannot prove a footer lacks the " +
            "bytes — so freeing a dropped name can require a full-table " +
            "OPTIMIZE")
      }
    val v = expectedHead + 1
    val ctime = System.currentTimeMillis()
    val token = UUID.randomUUID().toString
    // stat overlays pre-cleaned so the post-commit cache poke and a fresh
    // parse of the written body can never diverge
    val freshStats = cleanStats(stats.filter(kv => fileSet(kv._1)))
    val freshSStats = cleanSStats(sstats.filter(kv => fileSet(kv._1)))
    val freshBloom = cleanBloom(bloom.filter(kv => fileSet(kv._1)))
    // DELTA vs CHECKPOINT: a delta record is written when the head's
    // replay chain is still short (bounded by [[checkpointInterval]] — so
    // every cold resolution is one O(files) checkpoint parse plus a few
    // small records) AND the record would be materially smaller than a
    // snapshot. Two size guards, both erring toward checkpoints:
    // removes-dominated commits (publish/compaction snapshot-replaces, a
    // restore far back, a big retention delete) re-anchor the chain — the
    // record would carry most of the table by name AND replay would
    // re-pay it per read — and stat-restating commits (analyze sweeps)
    // checkpoint for the same reason. The first commit of a table is
    // always a checkpoint. The CAS linearization point is IDENTICAL
    // either way: winning the exclusive create of v<N>.json.
    val interval = effectiveCheckpointInterval(spark,
      headS.map(_.files.size).getOrElse(0))
    // inventory entries that are NEW INFORMATION for files the head
    // already lists (an analyzeSchema backfill of a legacy table): they
    // must ride the record (replay only carries entries the head HAS)
    // and they count toward the checkpoint guard (an O(files) backfill
    // re-anchors instead of writing an O(files) delta every cold replay
    // re-pays). Entries merely RESTATING what the head already carries
    // are dropped from delta records — files are immutable, replay
    // serves them already.
    val addedSet = added.toSet
    val fstatBackfill = headS.map(h => callerFstat.filter(kv =>
      !addedSet(kv._1) && !h.fstat.contains(kv._1))).getOrElse(Map.empty)
    // a colmap-RESTATING commit always checkpoints: delta records cannot
    // carry the mapping (carriers are O(files-at-rename)), they inherit
    // it — so the record that CHANGES it must re-anchor the chain
    val writeDelta = headS.isDefined && interval > 1 && !replaceColmap &&
      !replaceDvs &&
      (v - headS.get.base) < interval &&
      removed.size * 2 <= math.max(1, headFiles.size) &&
      (added.size + freshStats.size + freshSStats.size +
        freshBloom.size + fstatBackfill.size + callerDvs.size) * 2 <=
        math.max(8, headFiles.size + added.size)
    val (body, snap) =
      if (writeDelta) {
        // adds/removes SORTED before both the record and the cache poke:
        // renderDelta sorts the body's name arrays, so an unsorted poke
        // would make the same version's resolved file ORDER depend on
        // cache state (nondeterministic split assignment across JVMs)
        val addedS = added.sorted
        val removedS = removed.sorted
        // the record's inventory overlay = entries for ADDED files plus
        // the backfill of head-missing entries (guarded small above):
        // replay already carries the head's entries for every other
        // unchanged file (files are immutable, so those entries can
        // never go stale), and an analyzeSchema/restore-shaped caller
        // RESTATING fstat for the whole table would otherwise write an
        // O(files) overlay into a delta record that every cold replay
        // re-pays until the next checkpoint
        val deltaFstat = callerFstat.filter(kv => addedSet(kv._1)) ++
          fstatBackfill ++ statted
        val rec = DeltaRec(headS.get.base, addedS, removedS,
          outSchemaStored, outPartSchema, freshStats, freshSStats, freshBloom,
          deltaFstat, hwm, Some(ctime), dvs = callerDvs)
        (renderDelta(v, token, rec.base, addedS, removedS, hwm,
          freshStats, freshSStats, freshBloom,
          outSchemaStored.map(encodeSchema), deltaFstat,
          ctimeMillis = Some(ctime),
          partSchemaB64 = outPartSchema.map(encodeSchema),
          dvs = callerDvs)
          .getBytes(StandardCharsets.UTF_8),
          applyDelta(headS.get, rec))
      } else {
        // data-skipping stats survive a checkpoint like they survived
        // every full body: carry the head's stats for files still listed,
        // overlay the caller's — so an append after an [[analyze]] keeps
        // every analyzed file prunable. The overlay merges PER COLUMN,
        // not per file: an analyze over column set B must not erase a
        // file's committed column-A stats (the streaming sink commits ts
        // born-prunable; a nightly analyze(k) that replaced the inner map
        // wholesale would silently un-prune ts table-wide)
        def carry[A](headM: Map[String, Map[String, A]],
            fresh: Map[String, Map[String, A]]): Map[String, Map[String, A]] =
          (headM.keySet ++ fresh.keySet).iterator
            .filter(fileSet)
            .map(f => f -> (headM.getOrElse(f, Map.empty[String, A]) ++
              fresh.getOrElse(f, Map.empty[String, A])))
            .filter(_._2.nonEmpty)
            .toMap
        val outStats = carry(headS.map(_.stats).getOrElse(Map.empty), freshStats)
        val outSStats = carry(headS.map(_.sstats).getOrElse(Map.empty), freshSStats)
        val outBloom = carry(headS.map(_.bloom).getOrElse(Map.empty), freshBloom)
        val outFstat =
          (headS.map(_.fstat).getOrElse(Map.empty) ++ callerFstat)
            .filter(kv => fileSet(kv._1)) ++ statted
        (render(v, token, files, hwm, outStats, outSStats, outBloom,
          outSchemaStored.map(encodeSchema), outFstat,
          ctimeMillis = Some(ctime),
          partSchemaB64 = outPartSchema.map(encodeSchema),
          colmapB64 =
            if (outRenames.isEmpty && outDropped.isEmpty) None
            else Some(encodeColmap(outRenames, outDropped, files.sorted)),
          dvs = outDvs)
          .getBytes(StandardCharsets.UTF_8),
          Snap(files.sorted.toVector, outSchemaStored, outPartSchema, outStats, outSStats,
            outBloom, outFstat, hwm, Some(ctime), base = v,
            renames = outRenames, dropped = outDropped, dvs = outDvs))
      }
    val target = manifestPath(p, v)
    if (!createExclusive(fs, mdir, target, body)) None
    else {
      // poke the resolution caches with the state this commit just
      // determined, so the committer's NEXT head read (its own CAS loop,
      // the streaming sink's next epoch) replays nothing — the step that
      // keeps a commit CHAIN O(delta) instead of O(table) per link
      scala.util.Try(cacheSnap(dir, v, fs.getFileStatus(target), snap))
      writeHeadHint(fs, p, v)
      Some(v)
    }
  }

  /** CAS-append `names` to the head as a DELTA record — the O(delta) HOT
    * PATH of the commit protocol (every streaming epoch, every SQL
    * INSERT). Semantically identical to
    * `commitIf(head.files ++ names, expectedHead, …)` with nothing
    * removed, but it never BUILDS, SCANS, or REWRITES the O(table) file
    * list: the cost is ONE combined pass over the head names (batch-name
    * dedupe — a conversion race's v1 may already list them — plus the
    * layout sample the chain check needs), a delta-record write sized by
    * the batch, and a structurally-shared cache advance
    * ([[applyDelta]]'s fast path). Measured against the in-memory
    * full-list path this removes ~6 O(files) string-hashing passes per
    * commit (3.5 s → the one ~50 ms pass at 1M files).
    *
    * The caller must have read `(expectedHead, headS)` from [[headSnap]]
    * and must route to [[commitIf]] instead when the chain is due a
    * CHECKPOINT (chain length ≥ interval) — this method only ever writes
    * delta records. Returns None on CAS conflict, like commitIf. */
  private def commitAppendDelta(spark: SparkSession, dir: String,
      names: Seq[String], expectedHead: Long, headS: Snap,
      hwm: Option[Long], stats: FileStats, sstats: FileStringStats,
      schema: Option[StructType]): Option[Long] = {
    val (fs, p) = fsFor(spark, dir)
    val mdir = new Path(p, ManifestDir)
    val v = expectedHead + 1
    val nameSet = names.toSet
    var dups = Set.empty[String]
    var headNested: Option[String] = None
    headS.files.foreach { f =>
      if (nameSet(f)) dups += f
      if (headNested.isEmpty && f.indexOf('/') >= 0) headNested = Some(f)
    }
    // exact requireLayoutMatch semantics from a two-element sample: the
    // check only consults prev's FIRST nested name and non-emptiness
    val prevSample: Seq[String] =
      headNested.map(Seq(_)).getOrElse(
        if (headS.files.nonEmpty) Seq("flat-sample") else Seq.empty)
    requireLayoutMatch(prevSample, names, "append")
    val adds = names.distinct.filterNot(dups)
    // schema posture identical to commitIf's non-replacing merge (the
    // head EXISTS here, so the fresh-table branches cannot apply)
    def inferAdded(): Option[StructType] =
      scala.util.Try(spark.read.option("mergeSchema", "true")
        .parquet(adds.map(f => s"$dir/$f"): _*).schema).toOption
    val outSchema: Option[StructType] = ((headS.schema, schema) match {
      case (Some(a), Some(b)) => Some(SchemaBridge.merge(a, b))
      case (Some(a), None) =>
        if (adds.isEmpty) Some(a) else inferAdded().map(SchemaBridge.merge(a, _))
      case (None, _) => None // pre-schema table: the delta is not evidence
    }).map(SchemaBridge.asNullable)
    // same new-column-vs-carried-physical-name guard as commitIf —
    // rename entries' physical `from`s AND drop tombstones both pin
    // names that live footers still carry
    if (headS.renames.nonEmpty || headS.dropped.nonEmpty)
      outSchema.foreach { s =>
        val headNames = headS.schema
          .map(_.fieldNames.map(_.toLowerCase).toSet).getOrElse(Set.empty)
        val collide = s.fieldNames
          .filterNot(n => headNames(n.toLowerCase))
          .filter(n => headS.renames.exists(_.from.equalsIgnoreCase(n)) ||
            headS.dropped.exists(_.name.equalsIgnoreCase(n)))
        require(collide.isEmpty,
          s"cannot add column(s) ${collide.mkString(", ")} to $dir: the " +
            "name is still physically carried by files written before a " +
            "RENAME/DROP COLUMN; OPTIMIZE the table to rewrite the " +
            "carriers first (a DROP tombstone's carrier set is " +
            "conservative — the column's whole file generation — so " +
            "this can mean a full-table OPTIMIZE)")
      }
    val outPartSchema = headS.partSchema // appends never restate it
    val addSet = adds.toSet
    val freshStats = cleanStats(stats.filter(kv => addSet(kv._1)))
    val freshSStats = cleanSStats(sstats.filter(kv => addSet(kv._1)))
    val statted = adds.flatMap { f =>
      scala.util.Try {
        val s = fs.getFileStatus(new Path(p, f))
        f -> (s.getLen, s.getModificationTime)
      }.toOption
    }.toMap
    val ctime = System.currentTimeMillis()
    val token = UUID.randomUUID().toString
    // sorted for cache/parse file-order agreement (see commitIf's note)
    val addsS = adds.sorted
    val rec = DeltaRec(headS.base, addsS, Seq.empty, outSchema,
      outPartSchema, freshStats, freshSStats, Map.empty, statted, hwm,
      Some(ctime))
    val body = renderDelta(v, token, rec.base, addsS, Seq.empty, hwm,
      freshStats, freshSStats, Map.empty,
      outSchema.map(encodeSchema), statted, ctimeMillis = Some(ctime),
      partSchemaB64 = outPartSchema.map(encodeSchema))
      .getBytes(StandardCharsets.UTF_8)
    val target = manifestPath(p, v)
    if (!createExclusive(fs, mdir, target, body)) None
    else {
      scala.util.Try(
        cacheSnap(dir, v, fs.getFileStatus(target), applyDelta(headS, rec)))
      writeHeadHint(fs, p, v)
      Some(v)
    }
  }

  /** Whether the NEXT commit on this head must re-anchor the chain with
    * a full checkpoint (see [[checkpointInterval]]). */
  private def checkpointDue(spark: SparkSession, headV: Long,
      headS: Snap): Boolean = {
    val interval = effectiveCheckpointInterval(spark, headS.files.size)
    interval <= 1 || (headV + 1 - headS.base) >= interval
  }

  /** The streaming sink's CAS-append loop ([[appendFiles]] plus the
    * epoch metadata): append already-moved-in `names` with the batch-id
    * high-water mark and the batch's born-prunable stats, routing each
    * attempt through the O(delta) [[commitAppendDelta]] hot path (or the
    * due checkpoint). The layout compatibility check runs INSIDE every
    * attempt. Returns the committed version. */
  private[graft] def appendBatch(spark: SparkSession, dir: String,
      names: Seq[String], hwm: Option[Long], stats: FileStats,
      sstats: FileStringStats, schema: Option[StructType]): Long = {
    var attempts = 0
    while (attempts < 64) {
      val committed = headSnap(spark, dir) match {
        case None =>
          requireLayoutMatch(Seq.empty, names, "streaming append")
          commitIf(spark, dir, names.distinct, 0L, hwm, stats, sstats,
            schema = schema)
        case Some((v, snap)) if checkpointDue(spark, v, snap) =>
          requireLayoutMatch(snap.files, names, "streaming append")
          commitIf(spark, dir, (snap.files ++ names).distinct, v, hwm,
            stats, sstats, schema = schema)
        case Some((v, snap)) =>
          commitAppendDelta(spark, dir, names, v, snap, hwm, stats,
            sstats, schema)
      }
      committed match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"streaming append lost $attempts races in $dir; giving up")
  }

  /** Commit `files` (dir-relative names) as the next manifest version —
    * last-writer-wins SNAPSHOT-REPLACE semantics (retries [[commitIf]]
    * against the refreshed head until it wins). Correct when `files` is a
    * complete snapshot the caller owns outright (publish, init); callers
    * that derived `files` from a previous head must use [[commitIf]]
    * directly. `hwm` carries the streaming append high-water mark into
    * the manifest body. Returns the committed version. */
  def commit(spark: SparkSession, dir: String, files: Seq[String],
      hwm: Option[Long] = None,
      schema: Option[StructType] = None,
      replaceSchema: Boolean = false,
      partSchema: Option[StructType] = None): Long = {
    var attempts = 0
    while (attempts < 64) {
      val head = read(spark, dir).map(_._1).getOrElse(0L)
      commitIf(spark, dir, files, head, hwm,
        schema = schema, replaceSchema = replaceSchema,
        partSchema = partSchema) match {
        case Some(v) => return v
        case None => attempts += 1
      }
    }
    sys.error(s"manifest commit lost $attempts races in $dir; giving up")
  }

  /** CAS-APPEND already-moved-in data files to the head's list, preserving
    * the streaming high-water mark and merging the writer's declared
    * schema — the commit step of the SQL `INSERT INTO` path
    * ([[graft.sources.ManifestTableProvider]]). `names` must already live
    * in `dir` under their final names. On an UNTRACKED dir holding
    * pre-existing data files the table is converted in place first
    * ([[init]] sweeps everything, the new files included) so the first
    * manifest can never shadow rows a plain-dir reader was already seeing.
    * The file list is deduped, so racing the conversion (whose v1 already
    * lists `names`) cannot double-list — a double-listed file would be
    * scanned twice. */
  /** Convert an UNTRACKED dir holding pre-existing data in place before
    * an append-shaped write touches it, so the first manifest can never
    * shadow rows a plain-dir reader was already seeing. Protocol-named
    * files don't count as plain-dir data (a racing writer's uncommitted
    * move-ins, or crash orphans — init skips them for the same reason);
    * hive-shaped `k=v` subdirs holding data DO count (an untracked
    * PARTITIONED plain dir — the conversion also lets the write path
    * read the layout and lay its batch out nested). Called by
    * [[appendFiles]] and, BEFORE the layout is consulted, by the
    * provider's INSERT commit. No-op on tracked dirs. */
  private[graft] def convertIfPlainData(spark: SparkSession,
      dir: String): Unit =
    if (read(spark, dir).isEmpty) {
      val (fs, p) = fsFor(spark, dir)
      def hasDataUnder(at: Path): Boolean =
        fs.listStatus(at).exists { s =>
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".") &&
            (s.isFile || hasDataUnder(s.getPath))
        }
      val entries = if (!fs.exists(p)) Seq.empty else fs.listStatus(p).toSeq
      val pre = entries.filter { s =>
        val n = s.getPath.getName
        s.isFile && !n.startsWith("_") && !n.startsWith(".") &&
          !inFlightProtocolName(n)
      }
      val nestedHive = entries.exists { s =>
        val n = s.getPath.getName
        s.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
          n.contains("=") && hasDataUnder(s.getPath)
      }
      if (pre.nonEmpty || nestedHive) { init(spark, dir); () }
    }

  private[graft] def appendFiles(spark: SparkSession, dir: String,
      names: Seq[String], schema: Option[StructType]): Long = {
    convertIfPlainData(spark, dir)
    var attempts = 0
    while (attempts < 64) {
      // the layout check (the writer chose flat or k=v-nested names from
      // the layout it saw) runs INSIDE the CAS loop — in
      // commitAppendDelta itself — so a racing layout change is loud,
      // never a mixed listing with silently-NULL partition values
      val committed = headSnap(spark, dir) match {
        case None => // first commit: a checkpoint by definition
          requireLayoutMatch(Seq.empty, names, "append")
          commitIf(spark, dir, names.distinct, 0L, None, schema = schema)
        case Some((v, snap)) if checkpointDue(spark, v, snap) =>
          requireLayoutMatch(snap.files, names, "append")
          commitIf(spark, dir, (snap.files ++ names).distinct, v, snap.hwm,
            schema = schema)
        case Some((v, snap)) => // the O(delta) hot path
          commitAppendDelta(spark, dir, names, v, snap, snap.hwm,
            Map.empty, Map.empty, schema)
      }
      committed match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"manifest append lost $attempts races in $dir; giving up")
  }

  /** CAS-REPLACE the head's file list with already-moved-in data files,
    * preserving the streaming high-water mark — the commit step of SQL
    * `INSERT OVERWRITE` ([[publish]] minus the write: the provider's
    * delegated parquet writer already produced the files). The hwm
    * survives for the same reason it survives [[publish]]: it records
    * which stream epochs were APPLIED, and an overwrite does not un-apply
    * them — dropping it would let a checkpoint replay double-append into
    * the fresh snapshot. Works on untracked dirs too (first commit
    * becomes v1; the old plain files are delisted — overwrite semantics —
    * and reclaimable by [[vacuum]]). */
  private[graft] def replaceFiles(spark: SparkSession, dir: String,
      names: Seq[String], schema: Option[StructType]): Long = {
    // a full-snapshot replace RESTATES the partition declaration from its
    // own layout (inferred from the new names): a flat overwrite of a
    // previously-partitioned table clears it, a nested one re-declares —
    // a stale declaration would make later writers lay batches out for a
    // layout the data no longer has. EXCEPTION: an overwrite to EMPTY
    // keeps the head's declaration (nothing to infer from, and
    // truncating a partitioned table must not flatten it).
    val partSchema = inferredPartitionSchema(spark, dir, names)
    val replacePart = names.nonEmpty
    var attempts = 0
    while (attempts < 64) {
      val head = readHead(spark, dir)
      commitIf(spark, dir, names, head.map(_._1).getOrElse(0L),
        head.flatMap(_._3),
        schema = schema, replaceSchema = true,
        partSchema = partSchema, replacePartSchema = replacePart) match {
        case Some(v) => return v
        case None => attempts += 1
      }
    }
    sys.error(s"manifest replace lost $attempts races in $dir; giving up")
  }

  /** How many manifest versions retention currently keeps — ONE
    * `_manifest/` name listing, no body reads (what DESCRIBE DETAIL
    * needs; [[history]] reads every body and is for the ledger). */
  def versionCount(spark: SparkSession, dir: String): Long = {
    val (fs, p) = fsFor(spark, dir)
    val mdir = new Path(p, ManifestDir)
    if (!fs.exists(mdir)) 0L
    else fs.listStatus(mdir).count(s => versionOf(s.getPath.getName).isDefined).toLong
  }

  /** The table's commit HISTORY as a DataFrame — one row per surviving
    * manifest version: `(version, commit_ts, n_files, bytes, n_added,
    * n_removed, hwm)`, `commit_ts` from the body-recorded commit wall
    * clock (manifest-file mtime for pre-ctime manifests), `bytes` from
    * the committed filestat inventory (null when the
    * version predates it), adds/removes as name-set deltas vs the
    * previous SURVIVING version (retention may have pruned intermediate
    * manifests — deltas are then vs what remains, the honest answer).
    * The audit surface a table format owes its operators: what changed,
    * when the table grew, which commit a stream's hwm landed in. Driver
    * cost is O(versions) small metadata reads; the row set is a local
    * relation (history is metadata, not data — never a distributed
    * scan). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (fs, p) = fsFor(spark, dir)
    val listing = manifestListing(fs, p)
    historyListedHook()
    val versions = listing.toSeq.sortBy(_._1)
    // one ascending REPLAY: each delta record folds into the running
    // state (a checkpoint resets it), so the whole ledger costs the sum
    // of the record sizes — never versions × O(files). A gap left by
    // retention re-anchors through the chain resolver (vacuum keeps every
    // version from the oldest retained version's base forward, so the
    // chain is always whole).
    var state: Snap = null
    var stateV = Long.MinValue
    // commit stamps are MONOTONIZED by running max over ascending
    // versions, exactly like [[versionAsOfTime]]: commits are sequential
    // but wall clocks across committing processes can skew, and a ledger
    // whose commit_ts disagreed with what TIMESTAMP AS OF resolves would
    // send an operator to the wrong version.
    var runningTs = Long.MinValue
    var prev = Set.empty[String]
    val rows = versions.flatMap { case (v, status) =>
      // a zero-grace vacuum can prune a LISTED version (or a chain
      // record behind it) between the listing above and this body read
      // — the version is then simply no longer SURVIVING, and the
      // honest ledger omits it exactly as a listing taken after the
      // prune would have; the replay re-anchors at the next version
      // through the chain resolver (stateV no longer matches). A raw
      // FileNotFound here would be rude, not wrong — same politeness
      // discipline as headSnap/snapAt.
      try {
        val body = readBody(fs, status.getPath)
        val snap = parseBody(v, body) match {
          case Right(full) => full
          case Left(d) if state != null && stateV == v - 1 =>
            applyDelta(state, d)
          case Left(_) => resolveSnap(fs, p, dir, v, listing)
        }
        state = snap; stateV = v
        val files = snap.files
        val bytes: Option[Long] =
          if (files.nonEmpty && files.forall(snap.fstat.contains))
            Some(files.iterator.map(f => snap.fstat(f)._1).sum)
          else if (files.isEmpty) Some(0L)
          else None
        val cur = files.toSet
        runningTs = math.max(runningTs, commitTimeOf(status, body))
        val row = (v, new java.sql.Timestamp(runningTs),
          files.size.toLong, bytes,
          (cur -- prev).size.toLong, (prev -- cur).size.toLong,
          snap.hwm)
        prev = cur
        Some(row)
      } catch {
        case _: java.io.FileNotFoundException => None
      }
    }
    rows.toDF("version", "commit_ts", "n_files", "bytes",
      "n_added", "n_removed", "hwm")
  }

  /** Start tracking an existing plain parquet directory: commit its current
    * data files as version 1. No-op (returns the head) if already tracked.
    *
    * HIVE-PARTITIONED layouts are swept RECURSIVELY: subdirectories whose
    * names aren't protocol-reserved (`_…`, `.…`) are walked and their
    * files recorded under dir-RELATIVE names (`date=2024-01-01/part-….
    * parquet`), so the manifest body itself carries the partition values
    * and [[graft.sources.ManifestFileIndex]] can serve partition columns
    * and zero-FS-call pruning from the names alone. The carried v1 schema
    * is the merged FOOTER schema (data columns only — partition columns
    * live in the names, appended at read). Partitioned tables are
    * read-oriented through this protocol: the copy-on-write rewrites
    * ([[eraseWhereEq]] family, [[mergeByKey]], [[updateWhere]],
    * compaction) reject them loudly rather than silently flattening
    * partition values out of rewritten rows.
    *
    * PROTOCOL-NAMED files (`sql-<tag>-pN`, `b<id>-…`) are skipped: on an
    * untracked dir those can only be a racing protocol writer's
    * moved-but-not-yet-committed files (its own CAS will list them — and
    * sweeping them here would linearize a crashed insert's PARTIAL write
    * as committed rows) or crash orphans awaiting [[vacuum]]. A tracked
    * dir whose `_manifest/` was manually deleted loses those files on
    * re-init — recover such a table from its manifest history, not by
    * re-converting the directory. */
  def init(spark: SparkSession, dir: String): Long =
    read(spark, dir).map(_._1).getOrElse {
      val (fs, p) = fsFor(spark, dir)
      // only HIVE-SHAPED (`k=v`) subdirectories are table data — the same
      // predicate vacuum's nested sweep uses, and for the same reason: a
      // user subdir (backups, exports) must never be committed as table
      // rows. A non-hive subdir that DOES hold data files is loud instead
      // of silently skipped: skipping would serve a different row set
      // than the plain `spark.read.parquet(dir)` this conversion replaces.
      def hasData(at: Path): Boolean =
        fs.listStatus(at).exists { s =>
          val n = s.getPath.getName
          !n.startsWith("_") && !n.startsWith(".") &&
            (s.isFile || hasData(s.getPath))
        }
      def sweep(at: Path, prefix: String): Seq[String] =
        fs.listStatus(at).toSeq.flatMap { s =>
          val n = s.getPath.getName
          if (n.startsWith("_") || n.startsWith(".")) Seq.empty
          else if (s.isFile)
            if (inFlightProtocolName(n)) Seq.empty else Seq(prefix + n)
          else if (n.contains("=")) sweep(s.getPath, s"$prefix$n/")
          else if (hasData(s.getPath)) sys.error(
            s"init: $dir contains data files under the non-hive " +
              s"subdirectory '$prefix$n/' — only k=v partition " +
              "directories are table data; move foreign files out (or " +
              "point init at a clean directory) before converting")
          else Seq.empty // empty / hidden-only subdir: harmless
        }
      val names = sweep(p, "")
      // the one merged-footer sweep this table will ever need: the schema
      // lands in v1 and every later commit carries it forward (data
      // columns only — a hive layout's partition columns ride the names,
      // and their inferred schema is DECLARED alongside so the layout
      // survives even an emptied file list)
      val schema =
        if (names.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .parquet(names.map(f => s"$dir/$f"): _*).schema)
      commit(spark, dir, names, schema = schema, replaceSchema = true,
        partSchema = inferredPartitionSchema(spark, dir, names))
    }

  /** The partition schema Spark's own inference derives from nested
    * manifest NAMES (columns + types, values discarded) — fabricated
    * statuses only, zero filesystem calls. None for flat layouts. */
  private def inferredPartitionSchema(spark: SparkSession, dir: String,
      names: Seq[String]): Option[StructType] =
    if (!names.exists(_.contains("/"))) None
    else {
      val (fs, p) = fsFor(spark, dir)
      val qdir = fs.makeQualified(p)
      val statuses = names.map(n => new org.apache.hadoop.fs.FileStatus(
        1L, false, 1, 0L, 0L, new Path(qdir, n))).toArray
      val spec = new graft.sources.ManifestFileIndex(spark, qdir, statuses)
        .partitionSpec()
      if (spec.partitionColumns.isEmpty) None
      else Some(SchemaBridge.asNullable(spec.partitionColumns))
    }

  /** Manifest-pinned scan: exactly the head manifest's files. Falls back to
    * a plain directory read when `dir` is untracked. Schemas are merged
    * across the listed files — an appender that evolved the schema (added
    * a column) must not have later files' columns silently dropped because
    * an older file happened to win the footer sample. */
  def readTable(spark: SparkSession, dir: String): DataFrame =
    readFull(spark, dir) match {
      case Some((_, names, schema, fstat, partSchema, renames, dvs)) =>
        scanListed(spark, dir, names, schema, fstat, partSchema, renames,
          dvs)
      case None => spark.read.parquet(dir)
    }

  /** Write `df` to a hidden scratch dir and move its data files in under
    * `prefix`-stamped unique names — the shared first half of every
    * whole-file rewrite commit (publish, z-order optimize). */
  /** `rel` (empty for flat tables, a `k=v/` leaf prefix for a
    * partition-scoped rewrite) is where the finalized files move IN —
    * returned names are dir-relative and include it. */
  private def writeAndMoveIn(df: DataFrame, prefix: String,
      dir: String, rel: String = ""): Seq[String] = {
    require(rel.isEmpty || rel.endsWith("/"),
      s"writeAndMoveIn: rel must be a directory prefix: '$rel'")
    val spark = df.sparkSession
    val (fs, p) = fsFor(spark, dir)
    fs.mkdirs(p)
    val tmp = new Path(p, s"_publish_tmp-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val snap = UUID.randomUUID().toString.take(8)
    if (rel.nonEmpty) fs.mkdirs(new Path(p, rel))
    val moved = fs.listStatus(tmp).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.map { s =>
      val name = s"$rel$prefix-$snap-${s.getPath.getName}"
      require(fs.rename(s.getPath, new Path(p, name)),
        s"rename failed: ${s.getPath}")
      name
    }
    fs.delete(tmp, true)
    moved
  }

  /** Atomically replace the table's contents with `df` (full-snapshot
    * publish, the SCD-2 / upsert "diff then publish" commit step): write
    * the new files under a hidden temp dir, move them in under unique
    * names, then commit a manifest listing ONLY them. Readers on the old
    * head keep their files (nothing is deleted here — run [[vacuum]] after
    * a grace period). Returns the committed version. */
  def publish(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val moved = writeAndMoveIn(df, "snap", dir)
    // full-snapshot replace, but writer metadata (the streaming append
    // high-water mark) must survive maintenance — and must be re-read
    // TOGETHER with the head on every CAS attempt: reading hwm once and
    // then retrying the commit against a refreshed head (as a plain
    // commit() would) lets a streaming append that lands in the window
    // get its high-water rolled back, so a checkpoint replay of that
    // epoch would double-append. Same loop shape as Compaction.
    var attempts = 0
    while (attempts < 64) {
      val head = readHead(spark, dir)
      commitIf(spark, dir, moved, head.map(_._1).getOrElse(0L),
        head.flatMap(_._3),
        schema = Some(df.schema), replaceSchema = true,
        // a flat publish clears any partition declaration: the new
        // snapshot carries its "partition" columns as DATA
        partSchema = None, replacePartSchema = true) match {
        case Some(v) => return v
        case None => attempts += 1
      }
    }
    sys.error(s"manifest publish lost $attempts races in $dir; giving up")
  }

  /** [[publish]] for HIVE-PARTITIONED layouts — the sanctioned way a
    * partitioned tracked table comes to exist (and is re-snapshotted)
    * without an out-of-band directory: `df` is written
    * `partitionBy(partitionCols)` into a hidden temp dir, every leaf
    * file moves in UNDER its `k=v/` subpath with a snapshot-unique name,
    * and the commit lists the dir-RELATIVE names — so the manifest body
    * itself carries the partition values and every partitioned-read
    * feature (served partition columns, zero-FS-call pruning,
    * [[dropPartitions]], SHOW PARTITIONS) applies from the first
    * version. The carried schema is the DATA columns only (partition
    * values live in the names, appended at read — the [[init]]
    * convention). Old snapshots' files stay on disk for time travel
    * until [[vacuum]] (which walks the shared partition dirs). Returns
    * the committed version. */
  def publishPartitioned(df: DataFrame, dir: String,
      partitionCols: Seq[String]): Long = {
    require(partitionCols.nonEmpty, "publishPartitioned: no partition columns")
    partitionCols.foreach(c => require(df.columns.contains(c),
      s"publishPartitioned: `$c` is not a column of the DataFrame"))
    val spark = df.sparkSession
    val moved = writeAndMoveInPartitioned(df, "snap", dir, partitionCols)
    val dataSchema = StructType(df.schema.fields.filterNot(f =>
      partitionCols.exists(_.equalsIgnoreCase(f.name))))
    var attempts = 0
    while (attempts < 64) {
      val head = readHead(spark, dir)
      commitIf(spark, dir, moved, head.map(_._1).getOrElse(0L),
        head.flatMap(_._3),
        schema = Some(dataSchema), replaceSchema = true,
        partSchema = inferredPartitionSchema(spark, dir, moved),
        replacePartSchema = true) match {
        case Some(v) => return v
        case None => attempts += 1
      }
    }
    sys.error(s"partitioned publish lost $attempts races in $dir; giving up")
  }

  /** [[writeAndMoveIn]] for HIVE-PARTITIONED rewrites — the shared first
    * half of every partitioned write commit (partitioned publish, the
    * partitioned DML rewrites, the SQL INSERT / streaming-append
    * re-layout): `df`, which CARRIES the partition columns as data, is
    * written `partitionBy(partCols)` into a hidden scratch dir, and every
    * leaf file moves in UNDER its `k=v/` subpath with a `prefix`-stamped
    * unique basename — so the name-carried partition values are minted by
    * Spark's own hive path escaping, never hand-formatted. No shuffle is
    * forced: each input task writes one file per partition value it
    * actually holds, so a rewrite whose input tasks are leaf-aligned
    * (victim files of one partition) stays leaf-aligned on output. */
  private[graft] def writeAndMoveInPartitioned(df: DataFrame, prefix: String,
      dir: String, partCols: Seq[String]): Seq[String] = {
    require(partCols.nonEmpty, "writeAndMoveInPartitioned: no partition columns")
    partCols.foreach(c => require(df.columns.exists(_.equalsIgnoreCase(c)),
      s"partitioned write: `$c` is not a column of the DataFrame " +
        s"(has ${df.columns.toSeq.sorted.mkString(", ")})"))
    val spark = df.sparkSession
    val (fs, p) = fsFor(spark, dir)
    fs.mkdirs(p)
    val tmp = new Path(p, s"_publish_tmp-${UUID.randomUUID()}")
    df.write.partitionBy(partCols: _*).mode("overwrite")
      .parquet(tmp.toString)
    val snap = UUID.randomUUID().toString.take(8)
    def moveIn(at: Path, rel: String): Seq[String] =
      fs.listStatus(at).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (s.isDirectory) moveIn(s.getPath, s"$rel$n/")
        else {
          val name = s"$rel$prefix-$snap-$n"
          if (rel.nonEmpty) fs.mkdirs(new Path(p, rel))
          require(fs.rename(s.getPath, new Path(p, name)),
            s"rename failed: ${s.getPath}")
          Seq(name)
        }
      }
    val moved = moveIn(tmp, "")
    fs.delete(tmp, true)
    moved
  }

  /** Files of one SPECIFIC committed version, if its manifest still
    * exists. Old manifests are kept by [[vacuum]] (only data files the
    * HEAD no longer lists are reclaimed), so history survives until a
    * caller prunes `_manifest/` explicitly — but a version whose data
    * files were vacuumed away will scan incompletely; time travel is only
    * guaranteed before any vacuum past that version. */
  def readAt(spark: SparkSession, dir: String,
      version: Long): Option[Seq[String]] =
    snapAt(spark, dir, version).map(_.files)

  /** The newest version committed AT OR BEFORE `epochMillis` — the
    * `TIMESTAMP AS OF` resolution step. Commit creation is sequential
    * (the CAS linearization point), so manifest mtimes are monotone in
    * version; the answer is exact up to the filesystem's mtime
    * granularity. None when the table has no version that old (asking
    * for a time before the table existed must be LOUD at the caller,
    * not silently the oldest snapshot) or when retention already pruned
    * the version that covered it — history keeps time travel honest,
    * it never invents it. */
  def versionAsOfTime(spark: SparkSession, dir: String,
      epochMillis: Long): Option[Long] = {
    val (fs, p) = fsFor(spark, dir)
    val mdir = new Path(p, ManifestDir)
    if (!fs.exists(mdir)) return None
    // commit times come from the manifest BODY (exact wall-clock millis
    // recorded at commit; see CtimeRe), falling back to the file mtime
    // for pre-field manifests — and are MONOTONIZED by running max over
    // ascending versions (the Delta in-commit-timestamp posture): commits
    // are sequential, but wall clocks across committing processes can
    // skew, and a non-monotone stamp would make "as of t" ambiguous.
    // Cost is O(surviving versions) small body reads per time-travel
    // resolution — the same envelope history() already pays.
    val versions = fs.listStatus(mdir).toSeq
      .flatMap(s => versionOf(s.getPath.getName).map(_ -> s))
      .sortBy(_._1)
    var running = Long.MinValue
    versions.map { case (v, s) =>
      val ct = parseCtime(readBody(fs, s.getPath))
        .getOrElse(s.getModificationTime)
      running = math.max(running, ct)
      (v, running)
    }.filter(_._2 <= epochMillis).lastOption.map(_._1)
  }

  /** The recorded commit wall-clock of one version (body `ctime`, mtime
    * fallback) — what DESCRIBE HISTORY / DETAIL surface. */
  private def commitTimeOf(
      status: org.apache.hadoop.fs.FileStatus, body: String): Long =
    parseCtime(body).getOrElse(status.getModificationTime)

  /** Time travel by WALL CLOCK: scan the table as it was at
    * `epochMillis` ([[readTableAt]] of [[versionAsOfTime]]'s answer).
    * Loud when no committed version is that old. */
  def readTableAsOf(spark: SparkSession, dir: String,
      epochMillis: Long): DataFrame =
    versionAsOfTime(spark, dir, epochMillis) match {
      case Some(v) => readTableAt(spark, dir, v)
      case None => sys.error(s"no version of $dir existed at " +
        s"epoch-millis $epochMillis (before the first surviving commit)")
    }

  /** Time travel: scan the table exactly as of `version` — with that
    * VERSION's schema when carried (a column dropped by a later publish
    * reappears; one added later doesn't leak backwards). */
  def readTableAt(spark: SparkSession, dir: String, version: Long): DataFrame =
    snapAt(spark, dir, version) match {
      case Some(s) =>
        scanListed(spark, dir, s.files, s.schema, s.fstat, s.partSchema,
          s.renames, s.dvs)
      case None => sys.error(s"no manifest v$version under $dir")
    }

  /** Scan of a manifest-listed file set under that manifest's schema.
    * With the schema carried, the scan plans through the DSv2 path over a
    * file index fabricated from the SAME manifest body
    * ([[graft.sources.ManifestScans]]) — zero footer reads AND zero
    * filesystem calls at planning (flat cost in file count, the profile a
    * million-file table needs; gaps in the filestat inventory cost one
    * directory listing). Pre-schema manifests keep the merged footer
    * inference fallback (O(files) metadata reads — correct, and
    * [[analyzeSchema]] upgrades them). A carried schema also makes the
    * zero-file table readable: scanning an empty SNAPSHOT of a tracked
    * table is a real state (erase-all, pre-first-append), not an error. */
  private[graft] def scanListed(spark: SparkSession, dir: String,
      files: Seq[String], schema: Option[StructType],
      fstat: Map[String, (Long, Long)] = Map.empty,
      partSchema: Option[StructType] = None,
      renames: Seq[Rename] = Seq.empty,
      dvs: Map[String, (String, Long)] = Map.empty): DataFrame = {
    // DELETION-VECTOR gate: files with a dv read through the V1 parquet
    // path (`_metadata.row_index` — unavailable on the DSv2 fast path)
    // with the codegen'd position filter, then union back onto the
    // zero-FS-call scan of the CLEAN majority. Planning the dv branch
    // costs O(DV'd files) filesystem calls — the dv set is sparse by
    // contract (whole-file deletes drop the file; OPTIMIZE materializes
    // heavy ones), so the flat-cost planning of the big scan survives.
    val dvd = files.filter(dvs.contains)
    if (dvd.nonEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      val clean = files.filterNot(dvs.contains)
      val partCols = partitionColsIn(files)
      val reader = spark.read.option("mergeSchema", "true")
      val raw = (if (partCols.isEmpty) reader
        else reader.option("basePath", dir))
        .parquet(dvd.map(f => s"$dir/$f"): _*)
      val dvdSet = dvd.toSet
      val kept = Dv.applyToScan(spark, dir, raw,
        dvs.filter(kv => dvdSet(kv._1)))
      val logical = projectToDeclared(coalesceRenamed(kept, renames),
        schema, partCols)
      // align to the declared schema the clean branch serves: declared
      // columns the dv'd footers predate appear as typed NULLs, and
      // narrow physical types up-cast to the declared width
      val dvBranch = schema match {
        case Some(s) =>
          val have = logical.columns.map(_.toLowerCase).toSet
          val declared = s.fields.map { f =>
            if (have(f.name.toLowerCase)) col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)
          }
          val extras = logical.columns.filterNot(c =>
            s.fieldNames.exists(_.equalsIgnoreCase(c))).map(col)
          logical.select(declared.toSeq ++ extras: _*)
        case None => logical
      }
      return (
        if (clean.isEmpty) dvBranch
        else scanListed(spark, dir, clean, schema, fstat, partSchema,
          renames).unionByName(dvBranch, allowMissingColumns = true))
    }
    (files.nonEmpty, schema) match {
      case (true, Some(s)) if renames.nonEmpty &&
          files.exists(f => renames.exists(_.carriers(f))) =>
        // RENAMED table with live carrier files: one zero-FS-call scan
        // per physical-name group, each aliased back to the logical
        // schema and unioned — filters and committed stats stay in each
        // group's OWN physical names, so pushdown and pruning survive
        // the rename at full strength (see [[renameGroups]])
        import org.apache.spark.sql.functions.col
        val groups = renameGroups(renames, files)
        groups.map { case (gFiles, subst) =>
          val gSet = gFiles.toSet
          val phys = StructType(s.fields.map(f =>
            subst.get(f.name.toLowerCase)
              .map(p => f.copy(name = p)).getOrElse(f)))
          val df = graft.sources.ManifestScans.scanSnapshot(spark, dir,
            gFiles, phys, fstat.filter(kv => gSet(kv._1)))
          // alias physical → logical; partition columns (attached by the
          // scan from the directory names, never renameable) pass through
          val logicalNames = s.fieldNames.map(_.toLowerCase).toSet
          val extras = df.columns.filterNot(c =>
            logicalNames(c.toLowerCase) ||
              subst.values.exists(_.equalsIgnoreCase(c)))
          df.select(s.fields.map(f =>
            col(subst.getOrElse(f.name.toLowerCase, f.name)).as(f.name))
            ++ extras.map(col): _*)
        }.reduce(_ unionByName _)
      case (true, Some(s)) =>
        graft.sources.ManifestScans.scanSnapshot(spark, dir, files, s, fstat)
      case (true, None) =>
        spark.read.option("mergeSchema", "true")
          .parquet(files.map(f => s"$dir/$f"): _*)
      case (false, Some(s)) =>
        // an EMPTY snapshot of a partitioned table still serves its
        // declared partition columns (appended to the carried data
        // schema, the same order a live scan serves) — a retention
        // delete that drops every partition must not break queries
        // that reference them
        val served = partSchema match {
          case Some(ps) => StructType(s.fields ++ ps.fields)
          case None => s
        }
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), served)
      case (false, None) => spark.emptyDataFrame
    }
  }

  /** Rows ADDED between `fromVersion` (exclusive) and `toVersion`
    * (inclusive): the scan of files listed at `toVersion` but not at
    * `fromVersion`. Data files are immutable and append-only at the
    * manifest layer, so for append-only writers (the streaming manifest
    * sink) this is exact change-data capture per commit range; a
    * full-snapshot rewrite (publish / tracked compaction) re-lists rows
    * under new file names and they reappear as adds — a file-granularity
    * protocol can't tell a moved row from a new one. */
  def addedBetween(
      spark: SparkSession, dir: String,
      fromVersion: Long, toVersion: Long): DataFrame = {
    // the range's SHAPE errors are named, not generic lookup misses: CDC
    // pollers compute (lastSeen, head) and a negative/backwards range is
    // always a caller bug worth a precise message
    require(fromVersion >= 0L,
      s"addedBetween: fromVersion must be >= 0 (v0 = the empty table " +
        s"before the first commit), got $fromVersion")
    require(fromVersion <= toVersion,
      s"addedBetween: backwards range (from v$fromVersion to " +
        s"v$toVersion) — from must be <= to")
    def pruned(v: Long): Nothing = sys.error(
      s"no manifest v$v under $dir (never committed, or retention " +
        "pruned it — DESCRIBE HISTORY lists the surviving versions)")
    // v0 is the EMPTY table before the first commit, so (0, v] is
    // "everything as of v" — the natural CDC bootstrap ask
    val from =
      if (fromVersion == 0L) Set.empty[String]
      else snapAt(spark, dir, fromVersion)
        .getOrElse(pruned(fromVersion)).files.toSet
    val to = snapAt(spark, dir, toVersion).getOrElse(pruned(toVersion))
    val fresh = to.files.filterNot(from)
    // an unchanged (or delete-only) range serves ZERO ROWS UNDER THE
    // SNAPSHOT'S SCHEMA, not a zero-column emptyDataFrame: the common CDC
    // poll `SELECT k FROM graft_table_changes(t, v, v)` must return empty,
    // not fail analysis on an unresolved column
    scanListed(spark, dir, fresh, to.schema, to.fstat, to.partSchema,
      to.renames, to.dvs)
  }

  /** Compute per-file min/max stats for the long/int/timestamp columns
    * `cols` of every head file from parquet FOOTERS — metadata-only, zero
    * data pages (at 100 TB: one small read per file, no scan) — and commit
    * them into the manifest. Timestamp bounds are normalized to unix-micros
    * whatever unit the writer used (millis/micros/nanos), so event-time
    * range pruning works across mixed-writer tables. CAS loop re-reading
    * (head, hwm) per attempt, like [[publish]]. Columns that are not
    * INT32/INT64 or lack footer stats in some block are simply omitted for
    * that file (conservative: the file is then never pruned). Returns the
    * committed version. */
  def analyze(spark: SparkSession, dir: String, cols: Seq[String]): Long = {
    // data files are immutable, so stats computed on a losing CAS attempt
    // stay valid — a retry only reads footers of files NEW to the
    // refreshed head (a concurrent append mid-sweep must not trigger a
    // full re-sweep of a 100k-file table)
    var stats: FileStats = Map.empty
    var sstats: FileStringStats = Map.empty
    var swept = Set.empty[String]
    var attempts = 0
    while (attempts < 64) {
      val (v, files, hwm) = readHead(spark, dir)
        .getOrElse(sys.error(s"analyze: $dir is not manifest-tracked"))
      val fresh = files.filterNot(swept)
      val (fs2, ss2) = fileAllStats(spark, dir, fresh, cols)
      stats ++= fs2
      sstats ++= ss2
      swept ++= fresh
      commitIf(spark, dir, files, v, hwm, stats, sstats) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"manifest analyze lost $attempts races in $dir; giving up")
  }

  /** Bootstrap the manifest-carried schema on a table whose manifests
    * predate the field: ONE merged-footer sweep over the head files,
    * committed with the schema so every later read plans from the
    * manifest alone. Incremental across CAS retries like [[analyze]]
    * (files are immutable — a lost race re-reads only footers NEW to the
    * refreshed head). A file delisted mid-race may leave its columns in
    * the stored schema; extra columns only read as nulls, and the next
    * [[publish]] replaces the schema outright. Returns the committed
    * version. */
  def analyzeSchema(spark: SparkSession, dir: String): Long = {
    var acc: Option[StructType] = None
    var swept = Set.empty[String]
    var attempts = 0
    // bootstrap the per-file (length, mtime) inventory in the same
    // commit: ONE directory listing covers every legacy file, so the
    // table's scan planning goes zero-FS-call along with its schema
    val (fs, p) = fsFor(spark, dir)
    val listed: Map[String, (Long, Long)] =
      fs.listStatus(p).iterator.filter(_.isFile)
        .map(s => s.getPath.getName -> (s.getLen, s.getModificationTime))
        .toMap
    while (attempts < 64) {
      val (v, files, hwm) = readHead(spark, dir)
        .getOrElse(sys.error(s"analyzeSchema: $dir is not manifest-tracked"))
      // a RENAMED table always carries a schema (rename requires one);
      // replacing it with the merged FOOTER union would resurrect the
      // old physical names next to the logical ones — refuse loudly
      // (there is nothing to bootstrap here anyway)
      require(readRenames(spark, dir).isEmpty,
        s"analyzeSchema: $dir has renamed columns whose old physical " +
          "names are still carried by live files; the carried schema is " +
          "authoritative (OPTIMIZE to rewrite carriers first)")
      val fresh = files.filterNot(swept)
      if (fresh.nonEmpty) {
        val s = spark.read.option("mergeSchema", "true")
          .parquet(fresh.map(f => s"$dir/$f"): _*).schema
        acc = Some(acc.fold(s)(SchemaBridge.merge(_, s)))
      }
      swept ++= fresh
      commitIf(spark, dir, files, v, hwm,
        schema = acc, replaceSchema = true,
        fstat = listed.filter(kv => files.contains(kv._1))) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"manifest analyzeSchema lost $attempts races in $dir")
  }

  /** Footer min/max for SPECIFIC files — the [[analyze]] primitive,
    * exposed so a writer can commit stats for files it just wrote (an
    * appended micro-batch is born prunable, no separate analyze pass —
    * see the streaming append sink's `statsCols`). Long/int columns land
    * in the first map, safe string columns in the second; a column's type
    * is discovered from the footer, so callers just list column names. */
  def fileAllStats(spark: SparkSession, dir: String, files: Seq[String],
      cols: Seq[String]): (FileStats, FileStringStats) = {
    val colSet = cols.toSet
    // a footer read is one small metadata RPC, but ONE DRIVER doing 100k of
    // them serially is the analyze bottleneck at scale — fan the reads out
    // to executors past a small threshold (driver traffic stays O(files):
    // the stat maps, not the footers)
    val per: Seq[(String, (Map[String, (Long, Long)], Map[String, (String, String)]))] =
      if (files.size <= 64)
        files.map(f => f -> footerStats(
          spark.sparkContext.hadoopConfiguration, s"$dir/$f", colSet))
      else {
        val confB = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration))
        try {
          val slices = math.min(files.size, 256)
          spark.sparkContext.parallelize(files, slices)
            .map(f => f -> footerStats(confB.value.value, s"$dir/$f", colSet))
            .collect().toSeq
        } finally confB.destroy() // a per-micro-batch caller must not
                                  // accumulate broadcasts until driver GC
      }
    (per.filter(_._2._1.nonEmpty).map { case (f, (l, _)) => f -> l }.toMap,
      per.filter(_._2._2.nonEmpty).map { case (f, (_, s)) => f -> s }.toMap)
  }

  /** Footer min/max per requested column of one parquet file, merged
    * across row groups; a column missing stats in ANY row group is
    * dropped (pruning on it would be unsound). String bounds outside
    * [[SafeStatValue]] are dropped too: ASCII-safe bounds compare
    * identically in parquet's unsigned byte order and Java's string order
    * (and a file containing any non-ASCII value would surface it in the
    * bounds, dropping the stat — conservative, never wrong). */
  private def footerStats(
      conf: org.apache.hadoop.conf.Configuration, file: String,
      cols: Set[String])
      : (Map[String, (Long, Long)], Map[String, (String, String)]) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.column.statistics.{
      BinaryStatistics, IntStatistics, LongStatistics}
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new Path(file), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      val sacc = scala.collection.mutable.Map.empty[String, (String, String)]
      val dropped = scala.collection.mutable.Set.empty[String]
      def safe(s: String): Boolean = SafeStatValue.matches(s)
      for {
        block <- reader.getFooter.getBlocks.asScala
        cc <- block.getColumns.asScala
        name = cc.getPath.toDotString
        if cols(name) && !dropped(name)
      } cc.getStatistics match {
        case s: LongStatistics if s.hasNonNullValue =>
          // TIMESTAMP columns are INT64 + a logical unit annotation;
          // normalize bounds to UNIX-MICROS (floor, matching Spark's own
          // nanos→micros read truncation) so event-time range pruning —
          // the most common 100 TB predicate — compares one canonical
          // unit regardless of which writer produced which file
          val unit = cc.getPrimitiveType.getLogicalTypeAnnotation match {
            case t: org.apache.parquet.schema.LogicalTypeAnnotation
                .TimestampLogicalTypeAnnotation => Some(t.getUnit)
            case _ => None
          }
          import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
          def norm(v: Long): Long = unit match {
            case Some(TimeUnit.MILLIS) => Math.multiplyExact(v, 1000L)
            case Some(TimeUnit.NANOS) => Math.floorDiv(v, 1000L)
            case _ => v // MICROS or plain INT64
          }
          val (lo, hi) = (norm(s.getMin), norm(s.getMax))
          val (plo, phi) = acc.getOrElse(name, (lo, hi))
          acc(name) = (math.min(plo, lo), math.max(phi, hi))
        case s: IntStatistics if s.hasNonNullValue =>
          val (plo, phi) =
            acc.getOrElse(name, (s.getMin.toLong, s.getMax.toLong))
          acc(name) =
            (math.min(plo, s.getMin.toLong), math.max(phi, s.getMax.toLong))
        // BINARY stats are string bounds ONLY for UTF8/String logical
        // type: a DECIMAL or raw-binary column's bytes are ordered by a
        // DIFFERENT comparator, and bytes that happen to decode to safe
        // ASCII would record garbage bounds → unsound pruning
        case s: BinaryStatistics if s.hasNonNullValue &&
            cc.getPrimitiveType.getLogicalTypeAnnotation.isInstanceOf[
              org.apache.parquet.schema.LogicalTypeAnnotation
                .StringLogicalTypeAnnotation] =>
          val lo = new String(s.getMinBytes, StandardCharsets.UTF_8)
          val hi = new String(s.getMaxBytes, StandardCharsets.UTF_8)
          if (safe(lo) && safe(hi)) {
            val (plo, phi) = sacc.getOrElse(name, (lo, hi))
            sacc(name) =
              (if (lo < plo) lo else plo, if (hi > phi) hi else phi)
          } else {
            dropped += name
            sacc.remove(name)
          }
        case _ =>
          dropped += name
          acc.remove(name)
          sacc.remove(name)
      }
      (acc.toMap, sacc.toMap)
    } finally reader.close()
  }

  /** Head files that might hold rows with `column` in `[lo, hi]`: a file
    * whose committed (min, max) misses the range is skipped; a file
    * without stats for `column` is kept (conservative). */
  def prunedFiles(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): Seq[String] =
    prunedFilesAll(spark, dir, Seq((column, lo, hi)))

  private val EmptySnap = Snap(Seq.empty, None, None, Map.empty, Map.empty,
    Map.empty, Map.empty, None, None, 0L)

  /** One head resolution: version 0 + an empty snapshot for untracked
    * dirs — a pruned read must not list/open `_manifest/` several times
    * per call, and files/stats must come from the SAME version. */
  private def headSnapshot(spark: SparkSession, dir: String)
      : (Long, Snap) =
    headSnap(spark, dir).getOrElse((0L, EmptySnap))

  /** Victim/maintenance scan over listed data files (ABSOLUTE paths).
    *
    * Every rewrite used to read with `mergeSchema=true`, which runs a
    * merged-footer schema-inference pass over every candidate file before
    * reading a single row — ~200–300 ms of driver+job time per DML
    * statement that is pure overhead whenever the footers cannot be
    * heterogeneous in the first place. When the manifest carries a
    * declared schema and NOTHING can make the footers diverge from it —
    * no live renames (old physical spellings), no drop tombstones
    * (undeclared leftover columns), flat layout (no name-carried
    * partition values to re-derive) — the scan passes the declared
    * schema explicitly instead: by-name matching nulls columns a file
    * predates (what `withDeclared` adds anyway), ignores extras (what
    * `projectToDeclared` drops anyway), and Spark 4's parquet readers
    * upcast narrower physical types into a widened declared type
    * (SPARK-40876), so post-`widenColumnType` files read correctly —
    * `TypeWidenSpec` pins that interop. Any rename/drop/partition
    * complexity, and any table without a carried schema, keeps the
    * merged-footer read. */
  private[ops] def rewriteScanPaths(spark: SparkSession, dir: String,
      paths: Seq[String], snap: Option[Snap],
      partCols: Seq[String]): DataFrame = {
    val plain = partCols.isEmpty && snap.exists(s =>
      s.schema.isDefined && s.renames.isEmpty && s.dropped.isEmpty)
    if (plain)
      spark.read.schema(snap.get.schema.get).parquet(paths: _*)
    else {
      val r = spark.read.option("mergeSchema", "true")
      (if (partCols.isEmpty) r else r.option("basePath", dir))
        .parquet(paths: _*)
    }
  }

  /** [[rewriteScanPaths]] over manifest-RELATIVE file names. */
  private[ops] def rewriteScan(spark: SparkSession, dir: String,
      names: Seq[String], snap: Option[Snap],
      partCols: Seq[String]): DataFrame =
    rewriteScanPaths(spark, dir, names.map(f => s"$dir/$f"), snap, partCols)

  /** Head snapshot for [[rewriteScanPaths]] callers outside this object
    * (compaction) that don't already hold one. */
  private[ops] def headSnapOpt(spark: SparkSession, dir: String): Option[Snap] =
    headSnap(spark, dir).map(_._2)

  /** Same, with the head VERSION — one consistent read for CAS callers. */
  private[ops] def headSnapVersioned(spark: SparkSession,
      dir: String): Option[(Long, Snap)] = headSnap(spark, dir)

  /** The copy-on-write rewrites read victim FILES directly and write
    * replacements at the table root — on a hive-partitioned layout that
    * would silently strip the name-carried partition values from every
    * rewritten row (the column lives in the directory name, not the
    * footer). Loud refusal instead; partitioned tables are read/append
    * surfaces through this protocol, and a partition-aware rewrite goes
    * through [[publish]] (which re-derives a flat layout carrying the
    * column as data). */
  private[graft] def requireFlatLayout(files: Seq[String], op: String): Unit =
    require(!files.exists(_.contains("/")),
      s"$op: this table is hive-partitioned (manifest names carry " +
        "directory segments); file-granular rewrites would strip the " +
        "name-carried partition values — materialize the partition " +
        "column as data via publish() first")

  /** Ordered partition-column chain of one nested manifest name (the `k`
    * keys of its `k=v` segments, top-down); empty for flat names. */
  private[graft] def partitionChainOf(name: String): Seq[String] =
    name.split('/').dropRight(1).toSeq.map(_.split("=", 2)(0).toLowerCase)

  /** The table's partition columns, ordered: from the head's nested
    * names, else the DECLARED partition schema (an emptied partitioned
    * table keeps its layout), else empty (flat/untracked). This is what
    * the write paths consult to decide whether an append must be laid
    * out `k=v/`-nested. */
  private[graft] def layoutPartitionCols(spark: SparkSession,
      dir: String): Seq[String] =
    headSnap(spark, dir) match {
      case None => Seq.empty
      case Some((_, snap)) =>
        val files = snap.files
        files.find(_.contains("/")).map(partitionChainOf)
          // the declared schema only speaks when NO file is left to read
          // the layout from — live names always win (they're what a scan
          // actually serves)
          .orElse(if (files.isEmpty)
            snap.partSchema.map(_.fieldNames.toSeq.map(_.toLowerCase))
          else None)
          .getOrElse(Seq.empty)
    }

  /** Every ADD-files commit must match the head's layout: flat files into
    * a flat table, `k=v`-nested files carrying the SAME ordered column
    * chain into a partitioned one — a mixed listing would make partition
    * inference see conflicting directory structures, and flat rows landed
    * in a partitioned table would silently read NULL partition values.
    * Checked INSIDE every CAS loop so a racing layout change (partitioned
    * publish, restore to a flat version) can never slip past a stale
    * check. */
  private[graft] def requireLayoutMatch(prev: Seq[String],
      names: Seq[String], op: String): Unit = {
    val headChain = prev.find(_.contains("/")).map(partitionChainOf)
    val newChains = names.map(partitionChainOf).distinct
    require(newChains.size <= 1,
      s"$op: added files mix partition layouts (${newChains.mkString("; ")})")
    (headChain, newChains.headOption) match {
      case (Some(chain), Some(added)) if names.nonEmpty =>
        require(added == chain,
          s"$op: added files must carry the table's partition chain " +
            s"${chain.mkString("/")}, got ${
              if (added.isEmpty) "flat files" else added.mkString("/")}")
      case (None, Some(added)) if prev.nonEmpty =>
        require(added.isEmpty,
          s"$op: cannot add hive-partitioned files " +
            s"(${added.mkString("/")}) to a flat table")
      case _ => () // empty table, or nothing added: any one layout is fine
    }
  }

  /** Partition-SEGMENT candidate pruning for the copy-on-write rewrites:
    * when the predicate column is carried in a file's `k=v` name, the
    * value is constant for every row of the file, so a segment that
    * cannot satisfy `test` prunes the file exactly. Files where the
    * column is NOT a name segment (a data column, or a flat table) are
    * kept; a NULL segment (hive default-partition marker) never matches
    * an eq/range predicate and prunes. Exactness always comes from the
    * row filter downstream — this only decides which files are worth
    * rewriting, the partition twin of [[filterByRanges]]. */
  private def segmentAdmits(name: String, column: String)(
      test: String => Boolean): Boolean =
    partitionSegmentValue(name, column) match {
      case None => true // not name-carried: stay a candidate
      case Some(null) => false // NULL never satisfies eq/range
      case Some(v) => test(v)
    }

  private def filterBySegmentRanges(files: Seq[String],
      ranges: Seq[(String, Long, Long)]): Seq[String] =
    files.filter(f => ranges.forall { case (c, lo, hi) =>
      // unparseable segment values stay candidates (conservative)
      segmentAdmits(f, c)(v =>
        partitionSegmentUnits(v).forall(u => lo <= u && u <= hi))
    })

  /** A stat/sstat/bloom map with each CARRIER file's entries for a
    * renamed column's old physical name re-exposed under the requested
    * logical spelling — so pruning predicates (always logical
    * post-rename) keep their full power over pre-rename files instead
    * of conservatively admitting them. Sound, not just conservative:
    * the physical column's committed stats ARE the logical column's
    * values for that file. Lazily applied — a no-op unless one of
    * `cols` is actually a rename target — and chain-correct: a file's
    * physical name is the `from` of the FIRST entry whose carriers
    * contain it (the [[renameGroups]] rule). */
  private def renameAware[A](m: Map[String, Map[String, A]],
      renames: Seq[Rename], cols: Seq[String]): Map[String, Map[String, A]] = {
    val relevant = cols.distinct.flatMap { c =>
      val es = renames.filter(_.to.equalsIgnoreCase(c))
      if (es.isEmpty) None else Some(c -> es)
    }
    if (relevant.isEmpty) m
    else m.map { case (f, colMap) =>
      f -> relevant.foldLeft(colMap) { case (cm, (c, es)) =>
        es.find(_.carriers(f)) match {
          // a CARRIER resolves strictly through its entry's physical
          // name: a same-named committed stat on a carrier can only be
          // a dropped column's stale leftover (renameColumn rejects
          // reusing a carried name, but pre-guard tables exist) — never
          // let it shadow the mapping; absent `from` stats means the
          // file is simply unprunable on this column (conservative)
          case Some(e) => cm.get(e.from) match {
            case Some(v) => cm + (c -> v)
            case None => cm - c
          }
          case None => cm
        }
      }
    }
  }

  private def filterByRanges(files: Seq[String], stats: FileStats,
      ranges: Seq[(String, Long, Long)]): Seq[String] =
    files.filter { f =>
      ranges.forall { case (column, lo, hi) =>
        stats.get(f).flatMap(_.get(column)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None => true
        }
      }
    }

  /** AND of several column ranges: a file survives only if EVERY range can
    * intersect its stats. With a Z-ordered layout ([[Layout]] / q65) files
    * carry tight min/max on BOTH interleaved dimensions, so a 2-D range
    * predicate prunes multiplicatively — the manifest-level twin of the
    * row-group pruning the Z-order scaladoc promises. */
  def prunedFilesAll(spark: SparkSession, dir: String,
      ranges: Seq[(String, Long, Long)]): Seq[String] = {
    val (_, snap) = headSnapshot(spark, dir)
    filterByRanges(snap.files,
      renameAware(snap.stats, snap.renames, ranges.map(_._1)), ranges)
  }

  /** Range scan with manifest data skipping: open ONLY the files whose
    * committed stats can intersect every `[lo, hi]`, then apply the exact
    * predicates. Semantically identical to
    * `readTable(...).where(AND of col between lo and hi)`; at scale it
    * reads the matching files instead of listing-and-opening all of
    * them.
    *
    * TIMESTAMP columns: bounds are UNIX-MICROS (the unit [[analyze]]
    * normalizes footer stats to) and the exact predicate compares
    * `unix_micros(col)` — so a day-sliced event-time read takes epoch
    * micros like every other long range. TIMESTAMP_NTZ compares through a
    * session-zone cast; our sessions pin UTC, where NTZ micros and stored
    * micros coincide. */
  def readTableRanges(spark: SparkSession, dir: String,
      ranges: Seq[(String, Long, Long)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, unix_micros}
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val files = prunedFilesAll(spark, dir, ranges)
    def predOn(df: DataFrame): org.apache.spark.sql.Column = ranges
      .map { case (c, lo, hi) =>
        val v = df.schema.find(_.name == c).map(_.dataType) match {
          case Some(TimestampType) => unix_micros(col(c))
          case Some(TimestampNTZType) => unix_micros(col(c).cast(TimestampType))
          case _ => col(c)
        }
        v >= lo && v <= hi
      }
      .reduceOption(_ && _).getOrElse(lit(true))
    // zero candidates: empty result, but with the table's full merged
    // schema (one metadata-only pass — the price of schema fidelity)
    if (files.isEmpty) return readTable(spark, dir).filter(lit(false))
    // RENAMED table: the pruned subset may include pre-rename files whose
    // predicate column lives under its old physical name — scan through
    // the rename-aware grouped path (file pruning above stays sound:
    // carrier files have no stats under the logical name, so they are
    // conservative survivors)
    locally {
      val (_, snap) = headSnapshot(spark, dir)
      if (snap.renames.nonEmpty || snap.dvs.nonEmpty) {
        val g = scanListed(spark, dir, files, snap.schema, snap.fstat,
          snap.partSchema, snap.renames, snap.dvs)
        return g.filter(predOn(g))
      }
    }
    val df = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
    // schema-evolution edge: every file CARRYING a predicate column can be
    // pruned while older-schema files (no stats → conservative survivors)
    // lack the column entirely — filtering would then fail analysis. Those
    // rows have the column null under the merged schema, i.e. no row can
    // match; fall back to the full merged read for identical semantics.
    if (ranges.exists { case (c, _, _) => !df.columns.contains(c) }) {
      val full = readTable(spark, dir)
      full.filter(predOn(full))
    } else df.filter(predOn(df))
  }

  /** Single-column [[readTableRanges]]. */
  def readTableRange(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): DataFrame =
    readTableRanges(spark, dir, Seq((column, lo, hi)))

  /** Build per-file blooms over long column `column` for every head file
    * and commit them (CAS, hwm preserved) — POINT-lookup skipping for id
    * columns whose min/max prune nothing. One distributed pass: each
    * file's k bit positions reduce to [[BloomBits]]/64 bit_or words per
    * file IN the cluster; the driver receives files × 128 longs, never
    * row data. Returns the committed version. */
  def analyzeBloom(spark: SparkSession, dir: String, keyCol: String): Long = {
    import org.apache.spark.sql.functions._
    var attempts = 0
    var cache = Map.empty[String, String]
    var swept = Set.empty[String]
    while (attempts < 64) {
      val (v, files, hwm) = readHead(spark, dir)
        .getOrElse(sys.error(s"analyzeBloom: $dir is not manifest-tracked"))
      val fresh = files.filterNot(swept)
      val freshDf =
        if (fresh.isEmpty) None
        else Some(spark.read.option("mergeSchema", "true")
          .parquet(fresh.map(f => s"$dir/$f"): _*))
      // schema-evolution edge, same posture as analyze(): files without
      // the column get no bloom and stay conservative candidates — a
      // maintenance job must degrade, not crash mid-sweep
      freshDf.filter(_.columns.contains(keyCol)).foreach { df =>
        val pos = (0 until BloomHashes).map(i =>
          pmod(hash(col("__v"), lit(i)), lit(BloomBits)).cast("int"))
        val words = df
          .select(input_file_name().as("__f"),
            col(keyCol).cast("long").as("__v"))
          .where(col("__v").isNotNull)
          .select(col("__f"), explode(array(pos: _*)).as("__p"))
          .groupBy(col("__f"), (col("__p") / 64).cast("int").as("__w"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), __p % 64))")
            .as("__bits"))
          .collect()
        val perFile = words.groupBy(r =>
          r.getString(0).split('/').last)
        cache ++= perFile.map { case (f, rows) =>
          val arr = Array.fill(BloomBits / 64)(0L)
          rows.foreach(r => arr(r.getInt(1)) |= r.getLong(2))
          f -> arr.map(w => f"$w%016x").mkString
        }
      }
      swept ++= fresh
      val bloom = files.flatMap(f => cache.get(f).map(h =>
        f -> Map(keyCol -> h))).toMap
      commitIf(spark, dir, files, v, hwm, bloom = bloom) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"manifest analyzeBloom lost $attempts races in $dir")
  }

  /** Driver-side twin of the Spark-side `hash(v, i)` used by
    * [[analyzeBloom]]: catalyst's multi-arg Murmur3 folds the seed —
    * hashLong(v, 42) then hashInt(i, ·). Divergence here would cause
    * FALSE NEGATIVES (wrongly pruned files); the spec pins parity by
    * asserting zero false negatives over a large key set. */
  private def bloomPositions(value: Long): Seq[Int] =
    (0 until BloomHashes).map { i =>
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(
        i, org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(value, 42))
      ((h % BloomBits) + BloomBits) % BloomBits
    }

  private def bloomMightContain(hex: String, value: Long): Boolean = {
    if (hex.length != BloomBits / 4) return true // malformed → conservative
    bloomPositions(value).forall { p =>
      val word = java.lang.Long.parseUnsignedLong(
        hex.substring((p / 64) * 16, (p / 64) * 16 + 16), 16)
      (word & (1L << (p % 64))) != 0L
    }
  }

  /** Head files that might contain a row with `column` equal to ANY of
    * `values`: a file is kept only when some SINGLE value passes both its
    * bloom ([[analyzeBloom]]) and its min/max range ([[analyze]]) — the
    * per-value conjunction matters, or a bloom false positive on an
    * out-of-range value could pair with a different in-range value and
    * admit a file neither test would pass alone. Files missing a stat
    * pass that test vacuously (conservative). */
  def prunedFilesEq(spark: SparkSession, dir: String, column: String,
      values: Seq[Long]): Seq[String] = {
    val (_, snap) = headSnapshot(spark, dir)
    filterByPointValues(snap.files,
      renameAware(snap.bloom, snap.renames, Seq(column)),
      renameAware(snap.stats, snap.renames, Seq(column)),
      column, values)
  }

  private def filterByPointValues(files: Seq[String], bloom: FileBloom,
      stats: FileStats, column: String, values: Seq[Long]): Seq[String] =
    files.filter { f =>
      val hex = bloom.get(f).flatMap(_.get(column))
      val range = stats.get(f).flatMap(_.get(column))
      values.exists { v =>
        hex.forall(h => bloomMightContain(h, v)) &&
          range.forall { case (mn, mx) => mn <= v && v <= mx }
      }
    }

  private def filterByStringValues(files: Seq[String],
      sstats: FileStringStats, column: String,
      values: Seq[String]): Seq[String] =
    files.filter { f =>
      sstats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx)) => values.exists(v => mn <= v && v <= mx)
        case None => true
      }
    }

  /** Point lookup with bloom skipping: open ONLY the files whose bloom
    * can contain one of `values`, then apply the exact predicate —
    * semantically identical to `readTable(...).where(column isin values)`
    * for long keys. The everyday "fetch these doc_ids" access: at 100 TB
    * the lookup opens a handful of files instead of the table. */
  def readTableWhereEq(spark: SparkSession, dir: String, column: String,
      values: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val files = prunedFilesEq(spark, dir, column, values)
    if (files.isEmpty) return readTable(spark, dir).filter(lit(false))
    // RENAMED table: scan the pruned subset through the grouped path
    // (carrier files have no bloom/stats under the logical name — they
    // survive the pruning above, and the grouped scan serves their
    // renamed column correctly)
    locally {
      val (_, snap) = headSnapshot(spark, dir)
      if (snap.renames.nonEmpty || snap.dvs.nonEmpty)
        return scanListed(spark, dir, files, snap.schema, snap.fstat,
          snap.partSchema, snap.renames, snap.dvs)
          .filter(col(column).isin(values: _*))
    }
    val df = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
    if (!df.columns.contains(column))
      readTable(spark, dir).filter(col(column).isin(values: _*))
    else df.filter(col(column).isin(values: _*))
  }

  /** Head files that might hold rows whose string `column` is one of
    * `values` — the "read only source=X" slice of a curation table. A
    * file is kept when any sought value falls inside its committed
    * [min, max] (or when it has no stats for the column). */
  def prunedFilesIn(spark: SparkSession, dir: String, column: String,
      values: Seq[String]): Seq[String] = {
    val (_, snap) = headSnapshot(spark, dir)
    filterByStringValues(snap.files,
      renameAware(snap.sstats, snap.renames, Seq(column)), column, values)
  }

  /** Category scan with manifest data skipping: open ONLY the files whose
    * committed string stats can contain one of `values`, then apply the
    * exact `isin` predicate — semantically identical to
    * `readTable(...).where(column isin values)`. */
  def readTableWhereIn(spark: SparkSession, dir: String, column: String,
      values: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val files = prunedFilesIn(spark, dir, column, values)
    if (files.isEmpty) return readTable(spark, dir).filter(lit(false))
    // same rename-aware subset scan as readTableWhereEq
    locally {
      val (_, snap) = headSnapshot(spark, dir)
      if (snap.renames.nonEmpty || snap.dvs.nonEmpty)
        return scanListed(spark, dir, files, snap.schema, snap.fstat,
          snap.partSchema, snap.renames, snap.dvs)
          .filter(col(column).isin(values: _*))
    }
    val df = spark.read.option("mergeSchema", "true")
      .parquet(files.map(f => s"$dir/$f"): _*)
    // same schema-evolution fallback as readTableRanges
    if (!df.columns.contains(column))
      readTable(spark, dir).filter(col(column).isin(values: _*))
    else df.filter(col(column).isin(values: _*))
  }

  /** Z-order OPTIMIZE for a tracked table — the Delta/Iceberg
    * `OPTIMIZE ... ZORDER BY (a, b)` shape: rewrite the head snapshot
    * clustered on the morton key of `(a, b)` ([[Layout.mortonKey]] — each
    * output file covers a small rectangle in (a, b) space) and splice it
    * in via the same victim-set CAS as [[optimizeZOrderRange]] (with every
    * head file a victim), committing the new files' footer stats in the
    * same version. NOT a snapshot-replace: a streaming append landing
    * mid-rewrite keeps its file AND its replay protection — a publish
    * would silently erase the rows while carrying the hwm forward,
    * suppressing the checkpoint replay. Readers on the old head stay
    * whole; run [[vacuum]] after a grace period. */
  def optimizeZOrder(spark: SparkSession, dir: String, a: String, b: String,
      numFiles: Int): Long =
    optimizeZOrderRange(spark, dir, Seq(a, b), Seq.empty, numFiles)

  def optimizeZOrderRange(spark: SparkSession, dir: String, a: String,
      b: String, ranges: Seq[(String, Long, Long)], numFiles: Int): Long =
    optimizeZOrderRange(spark, dir, Seq(a, b), ranges, numFiles)

  /** Bounded-scope z-order OPTIMIZE: rewrite ONLY the head files whose
    * stats can intersect `ranges` (plus unanalyzed files — they MIGHT),
    * splice the clustered replacements into the file list, and commit via
    * CAS so concurrent appends are never lost. At 100 TB this is the op
    * you actually run — re-cluster the fragmented recent region, leave
    * the petabytes of already-clustered history byte-identical. The new
    * files carry their (a, b) footer stats in the same commit (born
    * prunable). Aborts (and removes its moved files) if a concurrent
    * full rewrite made the victim set disappear. Returns the committed
    * version, or the current head when nothing intersects. */
  def optimizeZOrderRange(spark: SparkSession, dir: String,
      cols: Seq[String], ranges: Seq[(String, Long, Long)],
      numFiles: Int): Long =
    // maintenance is idempotent: a lost logical conflict (another
    // rewrite respelled a victim, or a dv landed on one) re-plans from
    // the fresh head instead of bouncing to the operator
    withMaintenanceRetry(spark) {
      optimizeZOrderRangeOnce(spark, dir, cols, ranges, numFiles)
    }

  private def optimizeZOrderRangeOnce(spark: SparkSession, dir: String,
      cols: Seq[String], ranges: Seq[(String, Long, Long)],
      numFiles: Int): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    // ONE snapshot read: the victims and the early-return version must
    // come from the same head
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L) sys.error(s"optimizeZOrderRange: $dir is not tracked")
    requireFlatLayout(headFiles, "optimizeZOrderRange")
    val victims = filterByRanges(headFiles,
      renameAware(headS.stats, headS.renames, ranges.map(_._1)), ranges)
    if (victims.isEmpty) return headV
    // projected to the declared schema: an undeclared (dropped) footer
    // column must not ride the re-cluster back into the carried schema
    val clustered = Layout.clusterByMorton(
      projectToDeclared(
        coalesceRenamed(
          dropDeleted(spark, dir,
            spark.read.option("mergeSchema", "true")
              .parquet(victims.map(f => s"$dir/$f"): _*),
            victims, headS.dvs),
          headS.renames),
        headS.schema, Seq.empty),
      cols, numFiles)
    val moved = writeAndMoveIn(clustered, "zopt", dir)
    val (mstats, msstats) = fileAllStats(spark, dir, moved, cols)
    spliceCommit(spark, dir, victims, moved, mstats, msstats,
      "optimizeZOrderRange", schema = Some(clustered.schema),
      dvAtRead = headS.dvs)
  }

  /** Z-order OPTIMIZE of ONE leaf partition of a hive-partitioned table
    * — the per-leaf form whole-table `OPTIMIZE … ZORDER BY` iterates
    * (and `OPTIMIZE t PARTITION (k=v) ZORDER BY (a, b)` runs directly):
    * exactly that leaf's files are read (no basePath — the partition
    * value is constant, the interleave columns are data), Morton-
    * clustered on `(a, b)`, written back UNDER the leaf directory, and
    * victim-splice-committed with fresh (a, b) stats so the clustered
    * region is born prunable. Every other leaf stays byte-identical;
    * the leaf-spec discipline is compactPartition's (prefix specs of
    * deeper layouts are loud — a one-level-up rewrite would strip the
    * deeper name-carried values). Returns the committed version. */
  def optimizeZOrderPartition(spark: SparkSession, dir: String,
      partition: String, a: String, b: String, numFiles: Int): Long =
    optimizeZOrderPartition(spark, dir, partition, Seq(a, b), numFiles)

  def optimizeZOrderPartition(spark: SparkSession, dir: String,
      partition: String, cols: Seq[String], numFiles: Int): Long =
    withMaintenanceRetry(spark) {
      optimizeZOrderPartitionOnce(spark, dir, partition, cols, numFiles)
    }

  private def optimizeZOrderPartitionOnce(spark: SparkSession,
      dir: String, partition: String, cols: Seq[String],
      numFiles: Int): Long = {
    require(numFiles >= 1, s"numFiles must be >= 1: $numFiles")
    val prefix = partition.stripSuffix("/") + "/"
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L)
      sys.error(s"optimizeZOrderPartition: $dir is not tracked")
    require(headFiles.exists(_.contains("/")),
      s"optimizeZOrderPartition: $dir is not hive-partitioned; use " +
        "optimizeZOrderRange")
    val partCols = partitionColsIn(headFiles)
    cols.foreach(c => require(!partCols.exists(_.equalsIgnoreCase(c)),
      s"optimizeZOrderPartition: `$c` is a partition column — its value " +
        "is constant within the leaf; interleave data columns"))
    val victims = headFiles.filter(_.startsWith(prefix))
    require(victims.nonEmpty,
      s"optimizeZOrderPartition: no files under partition " +
        s"'$partition' in $dir")
    val deeper = victims.filter(_.stripPrefix(prefix).contains("/"))
    require(deeper.isEmpty,
      s"optimizeZOrderPartition: '$partition' is not a leaf partition " +
        s"(deeper levels exist, e.g. ${deeper.head})")
    val clustered = Layout.clusterByMorton(
      projectToDeclared(
        coalesceRenamed(
          dropDeleted(spark, dir,
            spark.read.option("mergeSchema", "true")
              .parquet(victims.map(f => s"$dir/$f"): _*),
            victims, headS.dvs),
          headS.renames),
        headS.schema, Seq.empty),
      cols, numFiles)
    val moved = writeAndMoveIn(clustered, "zopt", dir, rel = prefix)
    val (mstats, msstats) = fileAllStats(spark, dir, moved, cols)
    spliceCommit(spark, dir, victims, moved, mstats, msstats,
      "optimizeZOrderPartition", schema = Some(clustered.schema),
      dvAtRead = headS.dvs)
  }

  /** Test-only injection point: runs once before the FIRST commit
    * attempt of every victim-splice / dv rewrite — the race window
    * between reading the victims and committing their replacement.
    * Specs land a concurrent committer here to pin the guards below. */
  private[graft] var rewritePreCommitHook: () => Unit = () => ()

  /** Test-only injection point: runs between [[history]]'s listing and
    * its body walk — the window where a racing vacuum can prune a
    * listed version. */
  private[graft] var historyListedHook: () => Unit = () => ()

  /** A rewrite lost a LOGICAL conflict: a victim file vanished (another
    * rewrite respelled it) or a victim's deletion-vector entry was
    * re-pointed (a concurrent dv commit) — the statement's outputs were
    * built from a dead snapshot, have been cleaned up, and re-running
    * re-plans from the fresh head. Typed so idempotent MAINTENANCE ops
    * (z-order OPTIMIZE) can auto-retry it, while user CoW DML surfaces
    * it loudly (a second full rewrite is paid only with the user in the
    * loop). */
  final class ConflictAbortException(msg: String)
    extends RuntimeException(msg)

  /** Bounded auto-retry for idempotent maintenance rewrites: each run
    * re-plans from the fresh head, so a lost logical conflict converges
    * by just re-running. Bounded by
    * `spark.graft.maintenance.conflictRetries` (default 3); the last
    * failure rethrows. Compaction needs no wrapper — its full-pass CAS
    * already re-plans on ANY head movement. */
  private def withMaintenanceRetry[A](spark: SparkSession)(body: => A): A = {
    val max = spark.conf
      .getOption("spark.graft.maintenance.conflictRetries")
      .flatMap(_.trim.toIntOption).getOrElse(3)
    var attempt = 0
    while (true) {
      try return body
      catch {
        case _: ConflictAbortException if attempt < max => attempt += 1
      }
    }
    sys.error("unreachable")
  }

  /** The victim-set CAS splice every bounded rewrite ends with: replace
    * exactly `victims` in the head file list with `moved`, preserving the
    * hwm (re-read TOGETHER with the head per attempt) and any concurrent
    * appender's files. Aborts — deleting `moved` — when a concurrent full
    * rewrite (publish / compaction) already replaced a victim: the rewrite
    * was of a dead snapshot and splicing it would resurrect deleted rows
    * or drop the winner's.
    *
    * `dvAtRead` = the victims' deletion-vector entries AS THE REWRITE
    * READ THEM (what the caller's [[dropDeleted]] applied). Victims
    * merely staying LISTED is not enough: a concurrent dv DELETE keeps
    * the victim listed but adds positions the rewrite's output never
    * dropped — splicing would resurrect the winner's deleted rows. Each
    * attempt re-resolves the head's dv entries for the victims and
    * aborts loudly on ANY drift (grown, replaced, or vanished entry). */
  private def spliceCommit(spark: SparkSession, dir: String,
      victims: Seq[String], moved: Seq[String], mstats: FileStats,
      msstats: FileStringStats, opName: String,
      schema: Option[StructType] = None,
      dvAtRead: Map[String, (String, Long)] = Map.empty): Long = {
    val (fs, p) = fsFor(spark, dir)
    val victimSet = victims.toSet
    val dvExpected = dvAtRead.filter(kv => victimSet(kv._1))
    var attempts = 0
    while (attempts < 64) {
      if (attempts == 0) rewritePreCommitHook()
      val (v, snapNow) = headSnap(spark, dir).getOrElse(
        sys.error(s"$opName: manifest vanished under $dir"))
      val files = snapNow.files
      val hwm = snapNow.hwm
      if (!victimSet.subsetOf(files.toSet)) {
        moved.foreach(f => fs.delete(new Path(p, f), false))
        throw new ConflictAbortException(s"$opName: victim files " +
          s"disappeared under $dir (concurrent rewrite); re-run " +
          "against the new head")
      }
      if (snapNow.dvs.filter(kv => victimSet(kv._1)) != dvExpected) {
        moved.foreach(f => fs.delete(new Path(p, f), false))
        throw new ConflictAbortException(s"$opName: a concurrent " +
          s"commit changed a victim's deletion vector under $dir (the " +
          "rewrite was built from stale deletions and would resurrect " +
          "the winner's deleted rows); re-run against the new head")
      }
      // a racing layout change (partitioned publish / restore) with the
      // victims still listed would otherwise blend two layouts — loud
      requireLayoutMatch(files.filterNot(victimSet), moved, opName)
      val next = files.filterNot(victimSet) ++ moved
      // every splice caller KNOWS the schema it wrote `moved` with —
      // declaring it skips commitIf's per-attempt delta footer inference
      commitIf(spark, dir, next, v, hwm, mstats, msstats,
        schema = schema) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"$opName lost $attempts races in $dir; giving up")
  }

  /** Targeted ERASE of every row whose long `column` equals any of
    * `values` — the right-to-be-forgotten primitive. Only the head files
    * whose committed metadata CAN hold a target key are rewritten: a file
    * is a victim when some single value passes BOTH its bloom
    * ([[analyzeBloom]]) and its min/max range ([[analyze]]) — the
    * [[prunedFilesEq]] conjunction (stats missing → conservatively
    * admitted). At 100 TB with blooms
    * committed, erasing one user rewrites a handful of files and never
    * lists, opens, or shuffles the rest of the table.
    *
    * Rows with a NULL key are never erased (`NULL = v` matches nothing,
    * the SQL `DELETE WHERE column IN (...)` contract). The splice commit
    * preserves a concurrent appender's files and the streaming hwm.
    * Rewritten files carry fresh min/max for `column` in the same commit;
    * their blooms are absent until the next [[analyzeBloom]] sweep
    * (conservative — they're re-read, never wrongly skipped).
    *
    * The erase is LOGICAL at commit time: prior versions still list the
    * old files, so time travel sees the erased rows until
    * [[vacuum]]`(grace, retainManifests)` reclaims the delisted files and
    * prunes the manifests that list them — run both to complete a
    * physical purge. Returns the committed version (the unchanged head
    * when no file can contain any key). */
  def eraseWhereEq(spark: SparkSession, dir: String, column: String,
      values: Seq[Long]): Long = {
    import org.apache.spark.sql.functions.col
    require(values.nonEmpty, "eraseWhereEq: empty key set")
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L) sys.error(s"eraseWhereEq: $dir is not manifest-tracked")
    // partitioned layouts: a key carried in the k=v names prunes exactly
    // (constant per file); data-column keys keep the bloom/range pruning
    val victims = filterByPointValues(headFiles,
      renameAware(headS.bloom, headS.renames, Seq(column)),
      renameAware(headS.stats, headS.renames, Seq(column)), column, values)
      .filter(f => segmentAdmits(f, column)(v =>
        partitionSegmentUnits(v).forall(values.contains)))
    if (dvEnabled(spark))
      return dvRewrite(spark, dir, headV, headS, victims,
        df => if (!df.columns.contains(column))
          org.apache.spark.sql.functions.lit(false)
        else col(column).isin(values: _*),
        updated = None, statCols = Seq(column),
        opName = "eraseWhereEq", partCols = partitionColsIn(headFiles))
    eraseRewrite(spark, dir, headV, victims, column,
      df => df.filter(col(column).isNull || !col(column).isin(values: _*)),
      "eraseWhereEq", partCols = partitionColsIn(headFiles))
  }

  /** [[eraseWhereEq]] for STRING keys (erase by source, license tag,
    * opted-out domain): victims are pruned by committed string min/max
    * ([[analyze]] discovers column types from the footer). */
  def eraseWhereIn(spark: SparkSession, dir: String, column: String,
      values: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    require(values.nonEmpty, "eraseWhereIn: empty key set")
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L) sys.error(s"eraseWhereIn: $dir is not manifest-tracked")
    val victims = filterByStringValues(headFiles,
      renameAware(headS.sstats, headS.renames, Seq(column)), column, values)
      .filter(f => segmentAdmits(f, column)(values.contains))
    if (dvEnabled(spark))
      return dvRewrite(spark, dir, headV, headS, victims,
        df => if (!df.columns.contains(column))
          org.apache.spark.sql.functions.lit(false)
        else col(column).isin(values: _*),
        updated = None, statCols = Seq(column),
        opName = "eraseWhereIn", partCols = partitionColsIn(headFiles))
    eraseRewrite(spark, dir, headV, victims, column,
      df => df.filter(col(column).isNull || !col(column).isin(values: _*)),
      "eraseWhereIn", partCols = partitionColsIn(headFiles))
  }

  /** Targeted ERASE of every row whose `column` falls in `[lo, hi]`
    * (inclusive) — the RETENTION primitive (`DELETE WHERE ts < cutoff`):
    * only head files whose committed min/max range CAN intersect the
    * bound are rewritten (stats missing → conservatively admitted), so
    * expiring the oldest slice of a 100 TB event table rewrites the
    * handful of files holding it and never lists, opens, or shuffles the
    * rest.
    *
    * Bounds are in the column's STAT units — the same canonical units
    * [[analyze]] commits: unix-MICROS for `TimestampType` (whatever unit
    * the writers used), epoch-DAYS for `DateType`, the raw value for
    * integral types — and the rewrite compares in those units
    * (`unix_micros`/`unix_date`), so pruning and the row filter can never
    * disagree. NULL keys are never erased (SQL comparison semantics:
    * `NULL < cutoff` is not true). Same splice-commit guarantees and
    * logical-until-vacuum purge contract as [[eraseWhereEq]]. */
  def eraseWhereRange(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long): Long = {
    import org.apache.spark.sql.functions.{col, lit, unix_date, unix_micros}
    import org.apache.spark.sql.types.{DateType, TimestampType}
    require(lo <= hi, s"eraseWhereRange: empty range [$lo, $hi]")
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L)
      sys.error(s"eraseWhereRange: $dir is not manifest-tracked")
    val victims = filterBySegmentRanges(
      filterByRanges(headFiles,
        renameAware(headS.stats, headS.renames, Seq(column)),
        Seq((column, lo, hi))),
      Seq((column, lo, hi)))
    def units(df: DataFrame) = {
      val c = col(column)
      df.schema(column).dataType match {
        case TimestampType => unix_micros(c)
        case DateType => unix_date(c).cast("long")
        case _ => c
      }
    }
    if (dvEnabled(spark))
      return dvRewrite(spark, dir, headV, headS, victims,
        df => if (!df.columns.contains(column)) lit(false)
        else { val u = units(df); u >= lit(lo) && u <= lit(hi) },
        updated = None, statCols = Seq(column),
        opName = "eraseWhereRange", partCols = partitionColsIn(headFiles))
    eraseRewrite(spark, dir, headV, victims, column,
      df => {
        val c = col(column)
        val u = units(df)
        df.filter(c.isNull || u < lit(lo) || u > lit(hi))
      },
      "eraseWhereRange", partCols = partitionColsIn(headFiles))
  }

  /** Ordered partition columns of a listed layout (empty = flat). */
  private def partitionColsIn(files: Seq[String]): Seq[String] =
    files.find(_.contains("/")).map(partitionChainOf).getOrElse(Seq.empty)

  /** Partition-scoped REPLACE — the idempotent-backfill primitive (the
    * `replaceWhere` shape of Delta/Iceberg): atomically swap every row
    * whose long `column` equals `value` for `replacement`, touching ONLY
    * the files whose committed bloom/range can hold `value` (file
    * granularity — rows of OTHER values sharing a victim file are
    * preserved by rewrite). A re-run with the same replacement converges
    * to the same contents, so a crashed backfill is safely retried; a
    * backfill of a value no file contains is a pure append of the
    * replacement. `replacement` must be confined to the slice
    * (`column = value` on every row) — violations fail loudly BEFORE any
    * write, otherwise the commit would silently leak foreign rows into
    * (or duplicate rows outside) the slice. Same splice-commit guarantees
    * as [[eraseWhereEq]]: concurrent appends and the streaming hwm
    * survive; prior versions time-travel until [[vacuum]]. */
  def replaceWhereEq(spark: SparkSession, dir: String, column: String,
      value: Long, replacement: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    require(replacement.columns.contains(column),
      s"replaceWhereEq: replacement lacks the partition column `$column`")
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L)
      sys.error(s"replaceWhereEq: $dir is not manifest-tracked")
    val partCols = partitionColsIn(headFiles)
    // Delta-style schema strictness: a backfill must regenerate the
    // table's CURRENT schema — a misspelled column would otherwise
    // silently NULL the real one and leak a stray column via the union
    // (schema evolution goes through publish/append, not a backfill)
    val tableCols = readTable(spark, dir).columns.toSet
    val replCols = replacement.columns.toSet
    require(replCols == tableCols,
      s"replaceWhereEq: replacement schema ${replCols.toSeq.sorted} must " +
        s"equal the table schema ${tableCols.toSeq.sorted}")
    // pin the replacement ONCE: the confinement guard below and the write
    // must see the same rows, or a non-deterministic source could pass
    // the guard and then materialize stray rows (TOCTOU). This is the one
    // spot where non-recomputable localCheckpoint blocks are REQUIRED, not
    // a durability liability: a lineage-recoverable cache (cachedView)
    // would re-execute the source on block loss and could re-materialize
    // different rows AFTER the guard passed — failing the job on executor
    // loss is the correct trade on a commit path. Size is bounded by the
    // partition slice being replaced, not the table.
    val pinned = replacement.localCheckpoint()
    val stray = pinned
      .filter(col(column).isNull || col(column) =!= value).limit(1).count()
    require(stray == 0L,
      s"replaceWhereEq: replacement contains rows outside `$column = $value`")
    val victims = filterByPointValues(headFiles, headS.bloom,
      headS.stats, column, Seq(value))
      .filter(f => segmentAdmits(f, column)(v =>
        partitionSegmentUnits(v).forall(_ == value)))
    sliceRewrite(spark, dir, headV, victims, column,
      keep = df => df.filter(col(column).isNull || col(column) =!= value),
      append = Some(pinned),
      keepAllWhenColumnMissing = true, opName = "replace",
      partCols = partCols)
  }

  /** Key-based MERGE (upsert) — the batch half of CDC apply and the core
    * of Delta's `MERGE INTO … WHEN MATCHED THEN UPDATE SET * WHEN NOT
    * MATCHED THEN INSERT *`: every `source` row whose `keyCol` (any
    * equatable type; integral keys get the stats fast path, others scan
    * every candidate but keep the victim join exact) matches a live
    * target row REPLACES that row (whole-row semantics,
    * the [[graft.streaming.UpsertSink]] batch twin); the rest are
    * inserted. Copy-on-write at file granularity, with victim discovery
    * fully DISTRIBUTED — no key set ever lands on the driver:
    *
    *  1. head files are range-pruned against the source's one-row
    *     (min, max) key envelope using committed [[analyze]] stats
    *     (missing stats → conservatively admitted);
    *  2. the survivors' key column is scanned (column-pruned) together
    *     with `_metadata.file_path` and equi-joined against the source
    *     keys — the exact victim files; driver traffic is file NAMES;
    *  3. victims are rewritten with matched rows dropped via a LEFT ANTI
    *     join (distributed — never an `isin` literal list), the source
    *     unioned in, and the result victim-splice-committed
    *     ([[spliceCommit]] — concurrent appends and the streaming hwm
    *     survive); rewritten files carry fresh `keyCol` min/max in the
    *     same commit, so merged regions stay born-prunable.
    *
    * At 100 TB with stats committed, merging a CDC batch whose keys
    * touch k files rewrites those k files and never shuffles — or even
    * lists — the rest of the table.
    *
    * Contract: `source` carries the table's exact schema (schema
    * evolution goes through publish, not merge), and is key-UNIQUE and
    * key-NON-NULL — both loud: a duplicate key makes the surviving row
    * ambiguous, and since SQL `NULL = NULL` never matches, a null-key
    * "upsert" could only ever insert, almost certainly an upstream bug.
    * Target rows with NULL keys match nothing and always survive. Re-
    * running the same merge converges to identical contents (idempotent
    * retry after a crash). Replaced rows stay time-travelable until
    * [[vacuum]]. Returns the committed version. */
  def mergeByKey(spark: SparkSession, dir: String, keyCol: String,
      source: DataFrame): Long = {
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit, max, min}
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L) sys.error(s"mergeByKey: $dir is not manifest-tracked")
    // partitioned targets: the source carries the partition columns as
    // data (they ARE table columns — the schema-equality guard below),
    // and the rewrite re-attaches them via partitionBy
    val partCols = partitionColsIn(headFiles)
    val tableCols = readTable(spark, dir).columns.toSet
    val srcCols = source.columns.toSet
    require(srcCols == tableCols,
      s"mergeByKey: source schema ${srcCols.toSeq.sorted} must equal the " +
        s"table schema ${tableCols.toSeq.sorted}")
    require(srcCols.contains(keyCol),
      s"mergeByKey: source lacks the merge key `$keyCol`")
    // pin ONCE: the uniqueness/null guards, the victim join, the anti-join
    // and the write must all see the same rows (the replaceWhereEq TOCTOU
    // rationale — a non-deterministic source passing the guard and then
    // re-materializing differently would corrupt the merge)
    val pinned = source.localCheckpoint()
    // range-prunability: integral keys only (committed long stats); any
    // other key type keeps every file as a candidate (conservative) and
    // relies on the exact victim join below. A cast-to-long shortcut for
    // other types would silently turn a string-keyed merge into a no-op
    // (NULL envelope reads as "empty").
    val keyIsIntegral = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      pinned.schema(keyCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    // ONE guard pass instead of four driver actions: row count, non-null
    // key count, distinct key count and (for integral keys) the key
    // envelope come out of a single aggregate over the pinned batch —
    // NULL keys exist iff non-null < total, duplicates iff distinct <
    // non-null, and the envelope rides along for the range prune below.
    // Four separate jobs here were pure scheduling overhead per DML
    // statement (each a full pass over the batch).
    val guardAggs = Seq(
      count(lit(1L)).as("__total"),
      count(col(keyCol)).as("__nonnull"),
      countDistinct(col(keyCol)).as("__distinct")) ++
      (if (keyIsIntegral)
        Seq(min(col(keyCol)).cast("long").as("__lo"),
          max(col(keyCol)).cast("long").as("__hi"))
      else Nil)
    val g = pinned.agg(guardAggs.head, guardAggs.tail: _*).head()
    val (gTotal, gNonNull, gDistinct) =
      (g.getLong(0), g.getLong(1), g.getLong(2))
    require(gNonNull == gTotal,
      s"mergeByKey: source has NULL `$keyCol` keys")
    require(gDistinct == gNonNull,
      s"mergeByKey: source has duplicate `$keyCol` keys — ambiguous merge")
    if (gTotal == 0L) return headV // empty source: nothing to do
    // 1. range-prune candidates against the source's key envelope
    val candidates =
      if (!keyIsIntegral) headFiles
      else if (g.isNullAt(3)) headFiles // all-NULL would have failed the guard; stay conservative
      else filterBySegmentRanges( // a partition-column key prunes on its k=v segments
        filterByRanges(headFiles,
          renameAware(headS.stats, headS.renames, Seq(keyCol)),
          Seq((keyCol, g.getLong(3), g.getLong(4)))),
        Seq((keyCol, g.getLong(3), g.getLong(4))))
    // 2. exact victims: candidate files that HOLD a matched key. On a
    // partitioned layout the candidates are read with basePath pinned so
    // a partition-column key resolves like any other column.
    val victims =
      if (candidates.isEmpty) Seq.empty[String]
      else {
        val scan = coalesceRenamed(
          rewriteScan(spark, dir, candidates, Some(headS), partCols),
          headS.renames)
        if (!scan.columns.contains(keyCol)) Seq.empty[String]
        else {
          val paths = scan
            .select(col(keyCol), col("_metadata.file_path").as("__path"))
            .join(pinned.select(col(keyCol)), Seq(keyCol))
            .select("__path").distinct().collect()
            .map(_.getString(0))
          // map URI-style paths back to manifest names by suffix (names
          // are unique within the table dir, so "/name" is unambiguous)
          paths.toSeq.map { full =>
            candidates.find(f => full.endsWith("/" + f)).getOrElse(
              sys.error(s"mergeByKey: scanned file $full is not a " +
                s"candidate of $dir — concurrent layout change?"))
          }
        }
      }
    // 3. rewrite victims minus matched keys, union the source, splice.
    // MERGE-ON-READ mode: mark the matched keys' positions in deletion
    // vectors instead (the upsert's delete half) and land the source
    // batch as ordinary appends — a 10-row MERGE into a 100 TB table
    // writes 10 rows + tiny sidecars, never the victims
    if (dvEnabled(spark))
      return dvRewrite(spark, dir, headV, headS, victims,
        deleteCond = _ => org.apache.spark.sql.functions.lit(false),
        updated = None, statCols = Seq(keyCol), opName = "merge",
        partCols = partCols,
        // key-membership FLAG over every live victim row (the single
        // dv pass computes totals + positions from it): a left marker
        // join against the batch's distinct keys, false for non-matches
        // and NULL keys — the same rows the CoW anti-join keeps
        matchRows = Some(df =>
          if (!df.columns.contains(keyCol))
            df.withColumn("__gdv_m",
              org.apache.spark.sql.functions.lit(false))
          else {
            import org.apache.spark.sql.functions.{coalesce, lit}
            df.join(pinned.select(col(keyCol)).distinct()
                .withColumn("__gdv_m", lit(true)),
              Seq(keyCol), "left")
              .withColumn("__gdv_m", coalesce(col("__gdv_m"), lit(false)))
          }),
        append = Some(pinned))
    sliceRewrite(spark, dir, headV, victims, keyCol,
      keep = df => df.join(pinned.select(col(keyCol)), Seq(keyCol), "left_anti"),
      append = Some(pinned), keepAllWhenColumnMissing = true,
      opName = "merge", partCols = partCols)
  }

  /** Metadata-only DELETE of whole HIVE PARTITIONS — the one row-level
    * delete a partitioned manifest table supports, and the cheapest
    * delete a lakehouse has: when every conjunct of the condition
    * constrains a partition COLUMN (whose value is constant per file —
    * it lives in the directory name), dropping the matching files from
    * the listing is row-exact with ZERO data rewritten. `preds` is the
    * conjunction: column (case-insensitive) → matcher, where `Some(vals)`
    * is an IN-set and `None` is `IS NOT NULL`. A file missing the
    * segment — or carrying the hive default-partition marker — has a
    * NULL partition value there, so eq/IN never match it (SQL
    * semantics) and only IS-NOT-NULL conjuncts can exclude it. Integral
    * literals compare numerically against the decoded segment (so
    * `bucket=01` and `bucket=1` agree); strings compare after hive
    * unescaping. CAS-committed: concurrent appends — rejected on
    * partitioned tables anyway — and the streaming hwm survive; dropped
    * partitions stay time-travelable until [[vacuum]], which walks
    * partition subdirectories too (delisted nested files reclaim under
    * the same grace rules, and fully-emptied partition dirs are pruned).
    * Returns the committed version (the unchanged head when nothing
    * matches). */
  def dropPartitions(spark: SparkSession, dir: String,
      preds: Seq[(String, PartitionPredicate)]): Long = {
    require(preds.nonEmpty, "dropPartitions: empty condition")
    def matches(name: String): Boolean = preds.forall { case (col, m) =>
      val v = partitionSegmentValue(name, col).orNull
      m match {
        case PartitionPredicate.NotNull => v != null
        case _ if v == null => false // NULL never compares true
        case PartitionPredicate.In(vals) => vals.exists {
          case s: String => v == s
          case b: java.lang.Boolean => v.equalsIgnoreCase(b.toString)
          // dates compare in epoch days against the parsed segment (the
          // Bounds convention) — `WHERE day = DATE '…'` is the natural
          // single-day drop
          case d: java.sql.Date =>
            scala.util.Try(java.time.LocalDate.parse(v).toEpochDay).toOption
              .contains(d.toLocalDate.toEpochDay)
          case d: java.time.LocalDate =>
            scala.util.Try(java.time.LocalDate.parse(v).toEpochDay).toOption
              .contains(d.toEpochDay)
          case x: java.lang.Byte => v.toLongOption.contains(x.longValue)
          case x: java.lang.Short => v.toLongOption.contains(x.longValue)
          case x: java.lang.Integer => v.toLongOption.contains(x.longValue)
          case x: java.lang.Long => v.toLongOption.contains(x.longValue)
          case other => sys.error( // silent no-match = silent under-delete
            s"dropPartitions: unsupported comparison value type " +
              s"${other.getClass.getName} for `$col`")
        }
        case PartitionPredicate.Bounds(lo, hi) =>
          // numeric segments compare as longs, date segments as epoch
          // days (the units the provider's literal fold emits); an
          // unparseable segment under a RANGE predicate is loud — rows
          // that should be deleted must never silently survive (the
          // provider pre-checks parseability, so SQL can't reach this)
          val u = partitionSegmentUnits(v).getOrElse(sys.error(
            s"dropPartitions: partition value '$v' of `$col` is neither " +
              "numeric nor an ISO date; a range condition cannot be " +
              "evaluated exactly"))
          lo <= u && u <= hi
      }
    }
    var attempts = 0
    while (attempts < 64) {
      val (headV, headFiles, hwm) = readHead(spark, dir).getOrElse(
        sys.error(s"dropPartitions: $dir is not manifest-tracked"))
      val victims = headFiles.filter(matches)
      if (victims.isEmpty) return headV
      commitIf(spark, dir, headFiles.filterNot(victims.toSet), headV,
        hwm) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"dropPartitions lost $attempts races in $dir; giving up")
  }

  /** One conjunct of a [[dropPartitions]] condition. `Bounds` is in the
    * provider fold's canonical units: the raw value for integral
    * partition values, epoch DAYS for date-typed ones. */
  sealed trait PartitionPredicate
  object PartitionPredicate {
    case object NotNull extends PartitionPredicate
    final case class In(values: Seq[Any]) extends PartitionPredicate
    final case class Bounds(lo: Long, hi: Long) extends PartitionPredicate
  }

  /** The hive-decoded value of `col`'s `k=v` segment in a dir-relative
    * manifest name: None when the name carries no such segment, Some(null)
    * for the hive default-partition marker (a NULL partition value). */
  private[graft] def partitionSegmentValue(name: String,
      col: String): Option[String] = {
    val segs = name.split('/').dropRight(1)
    segs.iterator.flatMap { seg =>
      seg.split("=", 2) match {
        case Array(k, v) if k.equalsIgnoreCase(col) =>
          val dec = org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.unescapePathName(v)
          if (dec == "__HIVE_DEFAULT_PARTITION__") Some(null: String)
          else Some(dec)
        case _ => None
      }
    }.nextOption()
  }

  /** A partition segment value in range-comparable units: the long value
    * for numeric segments, epoch days for ISO `yyyy-MM-dd` dates. */
  private[graft] def partitionSegmentUnits(v: String): Option[Long] =
    v.toLongOption.orElse(
      scala.util.Try(java.time.LocalDate.parse(v).toEpochDay).toOption)

  /** RESTORE the table to a prior committed version — the recovery half
    * of time travel (read old = diagnose, restore old = fix): commit
    * `version`'s file list, schema, stats, blooms, and filestat
    * inventory as the NEW head. Nothing is copied or rewritten — a
    * restore is one metadata commit, O(manifest body) at any table size
    * — and history is preserved: the bad intermediate versions stay
    * time-travelable (auditable) until retention prunes them, exactly
    * Delta's RESTORE semantics. The streaming hwm is re-read WITH the
    * head on every CAS attempt and carried through — a restore undoes
    * table CONTENTS, not the record of which stream epochs were applied
    * (dropping it would let a checkpoint replay double-append into the
    * restored snapshot).
    *
    * Restorability is VERIFIED before the commit: any file `version`
    * lists that the current head dropped may have been vacuumed, so
    * those (and only those — still-listed files are live by definition)
    * are existence-checked; a reclaimed file fails the restore loudly
    * instead of committing a head that scans FAILED_READ. Restoring the
    * current head is a no-op. Returns the committed version. */
  /** Test seam for the restore/vacuum race drill: runs between the
    * restorability check and the CAS attempt — exactly the window where a
    * concurrent zero-grace vacuum can reclaim a delisted file the check
    * just approved. Production value is a no-op. */
  private[graft] var restorePreCommitHook: () => Unit = () => ()

  /** Test seam for the rollback-target-pruned drill: runs between
    * restore's successful CAS and its post-commit re-verification —
    * where a concurrent vacuum can have reclaimed both the restored
    * version's files (pre-commit) and the pre-restore head's own
    * manifest (post-commit, retention keyed on the NEW head).
    * Production value is a no-op. */
  private[graft] var restorePostCommitHook: () => Unit = () => ()

  def restore(spark: SparkSession, dir: String, version: Long): Long = {
    val snapV = snapAt(spark, dir, version).getOrElse(sys.error(
      s"restore: no manifest v$version under $dir (retention pruned it?)"))
    val files = snapV.files
    val (fs, p) = fsFor(spark, dir)
    var attempts = 0
    while (attempts < 64) {
      val (headV, headFiles, hwm) = readHead(spark, dir).getOrElse(
        sys.error(s"restore: $dir is not manifest-tracked"))
      if (headV == version) return headV // restoring the head: no-op
      val live = headFiles.toSet
      def lostFiles(): Seq[String] = files.filterNot(live)
        .filterNot(f => fs.exists(new Path(p, f)))
      val missing = lostFiles()
      if (missing.nonEmpty) sys.error(
        s"restore: v$version is no longer restorable — ${missing.size} of " +
          s"its files were vacuumed (e.g. ${missing.head}); only versions " +
          "whose delisted files survive retention can be restored")
      // the restored version's DELETION-VECTOR sidecars must exist too:
      // a vacuumed sidecar would fail every read of its file AFTER the
      // restore committed — check up front, same contract as the data
      // files (the head's own dvs are live-referenced, never reclaimed)
      val lostDvs = snapV.dvs.values.map(_._1).toSeq.distinct
        .filterNot(n => fs.exists(new Path(new Path(p, Dv.DirName), n)))
      if (lostDvs.nonEmpty) sys.error(
        s"restore: v$version is no longer restorable — ${lostDvs.size} of " +
          s"its deletion-vector sidecars were vacuumed " +
          s"(e.g. ${lostDvs.head}); only versions whose sidecars survive " +
          "retention can be restored")
      restorePreCommitHook()
      commitIf(spark, dir, files, headV, hwm, stats = snapV.stats,
        sstats = snapV.sstats, bloom = snapV.bloom, schema = snapV.schema,
        replaceSchema = true, fstat = snapV.fstat,
        partSchema = snapV.partSchema, replacePartSchema = true,
        colmap = Some(snapV.renames), replaceColmap = true,
        dropTombstones = Some(snapV.dropped),
        dvs = snapV.dvs, replaceDvs = true) match {
        case Some(v2) =>
          // Close the check-then-commit race with vacuum: the check above
          // ran against files that were DELISTED (fair game for a
          // concurrent vacuum) until this commit re-listed them. Re-verify
          // now that they are head-listed — if the window was hit, ROLL
          // BACK (restore is itself restorable: the pre-restore head's
          // manifest still exists) so no reader is left on a head that
          // scans FAILED_READ, then fail loudly. Vacuum's own last-moment
          // head re-read covers the mirrored half of the window. The
          // rollback target is resolved FIRST and the rollback only
          // attempted when it resolves: if the same aggressive vacuum
          // (retainManifests=1, zero grace) already pruned the
          // pre-restore head's manifest, committing an EMPTY guess in
          // its place would be silent truncation in the exact failure
          // path meant to protect readers — report both losses instead.
          restorePostCommitHook()
          val lost = lostFiles()
          if (lost.nonEmpty) {
            val prevSnap = snapAt(spark, dir, headV)
            val outcome = prevSnap match {
              case Some(prev) =>
                if (commitIf(spark, dir, prev.files, v2, hwm,
                    stats = prev.stats, sstats = prev.sstats,
                    bloom = prev.bloom,
                    schema = prev.schema, replaceSchema = true,
                    fstat = prev.fstat,
                    partSchema = prev.partSchema,
                    replacePartSchema = true,
                    colmap = Some(prev.renames),
                    replaceColmap = true,
                    dropTombstones = Some(prev.dropped),
                    dvs = prev.dvs, replaceDvs = true).isDefined)
                  s"window — rolled the head back to v$headV's contents; "
                else
                  "window — and another commit already advanced the head " +
                    "past the bad restore (its files supersede it); "
              case None =>
                s"window — and the pre-restore head v$headV's manifest " +
                  "was itself pruned by the same vacuum, so neither the " +
                  "restore nor a rollback target is recoverable (the head " +
                  "stays on the restored listing; repair from an older " +
                  "surviving version); "
            }
            sys.error(
              s"restore: a concurrent vacuum reclaimed ${lost.size} of " +
                s"v$version's files (e.g. ${lost.head}) in the commit " +
                outcome + "v" + version + " is no longer restorable")
          }
          return v2
        case None => attempts += 1
      }
    }
    sys.error(s"restore lost $attempts races in $dir; giving up")
  }

  /** Declarative schema WIDENING — the engine primitive behind SQL
    * `ALTER TABLE t ADD COLUMNS (…)`: commit the head's file list
    * unchanged with the carried schema extended by `newCols`, each
    * forced nullable (no data file holds the column yet, so every
    * existing row reads NULL there — the merged-footer contract the
    * read path already implements for undeclared evolution, now
    * reachable as a sanctioned metadata-only commit). The CAS loop
    * preserves concurrent appends and the streaming hwm; a name
    * collision (case-insensitive, Spark's resolution default) is loud
    * BEFORE any commit. On a pre-schema manifest the carried schema is
    * bootstrapped from the merged scan schema first — widening implies
    * declaring. Returns the committed version. */
  def addColumns(spark: SparkSession, dir: String,
      newCols: Seq[StructField]): Long = {
    require(newCols.nonEmpty, "addColumns: no columns to add")
    var attempts = 0
    while (attempts < 64) {
      // ONE head resolution per attempt: files, schema, and hwm must
      // come from the same version
      val (v, snap) = headSnap(spark, dir).getOrElse(
        sys.error(s"addColumns: $dir is not manifest-tracked"))
      val (files, hwm) = (snap.files, snap.hwm)
      val base = snap.schema
        .orElse(scala.util.Try(readTable(spark, dir).schema).toOption)
        .getOrElse(sys.error(
          s"addColumns: $dir carries no schema and none can be inferred; " +
            "append data or declare a schema first"))
      val existing = base.fieldNames.map(_.toLowerCase).toSet
      val dup = newCols.map(_.name).filter(n => existing(n.toLowerCase))
      require(dup.isEmpty,
        s"addColumns: column(s) ${dup.mkString(", ")} already exist in $dir")
      val widened = StructType(
        base.fields ++ newCols.map(_.copy(nullable = true)))
      commitIf(spark, dir, files, v, hwm,
        schema = Some(widened), replaceSchema = true) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"addColumns lost $attempts races in $dir; giving up")
  }

  /** Declarative schema NARROWING — the engine primitive behind SQL
    * `ALTER TABLE t DROP COLUMNS (…)`: commit the head's file list
    * unchanged with the named columns removed from the carried schema.
    * METADATA-ONLY — no data file is rewritten; the bytes remain in the
    * footers but every read serves the carried schema, so the columns
    * vanish immediately, and the copy-on-write rewrites PROJECT victims
    * to the declared schema ([[projectToDeclared]]), so the physical
    * bytes age out as files naturally rewrite. Time travel and RESTORE
    * keep each version's own schema (the column reappears when reading
    * v_old — that's history, not a leak). Each dropped column leaves a
    * [[Dropped]] tombstone naming the physical column and the files
    * still carrying its bytes: RE-INTRODUCING the name (ADD COLUMN, an
    * evolved append's footer-merge, RENAME … TO it) is rejected at both
    * commit choke points until the carriers age out — serving the
    * dropped column's stale footer bytes under the new column is the
    * silent-corruption path the tombstone exists to close (OPTIMIZE
    * frees the name immediately). Contract edges, all loud:
    * unknown columns, partition columns (they live in the NAMES — drop
    * the partitions or re-publish), and dropping every column. On a pre-schema
    * manifest the carried schema is bootstrapped from the merged scan
    * schema first, like [[addColumns]]. Returns the committed
    * version. */
  def dropColumns(spark: SparkSession, dir: String,
      cols: Seq[String]): Long = {
    require(cols.nonEmpty, "dropColumns: no columns to drop")
    var attempts = 0
    while (attempts < 64) {
      // ONE head resolution per attempt (the addColumns posture)
      val (v, snap) = headSnap(spark, dir).getOrElse(
        sys.error(s"dropColumns: $dir is not manifest-tracked"))
      val (files, hwm) = (snap.files, snap.hwm)
      val base = snap.schema
        .orElse(scala.util.Try(readTable(spark, dir).schema).toOption)
        .getOrElse(sys.error(
          s"dropColumns: $dir carries no schema and none can be inferred"))
      val partNames = snap.partSchema
        .map(_.fieldNames.toSeq).getOrElse(Seq.empty) ++
        partitionColsIn(files)
      cols.foreach { c =>
        require(!partNames.exists(_.equalsIgnoreCase(c)),
          s"dropColumns: `$c` is a partition column of $dir — its values " +
            "live in the directory names; drop the partitions (DELETE) " +
            "or re-publish instead")
        require(base.fieldNames.exists(_.equalsIgnoreCase(c)),
          s"dropColumns: unknown column `$c` " +
            s"(table has ${base.fieldNames.toSeq.sorted.mkString(", ")})")
      }
      val remaining = base.fields.filterNot(f =>
        cols.exists(_.equalsIgnoreCase(f.name)))
      require(remaining.nonEmpty,
        s"dropColumns: cannot drop every column of $dir")
      // a dropped column's mapping entries go with it — but the physical
      // BYTES remain in live footers, so each dropped logical column
      // leaves a [[Dropped]] tombstone per physical name it was stored
      // under (the renameGroups partition: carrier groups hold the
      // entry's `from`, the identity group holds the logical name
      // itself). The tombstones are what lets both commit choke points
      // reject re-introducing the name while stale bytes could serve
      // under it; they shrink as rewrites project victims to the
      // declared schema and drop when no live file carries the bytes.
      // Carrier sets are deliberately CONSERVATIVE — every file of the
      // column's generation, including files an evolved append wrote
      // without it: committed metadata (fstat is length+mtime; stats
      // cover analyzed columns only) cannot PROVE a footer lacks the
      // bytes, and an under-approximate set is the silent-corruption
      // path the tombstone exists to close. The cost is that ADD COLUMN
      // of a dropped name can stay blocked until a full-table OPTIMIZE
      // ages the generation out — stated in both reject messages.
      val keptRenames = snap.renames.filterNot(r =>
        cols.exists(_.equalsIgnoreCase(r.to)))
      val groups = renameGroups(snap.renames, files)
      val freshTombs = cols.flatMap { c =>
        groups.map { case (fs, subst) =>
          subst.getOrElse(c.toLowerCase, c) -> fs.toSet
        }
      }
      val tombs = (snap.dropped.map(t => t.name -> t.carriers) ++ freshTombs)
        .groupBy(_._1.toLowerCase)
        .values.map(g => Dropped(g.head._1, g.flatMap(_._2).toSet))
        .toSeq.sortBy(_.name)
        .filter(_.carriers.nonEmpty)
      commitIf(spark, dir, files, v, hwm,
        schema = Some(StructType(remaining)), replaceSchema = true,
        colmap = Some(keptRenames), dropTombstones = Some(tombs),
        replaceColmap = files.nonEmpty ||
          keptRenames.size != snap.renames.size ||
          tombs != snap.dropped) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"dropColumns lost $attempts races in $dir; giving up")
  }

  /** Declarative type WIDENING — the engine primitive behind SQL
    * `ALTER TABLE t ALTER COLUMN c TYPE <wider>`: commit the head's file
    * list unchanged with the column's declared type widened.
    * METADATA-ONLY — no data file is rewritten; existing footers keep
    * their narrow physical type and the scan UP-CASTS at read (Spark 4's
    * parquet readers serve INT32 under a LongType/DoubleType read schema
    * — the type-widening support Delta's feature of the same name rides),
    * while new appends write the wide type natively. Mixed-width tables
    * therefore read correctly forever; the narrow bytes age out as files
    * naturally rewrite.
    *
    * Supported widens are exactly the UNIT-PRESERVING ones — integral →
    * wider integral (byte/short/int → short/int/long) and float → double
    * — so every committed data-skipping stat stays sound as-is: integral
    * stats are raw values in both widths (same [[analyze]] units), blooms
    * hash the long-cast value (identical before and after), and float
    * columns never had committed numeric stats (only INT32/INT64 footer
    * stats are recorded). A widen that CHANGED stat units (date →
    * timestamp: days → micros) would have to invalidate per-column stats
    * table-wide and is rejected — rewrite via publish instead. Narrowing
    * and cross-kind retypes are rejected loudly (existing rows could not
    * be served). Partition columns are rejected (their values live in the
    * directory names; the declared partition schema types them).
    * Returns the committed version. */
  /** The lossless, UNIT-PRESERVING widenings [[widenColumnType]] (and
    * the schema-less streaming sink's narrow-batch admission) accept —
    * see the widen scaladoc for why exactly these. */
  private[graft] def losslesslyWidens(from: DataType, to: DataType): Boolean = {
    import org.apache.spark.sql.types._
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
  }

  /** The validation half of one widen against one head snapshot —
    * factored out so a MULTI-column ALTER statement can pre-validate
    * EVERY spec before its first commit (all-or-nothing: a bad later
    * spec must not leave earlier widens already committed). Returns the
    * widened schema, or None for the already-that-type no-op. */
  private def validateWiden(dir: String, snap: Snap, col: String,
      newType: DataType, inferred: => Option[StructType])
      : Option[StructType] = {
    val base = snap.schema.orElse(inferred).getOrElse(sys.error(
      s"widenColumnType: $dir carries no schema and none can be inferred"))
    val partNames = snap.partSchema
      .map(_.fieldNames.toSeq).getOrElse(Seq.empty) ++
      partitionColsIn(snap.files)
    require(!partNames.exists(_.equalsIgnoreCase(col)),
      s"widenColumnType: `$col` is a partition column of $dir — its " +
        "values live in the directory names; re-publish to retype it")
    val field = base.fields.find(_.name.equalsIgnoreCase(col)).getOrElse(
      sys.error(s"widenColumnType: unknown column `$col` " +
        s"(table has ${base.fieldNames.toSeq.sorted.mkString(", ")})"))
    if (field.dataType == newType) return None // already that type: no-op
    require(losslesslyWidens(field.dataType, newType),
      s"widenColumnType: ${field.dataType.simpleString} -> " +
        s"${newType.simpleString} is not a supported widening for " +
        s"`$col` (unit-preserving only: tinyint/smallint/int -> wider " +
        "integral, float -> double); narrowing or cross-kind retypes " +
        "need a rewrite (publish)")
    Some(StructType(base.fields.map(f =>
      if (f.name.equalsIgnoreCase(col)) f.copy(dataType = newType) else f)))
  }

  /** Declarative column RENAME — the engine primitive behind SQL
    * `ALTER TABLE t RENAME COLUMN a TO b`: commit the head's file list
    * unchanged with the column renamed in the carried schema and a
    * COLUMN-MAPPING entry ([[Rename]]) recording that every currently-
    * live file still physically stores the old name. METADATA-ONLY — no
    * data file is rewritten; reads group the file list by carried
    * physical name and alias each group back to the logical schema
    * (scan planning stays pushdown-complete per group, because each
    * group's filters and committed stats are in ITS OWN physical
    * names), new writes emit the new name natively, and copy-on-write
    * rewrites shrink the carrier set until the entry drops and plans
    * collapse back to one scan. Committed data-skipping stats stay
    * keyed by the name each file actually carries — sound by the same
    * grouping. Rejected loudly: unknown columns, partition columns
    * (their values live in the directory names), renaming onto an
    * existing column, and non-identifier names (the manifest's
    * no-escaping invariant). Always commits a CHECKPOINT (delta records
    * inherit the mapping, so the commit that changes it must
    * re-anchor). Returns the committed version. */
  def renameColumn(spark: SparkSession, dir: String, from: String,
      to: String): Long = {
    require(to.matches("[A-Za-z_]\\w*"),
      s"renameColumn: `$to` is not a plain identifier")
    var attempts = 0
    while (attempts < 64) {
      val (v, snap) = headSnap(spark, dir).getOrElse(
        sys.error(s"renameColumn: $dir is not manifest-tracked"))
      val base = snap.schema
        .orElse(scala.util.Try(readTable(spark, dir).schema).toOption)
        .getOrElse(sys.error(
          s"renameColumn: $dir carries no schema and none can be inferred"))
      val partNames = snap.partSchema
        .map(_.fieldNames.toSeq).getOrElse(Seq.empty) ++
        partitionColsIn(snap.files)
      require(!partNames.exists(_.equalsIgnoreCase(from)),
        s"renameColumn: `$from` is a partition column of $dir — its " +
          "values live in the directory names; re-publish to rename it")
      require(!partNames.exists(_.equalsIgnoreCase(to)),
        s"renameColumn: `$to` is a partition column of $dir")
      val field = base.fields.find(_.name.equalsIgnoreCase(from)).getOrElse(
        sys.error(s"renameColumn: unknown column `$from` " +
          s"(table has ${base.fieldNames.toSeq.sorted.mkString(", ")})"))
      require(!base.fieldNames.exists(_.equalsIgnoreCase(to)),
        s"renameColumn: column `$to` already exists in $dir")
      // `to` must not be a name live footers still physically carry:
      // a DROPPED column's tombstoned name (DROP x; RENAME y TO x — the
      // natural "replace old column" flow) or an earlier rename's
      // physical `from`. Either would make coalesceRenamed/renameAware
      // prefer the stale same-named footer bytes/stats over the carrier
      // mapping — silently serving the dropped column's values. Loud
      // beats wrong; OPTIMIZE rewrites the carriers and frees the name.
      require(!snap.dropped.exists(_.name.equalsIgnoreCase(to)),
        s"renameColumn: `$to` was dropped but its bytes are still " +
          s"physically carried by live files of $dir; OPTIMIZE the " +
          "table to rewrite the carriers before reusing the name")
      require(!snap.renames.exists(_.from.equalsIgnoreCase(to)),
        s"renameColumn: `$to` is still physically carried by files " +
          s"written before an earlier RENAME COLUMN in $dir; OPTIMIZE " +
          "the table to rewrite the carriers before reusing the name")
      val renamed = StructType(base.fields.map(f =>
        if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f))
      // chained renames keep every entry mapping physical `from` → the
      // CURRENT logical name: entries whose `to` was this column now
      // point at the new name (their carrier groups still read their
      // own older physical names)
      val updated = snap.renames.map(r =>
        if (r.to.equalsIgnoreCase(from)) r.copy(to = to) else r)
      val entry = Rename(to, field.name, snap.files.toSet)
      val newColmap = updated ++
        (if (snap.files.nonEmpty) Seq(entry) else Seq.empty)
      commitIf(spark, dir, snap.files, v, snap.hwm,
        schema = Some(renamed), replaceSchema = true,
        colmap = Some(newColmap), replaceColmap = true,
        dropTombstones = Some(snap.dropped)) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    sys.error(s"renameColumn lost $attempts races in $dir; giving up")
  }

  /** The head's column-mapping entries — empty when every live file
    * carries the logical schema's own names. */
  def readRenames(spark: SparkSession, dir: String): Seq[Rename] =
    headSnap(spark, dir).map(_._2.renames).getOrElse(Seq.empty)

  /** The head's DROP-COLUMN tombstones — physical names live footers
    * still carry for columns the schema no longer declares. */
  private[graft] def readDropped(spark: SparkSession,
      dir: String): Seq[Dropped] =
    headSnap(spark, dir).map(_._2.dropped).getOrElse(Seq.empty)

  /** The head's deletion-vector references: data file → (sidecar under
    * `_dv/`, deleted-row cardinality). Empty when every listed file
    * serves all its rows. */
  def readDvs(spark: SparkSession,
      dir: String): Map[String, (String, Long)] =
    headSnap(spark, dir).map(_._2.dvs).getOrElse(Map.empty)

  /** Group `files` by which physical column names they carry, per the
    * mapping entries: group i (i < entries.length) = files whose FIRST
    * containing entry is i (carrier sets of successive renames are
    * nested, so this partitions cleanly); the last group = files written
    * after every rename (physical = logical). Each group pairs its
    * file subset with logical-lowercase → physical-name substitutions —
    * for group i, a logical column's physical name is the `from` of
    * the OLDEST entry j ≥ i naming it (the name the file was actually
    * written under). Groups with no files are dropped; the identity
    * group (no substitutions) comes LAST. */
  private[graft] def renameGroups(renames: Seq[Rename],
      files: Seq[String]): Seq[(Seq[String], Map[String, String])] = {
    if (renames.isEmpty) return Seq((files, Map.empty))
    val k = renames.length
    def groupOf(f: String): Int = {
      var i = 0
      while (i < k && !renames(i).carriers(f)) i += 1
      i
    }
    val byGroup = files.groupBy(groupOf)
    (0 to k).flatMap { i =>
      byGroup.get(i).map { fs =>
        val subst = (i until k).reverseIterator.map(j =>
          renames(j).to.toLowerCase -> renames(j).from).toMap
        // reverseIterator + toMap: the OLDEST entry (lowest j) for a
        // logical name wins, overwriting newer entries' substitutions
        (fs, subst.filter { case (lo, from) => !lo.equalsIgnoreCase(from) })
      }
    }
  }

  def widenColumnType(spark: SparkSession, dir: String, col: String,
      newType: DataType): Long =
    widenColumnTypes(spark, dir, Seq(col -> newType))

  /** Multi-column variant: validate EVERY retype against one head
    * snapshot, then commit the fully-folded schema in ONE [[commitIf]] —
    * the statement's all-or-nothing guarantee holds even against
    * concurrent schema changes, because a CAS conflict retries the WHOLE
    * statement (re-validating every spec against the new head) instead
    * of leaving earlier single-column commits already applied. Returns
    * the committed version (the unchanged head when every spec is an
    * already-that-type no-op). */
  def widenColumnTypes(spark: SparkSession, dir: String,
      retypes: Seq[(String, DataType)]): Long = {
    require(retypes.nonEmpty, "widenColumnTypes: no columns to retype")
    var attempts = 0
    while (attempts < 64) {
      // ONE head resolution per attempt: files, schema, partition
      // declaration, and hwm must come from the same version
      val (v, snap) = headSnap(spark, dir).getOrElse(
        sys.error(s"widenColumnType: $dir is not manifest-tracked"))
      lazy val inferred = scala.util.Try(readTable(spark, dir).schema).toOption
      // fold the specs left-to-right, each validated against the schema
      // with the PRIOR retypes applied
      val widened = retypes.foldLeft((snap, false)) {
        case ((s, changed), (c, dt)) =>
          validateWiden(dir, s, c, dt, inferred) match {
            case Some(w) => (s.copy(schema = Some(w)), true)
            case None => (s, changed) // already that type: no-op spec
          }
      }
      widened match {
        case (_, false) => return v // every spec a no-op
        case (s, true) =>
          commitIf(spark, dir, snap.files, v, snap.hwm,
            schema = s.schema, replaceSchema = true) match {
            case Some(v2) => return v2
            case None => attempts += 1
          }
      }
    }
    sys.error(s"widenColumnType lost $attempts races in $dir; giving up")
  }

  /** Project a victim-file scan down to the DECLARED schema (plus the
    * name-carried partition columns the basePath read attached): victim
    * footers may hold columns the table no longer declares
    * ([[dropColumns]]), and letting them ride a rewrite would re-commit
    * the dropped column into the carried schema through the splice.
    * Declared-but-not-physical columns are NOT added here (each caller
    * owns that — updateWhere's withDeclared needs them SETtable, the
    * erase path wants its column-missing short-circuit intact). No-op
    * when the table carries no schema (pre-schema manifests keep the
    * merged-footer contract). */
  /** Normalize a RAW victim-file read of a renamed table to the LOGICAL
    * schema: for every column-mapping entry whose old physical name
    * appears in the frame (mergeSchema gave pre-rename files their old
    * column, post-rename files the new one, NULL where absent — and a
    * file physically holds exactly one of the chain), fold the chain
    * into the logical column with `coalesce(newest … oldest)` and drop
    * the physical leftovers. This is what makes every copy-on-write
    * rewrite EMIT the logical name — the mechanism that shrinks carrier
    * sets until the mapping drops — and what keeps victim-matching
    * conditions on renamed columns finding pre-rename rows. No-op when
    * the table has no mapping. */
  private[graft] def coalesceRenamed(df: DataFrame,
      renames: Seq[Rename]): DataFrame = {
    if (renames.isEmpty) return df
    import org.apache.spark.sql.functions.{coalesce, col}
    def has(d: DataFrame, n: String) = d.columns.exists(_.equalsIgnoreCase(n))
    // entries grouped by CURRENT logical name, kept in commit order so
    // the chain coalesces newest physical name first
    val byTo = renames.zipWithIndex.groupBy(_._1.to.toLowerCase).values
    byTo.foldLeft(df) { (d, entries) =>
      val to = entries.head._1.to
      val froms = entries.sortBy(_._2).map(_._1.from)
        .filter(f => !f.equalsIgnoreCase(to) && has(d, f))
      if (froms.isEmpty) d
      else {
        val chain = (Seq(to).filter(has(d, _)) ++ froms.reverse).map(col)
        froms.foldLeft(d.withColumn(to, coalesce(chain: _*)))(_ drop _)
      }
    }
  }

  private[graft] def projectToDeclared(df: DataFrame,
      declared: Option[StructType], partCols: Seq[String]): DataFrame =
    declared match {
      case None => df
      case Some(sch) =>
        import org.apache.spark.sql.functions.col
        val keep = df.columns.filter(c =>
          sch.fieldNames.exists(_.equalsIgnoreCase(c)) ||
            partCols.exists(_.equalsIgnoreCase(c)))
        if (keep.length == df.columns.length) df
        else df.select(keep.map(col).toSeq: _*)
    }

  /** Targeted row UPDATE — the engine primitive behind SQL `UPDATE t SET
    * … [WHERE …]` ([[graft.plans.GraftSqlParser]] routes the statement
    * here): rewrite, at file granularity, exactly the live files that
    * HOLD a row matching `cond`, with every assignment evaluated against
    * the OLD row (SQL UPDATE semantics — `SET a = b, b = a` swaps) and
    * cast back to the column's declared type (ANSI store-assignment, so
    * an UPDATE can never silently evolve the schema). Non-matching rows
    * in a victim file are preserved bit-for-bit by the rewrite; rows
    * where `cond` evaluates NULL are not updated (WHERE semantics).
    *
    * Victim discovery is two-stage, the [[mergeByKey]] shape:
    *  1. `pruneRanges` — the statement's foldable comparisons in stat
    *     units (what [[graft.plans.GraftSqlParser]] extracts from the
    *     WHERE clause) — prune candidates against committed [[analyze]]
    *     stats; files without stats are conservatively admitted;
    *  2. survivors are scanned (column-pruned to the condition's needs
    *     plus `_metadata.file_path`) and filtered by the EXACT
    *     condition, so only files holding a matching row rewrite;
    *     driver traffic is file names.
    *
    * At 100 TB with stats committed, `UPDATE … WHERE k = 5` rewrites the
    * files whose committed ranges admit key 5 and never lists, opens, or
    * shuffles the rest. A condition-less UPDATE rewrites every live file
    * — the honest cost of the statement. Rewritten files carry fresh
    * min/max for the pruned and assigned columns in the same commit.
    * Same splice-commit guarantees as [[eraseWhereEq]] (concurrent
    * appends and the streaming hwm survive; prior versions time-travel
    * until [[vacuum]]). Returns the committed version — the unchanged
    * head when no file can hold a match. */
  def updateWhere(spark: SparkSession, dir: String,
      sets: Seq[(String, org.apache.spark.sql.Column)],
      cond: Option[org.apache.spark.sql.Column],
      pruneRanges: Seq[(String, Long, Long)] = Seq.empty): Long = {
    import org.apache.spark.sql.functions.{col, when}
    require(sets.nonEmpty, "updateWhere: no assignments")
    require(sets.map(_._1).distinct.size == sets.size,
      s"updateWhere: duplicate assignment targets in ${sets.map(_._1)}")
    val (headV, headS) = headSnapshot(spark, dir)
    val headFiles = headS.files
    if (headV == 0L) sys.error(s"updateWhere: $dir is not manifest-tracked")
    if (headFiles.isEmpty) return headV
    // HIVE-PARTITIONED layout: the victim scan reads with basePath pinned
    // (partition columns resolve in the condition), the rewrite re-attaches
    // the name-carried values via partitionBy, and a condition on a
    // partition column prunes candidates on the k=v segments themselves —
    // `UPDATE … WHERE d = DATE '…'` touches one partition's files. SETting
    // a partition column is rejected: rows would have to MOVE between
    // partition directories, which is a re-publish, not an in-place update.
    val partCols = partitionColsIn(headFiles)
    sets.foreach { case (c, _) =>
      require(!partCols.exists(_.equalsIgnoreCase(c)),
        s"updateWhere: `$c` is a partition column of $dir — updating it " +
          "would move rows between partitions; rewrite the slice via " +
          "publishPartitioned (or drop and re-append) instead")
    }
    val candidates =
      if (pruneRanges.isEmpty) headFiles
      else filterBySegmentRanges(
        filterByRanges(headFiles,
          renameAware(headS.stats, headS.renames, pruneRanges.map(_._1)),
          pruneRanges),
        pruneRanges)
    if (candidates.isEmpty) return headV
    // DECLARED columns no data file physically carries yet (an [[
    // addColumns]] widen is metadata-only) must still be SETtable and
    // filterable — append them as typed NULLs to both the victim scan
    // and the rewrite input, so `ALTER TABLE ADD COLUMNS` composes with
    // `UPDATE` in the same session the two features shipped in
    val declared = readSchema(spark, dir)
    def withDeclared(df: DataFrame): DataFrame = declared match {
      case None => df
      case Some(sch) =>
        val have = df.columns.map(_.toLowerCase).toSet
        sch.fields.filterNot(f => have(f.name.toLowerCase)).foldLeft(df) {
          (d, f) =>
            d.withColumn(f.name,
              org.apache.spark.sql.functions.lit(null).cast(f.dataType))
        }
    }
    // raw0 stays UNPROJECTED: `_metadata` only resolves on the file
    // relation itself, never through a projection — the declared-schema
    // projection (dropColumns leftovers in victim footers must not ride
    // the rewrite back into the carried schema) is applied downstream
    val raw0 = rewriteScan(spark, dir, candidates, Some(headS), partCols)
    val raw = projectToDeclared(coalesceRenamed(raw0, headS.renames),
      declared, partCols)
    val scan = withDeclared(raw)
    // assignment targets must exist: a typo would otherwise silently
    // append a NEW column to the rewritten files instead of updating
    sets.foreach { case (c, _) =>
      require(scan.columns.contains(c),
        s"updateWhere: unknown column `$c` " +
          s"(table has ${scan.columns.toSeq.sorted.mkString(", ")})")
    }
    val victims: Seq[String] = cond match {
      case None => candidates
      case Some(p) =>
        // `_metadata` is selected on the RAW file relation (hidden-column
        // resolution does not reach through the declared-null projection)
        val paths = withDeclared(coalesceRenamed(
            raw0.select(col("_metadata.file_path").as("__path"), col("*")),
            headS.renames))
          .filter(p)
          .select("__path")
          .distinct().collect().map(_.getString(0)).toSeq
        // URI-style paths map back to manifest names by suffix (names are
        // unique within the table dir, so "/name" is unambiguous)
        paths.map { full =>
          candidates.find(f => full.endsWith("/" + f)).getOrElse(sys.error(
            s"updateWhere: scanned file $full is not a candidate of $dir " +
              "— concurrent layout change?"))
        }
    }
    if (victims.isEmpty) return headV
    // MERGE-ON-READ: mark the matched positions + append the updated
    // rows instead of rewriting whole victims (assignments already
    // validated against `scan` above)
    if (dvEnabled(spark)) {
      val setMap = sets.toMap
      return dvRewrite(spark, dir, headV, headS, victims,
        df => cond.getOrElse(org.apache.spark.sql.functions.lit(true)),
        updated = Some(read => read.select(read.columns.toSeq.map { c =>
          setMap.get(c) match {
            case None => col(c)
            case Some(v) => v.cast(read.schema(c).dataType).as(c)
          }
        }: _*)),
        statCols = (pruneRanges.map(_._1) ++ sets.map(_._1)).distinct,
        opName = "update", partCols = partCols)
    }
    val read = withDeclared(projectToDeclared(
      coalesceRenamed(
        dropDeleted(spark, dir,
          rewriteScan(spark, dir, victims, Some(headS), partCols),
          victims, headS.dvs),
        headS.renames),
      declared, partCols))
    val setMap = sets.toMap
    // one pass, no union: every output column is either untouched or a
    // row-conditional swap computed from the OLD row, so all assignments
    // see pre-update values and non-matching rows round-trip unchanged
    val rewritten = read.select(read.columns.toSeq.map { c =>
      setMap.get(c) match {
        case None => col(c)
        case Some(v) =>
          val stored = v.cast(read.schema(c).dataType)
          (cond match {
            case Some(p) => when(p, stored).otherwise(col(c))
            case None => stored
          }).as(c)
      }
    }: _*).coalesce(math.max(victims.size, 1))
    val moved =
      if (partCols.isEmpty) writeAndMoveIn(rewritten, "update", dir)
      else writeAndMoveInPartitioned(rewritten, "update", dir, partCols)
    val statCols = (pruneRanges.map(_._1) ++ sets.map(_._1)).distinct
    val (mstats, msstats) = fileAllStats(spark, dir, moved, statCols)
    // committed schema = data columns only on a partitioned layout
    val committed = StructType(rewritten.schema.fields.filterNot(f =>
      partCols.exists(_.equalsIgnoreCase(f.name))))
    spliceCommit(spark, dir, victims, moved, mstats, msstats, "update",
      schema = Some(committed), dvAtRead = headS.dvs)
  }

  private def eraseRewrite(spark: SparkSession, dir: String, headV: Long,
      victims: Seq[String], column: String,
      keep: DataFrame => DataFrame, opName: String,
      partCols: Seq[String] = Seq.empty): Long =
    sliceRewrite(spark, dir, headV, victims, column, keep, append = None,
      keepAllWhenColumnMissing = false, opName = opName,
      partCols = partCols)

  /** Merge-on-read mode switch for row-level DML (`DELETE` / `UPDATE`):
    * when `spark.graft.dml.deletionVectors` is true, victims are not
    * rewritten — matching row POSITIONS are recorded in deletion-vector
    * sidecars ([[Dv]]) and the manifest's `dvs` section re-points, so a
    * one-row DELETE in a 1 GB file costs O(rows-in-file) compute but
    * only O(deleted rows) WRITE. Files whose every row dies are removed
    * outright (no empty-file dv debris), and OPTIMIZE/compaction
    * materializes accumulated deletions back to clean files. Default
    * FALSE: copy-on-write stays the shipped behavior; the conf opts a
    * session into merge-on-read. */
  private def dvEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.dml.deletionVectors")
      .exists(_.trim.equalsIgnoreCase("true"))

  /** Apply any live deletion vectors of `victims` to a RAW V1 victim
    * scan (must wrap the file relation itself — `_metadata` never
    * resolves through a projection). EVERY copy-on-write rewrite read
    * funnels through this: a rewrite that ignored a victim's dv would
    * resurrect its deleted rows into the fresh file. No-op when no
    * victim carries one. */
  private[graft] def dropDeleted(spark: SparkSession, dir: String,
      df: DataFrame, victims: Seq[String],
      dvs: Map[String, (String, Long)]): DataFrame = {
    val vset = victims.toSet
    val relevant = dvs.filter(kv => vset(kv._1))
    if (relevant.isEmpty) df else Dv.applyToScan(spark, dir, df, relevant)
  }

  /** Typed-NULL widening to the declared schema (the [[updateWhere]]
    * contract: declared-but-not-yet-physical columns are SETtable and
    * filterable). */
  private def withDeclaredCols(df: DataFrame,
      declared: Option[StructType]): DataFrame = declared match {
    case None => df
    case Some(sch) =>
      val have = df.columns.map(_.toLowerCase).toSet
      sch.fields.filterNot(f => have(f.name.toLowerCase)).foldLeft(df) {
        (d, f) =>
          d.withColumn(f.name,
            org.apache.spark.sql.functions.lit(null).cast(f.dataType))
      }
  }

  /** The MERGE-ON-READ tail of a row-level DML statement: one victim
    * scan evaluates `deleteCond` (logical columns — renames coalesced,
    * declared NULLs attached) with each row's file/position riding
    * along; matched positions merge into per-file deletion-vector
    * sidecars written EXECUTOR-side (one task per victim file — driver
    * traffic is (file, dv, cardinality) triples, never row positions);
    * files whose whole row set dies are REMOVED instead of dv'd; and
    * for UPDATE, `updated` transforms the matched rows into the
    * appended replacement files. Commits with the same victim-vanished
    * CAS discipline as [[spliceCommit]]. Rows already deleted by an
    * EXISTING dv are excluded from the scan (they can neither re-match
    * nor ride an UPDATE append); the fresh sidecar unions the old
    * positions so replacing the reference loses nothing.
    *
    * CONFLICT AUTO-RETRY: when a concurrent dv commit re-points a
    * victim's entry during the race window (dv DELETE racing dv DELETE
    * on the same file), the statement's sidecars were merged from the
    * stale entry — committing them would drop the winner's positions.
    * Instead of bouncing that to the user, the statement cleans up its
    * artifacts and RE-RUNS ITSELF against the fresh head (the marking
    * pass is the whole work, so the retry costs one extra victim scan
    * — unlike copy-on-write, where a retry means rewriting files, so
    * the CoW splice stays loud). Bounded by
    * `spark.graft.dml.conflictRetries` (default 3); exhaustion aborts
    * with the same loud re-run error. Serialization is sound for the
    * same reason the plain CAS success path is: the retry re-marks the
    * SAME victim files against the fresh dv state, which orders this
    * statement after the winning dv commit and before any disjoint
    * appends that landed meanwhile (write-serializable — blind appends
    * never conflict with row-level DML on disjoint files). Victim
    * VANISHED stays loud: a file can vanish because OPTIMIZE respelled
    * it, and re-nominating victims is the caller's pruning logic, not
    * ours. */
  private def dvRewrite(spark: SparkSession, dir: String, headV: Long,
      headS: Snap, victims: Seq[String],
      deleteCond: DataFrame => org.apache.spark.sql.Column,
      updated: Option[DataFrame => DataFrame],
      statCols: Seq[String], opName: String,
      partCols: Seq[String],
      matchRows: Option[DataFrame => DataFrame] = None,
      append: Option[DataFrame] = None,
      conflictAttempt: Int = 0): Long = {
    import org.apache.spark.sql.functions.{col, not, substring_index}
    if (victims.isEmpty && append.isEmpty) return headV
    if (victims.isEmpty) {
      // pure-append shape (a MERGE whose keys match nothing): no
      // positions to mark, just land the batch through the ordinary
      // splice (no victims to splice out)
      val moved =
        if (partCols.isEmpty) writeAndMoveIn(append.get, opName, dir)
        else writeAndMoveInPartitioned(append.get, opName, dir, partCols)
      val (mstats, msstats) = fileAllStats(spark, dir, moved, statCols)
      return spliceCommit(spark, dir, Seq.empty, moved, mstats, msstats,
        opName, schema = Some(StructType(append.get.schema.fields
          .filterNot(f => partCols.exists(_.equalsIgnoreCase(f.name))))))
    }
    val (fs, p) = fsFor(spark, dir)
    val raw = rewriteScan(spark, dir, victims, Some(headS), partCols)
    // file identity + row position ride the RAW file relation
    // (`_metadata` never resolves through a projection); everything
    // downstream sees logical columns
    val victimSet = victims.toSet
    val oldDvRefs = headS.dvs.filter(kv => victimSet(kv._1))
    // grouped by the ABSOLUTE path, never the basename: a partitioned
    // write can mint the same basename under different k=v/ dirs
    val withPos = raw.select(
      col("_metadata.file_path").as("__gdv_f"),
      col("_metadata.row_index").as("__gdv_i"), col("*"))
    val alive =
      if (oldDvRefs.isEmpty) withPos
      else {
        val bc = spark.sparkContext.broadcast(
          Dv.loadBitmaps(spark, dir, oldDvRefs))
        withPos.filter(not(graft.functions.DvDeleted.of(
          col("_metadata.file_path"), col("_metadata.row_index"), bc)))
      }
    val declared = readSchema(spark, dir)
    val logical = withDeclaredCols(
      coalesceRenamed(alive, headS.renames), declared)
    // per-row MATCH FLAG over every live victim row — a Column
    // predicate for DELETE/UPDATE, a key-membership marker join for
    // MERGE (matchRows wins when provided; either way the __gdv
    // file/position columns ride along). One flagged frame feeds the
    // SINGLE pass below that computes live totals AND matched
    // positions together — the dv path scans its victims once, like
    // copy-on-write does, instead of once for counts and again for
    // positions.
    val flagged = matchRows match {
      case Some(m) => m(logical)
      case None =>
        logical.withColumn("__gdv_m", deleteCond(logical))
    }
    // Absolute scan paths map back to manifest names by EXACT relative
    // path under the table's qualified root (a victim whose relative
    // path is a suffix of another's must never alias it); the
    // longest-suffix fallback covers a foreign path rendering.
    val rootPrefix = Dv.rootPrefixOf(spark, dir)
    def nameOf(abs: String): String =
      (if (abs.startsWith(rootPrefix))
        Some(abs.substring(rootPrefix.length)).filter(victimSet)
      else None)
        .orElse(victims.filter(v => abs.endsWith("/" + v))
          .sortBy(-_.length).headOption)
        .getOrElse(sys.error(
          s"$opName: scanned file $abs is not a victim of $dir " +
            "— concurrent layout change?"))
    // executor-side sidecar writes, ONE narrow pass: per victim file,
    // count the live rows and collect the matched positions in the same
    // group iteration; merge fresh positions with the old dv (disjoint
    // — the scan excluded already-deleted rows), sort, write-once. A
    // file whose every live row matched is FULLY dead: no sidecar is
    // written at all (the file is removed from the listing instead).
    // Result rows: (absPath, Some(dv) partial | None full, mergedCard,
    // freshMatched); no-match files emit nothing.
    val confBc = Dv.confBroadcast(spark)
    val oldBc = spark.sparkContext.broadcast(
      Dv.loadBitmaps(spark, dir, oldDvRefs))
    val root = dir
    // DV-DENSITY MAINTENANCE: write-once union sidecars mean k repeated
    // small deletes to one file cost O(k²) sidecar bytes and leave k
    // referenced sidecars until vacuum, and every read of the file pays
    // the bitmap. When a statement would push a file's deleted fraction
    // past this threshold, the file is MATERIALIZED instead (its
    // survivors rewritten locally, entry dropped — per-file
    // copy-on-write, no global OPTIMIZE needed). 1.0 disables (a file
    // whose every live row matched is removed outright regardless).
    val matThreshold = spark.conf
      .getOption("spark.graft.dv.materializeThreshold")
      .map(_.trim.toDouble).getOrElse(0.5)
    import spark.implicits._
    import org.apache.spark.sql.functions.{coalesce => fnCoalesce, lit}
    // Result rows: (absPath, Some(dv) sidecar | None, mergedCard,
    // freshMatched, Some(positions) materialize | None); no-match files
    // emit nothing; (None, None) = the whole file died.
    val written: Seq[(String, Option[String], Long, Long, Option[Array[Long]])] =
      flagged
      .select(col("__gdv_f"), col("__gdv_i"),
        fnCoalesce(col("__gdv_m"), lit(false)).as("__gdv_m"))
      .groupBy(col("__gdv_f"))
      // map-side PARTIAL aggregation: the shuffle carries one (count,
      // matched positions) pair per file per map task — O(matched)
      // bytes for a sparse delete, never the victim's full row set
      .agg(
        org.apache.spark.sql.functions.count(lit(1)).as("__t"),
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.when(
            col("__gdv_m"), col("__gdv_i"))).as("__p"))
      .as[(String, Long, Seq[Long])]
      .flatMap { case (f, total, pos) =>
        if (pos.isEmpty) Iterator.empty
        else {
          val old = Option(oldBc.value.positionsOf(f))
            .getOrElse(Array.empty[Long])
          val merged = (old ++ pos).distinct.sorted
          val freshN = pos.length.toLong
          // total = LIVE rows scanned (old deletions pre-filtered)
          val fileRows = total + old.length
          if (freshN >= total) // every live row died: drop the FILE
            Iterator.single((f, None: Option[String],
              merged.length.toLong, freshN, None: Option[Array[Long]]))
          else if (merged.length.toDouble >= matThreshold * fileRows)
            // density trigger: route THIS file to local materialization
            // (no sidecar written — the driver rewrites its survivors)
            Iterator.single((f, None: Option[String],
              merged.length.toLong, freshN, Some(merged)))
          else {
            val tableRoot = new org.apache.hadoop.fs.Path(root)
            val xfs = tableRoot.getFileSystem(confBc.value.value)
            Iterator.single((f, Some(Dv.write(xfs, tableRoot, merged)),
              merged.length.toLong, freshN, None: Option[Array[Long]]))
          }
        }
      }.collect().toSeq
    // no positions marked and nothing to append: the statement was
    // vacuous (victims nominated by rows an EXISTING dv already
    // deleted) — `updated` without marked positions is vacuous too (the
    // replacement set IS the marked set), so don't write an empty file
    if (written.isEmpty && append.isEmpty) return headV
    val fullyDeleted = written.collect {
      case (f, None, _, _, None) => nameOf(f)
    }
    val dvAdds: Map[String, (String, Long)] = written.collect {
      case (f, Some(dv), card, _, _) => nameOf(f) -> (dv, card)
    }.toMap
    // density-triggered materializations: abs path → ALL deleted
    // positions (old dv ∪ this statement's matches); the file's
    // survivors rewrite below and the file splices OUT of the listing,
    // exactly like a whole-file delete plus a fresh clean file
    val materialize: Map[String, Array[Long]] = written.collect {
      case (f, None, _, _, Some(m)) => f -> m
    }.toMap
    // the UPDATE shape: matched rows (old values) re-emitted through the
    // assignments as ordinary appends, projected to the declared schema
    // so dropped-column leftovers never ride back in
    val replaced: Option[DataFrame] =
      if (written.isEmpty) None
      else updated.map { f =>
        val input = projectToDeclared(
          flagged.filter(col("__gdv_m"))
            .drop("__gdv_f", "__gdv_i", "__gdv_m"),
          declared, partCols)
        f(input)
      }
    // survivors of materialized files: one V1 scan of JUST those files,
    // the union bitmap as the row filter (identity = segment-anchored
    // relative-path suffix, the Dv discipline), folded to the declared
    // schema like every rewrite piece
    val survivors: Option[DataFrame] =
      if (materialize.isEmpty) None
      else {
        val buckets: Map[String, Seq[(String, Array[Long])]] =
          materialize.toSeq.map { case (abs, m) =>
            val rel = nameOf(abs)
            val base = rel.substring(rel.lastIndexOf('/') + 1)
            (base, (rel, m))
          }.groupBy(_._1).map { case (b, es) => b -> es.map(_._2) }
        val bcm = spark.sparkContext.broadcast(
          Dv.Index(rootPrefix, buckets))
        val r0 = rewriteScanPaths(spark, dir, materialize.keys.toSeq,
          Some(headS), partCols)
        val live = r0.filter(org.apache.spark.sql.functions.not(
          Dv.deletedCol(bcm)))
        Some(projectToDeclared(
          coalesceRenamed(live, headS.renames), declared, partCols))
      }
    val pieces = survivors.toSeq ++ replaced.toSeq ++ append.toSeq
    val moved: Seq[String] =
      if (pieces.isEmpty) Seq.empty
      else {
        // output-file target mirrors sliceRewrite: one per touched
        // victim, floored by the append's own parallelism
        val target = math.max(math.max(written.size, 1),
          append.map(_.rdd.getNumPartitions).getOrElse(0))
        val out = pieces
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .coalesce(target)
        if (partCols.isEmpty) writeAndMoveIn(out, opName, dir)
        else writeAndMoveInPartitioned(out, opName, dir, partCols)
      }
    if (written.isEmpty && moved.isEmpty) return headV
    val (mstats, msstats) =
      if (moved.isEmpty) (Map.empty: FileStats, Map.empty: FileStringStats)
      else fileAllStats(spark, dir, moved, statCols)
    def cleanupAbort(): Unit = {
      moved.foreach(f => scala.util.Try(fs.delete(new Path(p, f), false)))
      dvAdds.values.foreach { case (dv, _) => scala.util.Try(
        fs.delete(new Path(new Path(p, Dv.DirName), dv), false)) }
    }
    var attempts = 0
    while (attempts < 64) {
      if (attempts == 0) rewritePreCommitHook()
      val (v, snapNow) = headSnap(spark, dir).getOrElse {
        cleanupAbort()
        sys.error(s"$opName: manifest vanished under $dir")
      }
      val files = snapNow.files
      val hwm = snapNow.hwm
      if (!victimSet.subsetOf(files.toSet)) {
        cleanupAbort()
        throw new ConflictAbortException(s"$opName: victim files " +
          s"disappeared under $dir (concurrent rewrite); re-run " +
          "against the new head")
      }
      // victims still LISTED is not enough: the sidecars in dvAdds were
      // UNIONED from oldDvRefs at planning. A concurrent dv commit on
      // the same victim (dv DELETE racing dv DELETE) keeps it listed but
      // re-points its dv entry — overlaying ours would silently drop the
      // winner's positions (resurrect its deleted rows). Abort loudly on
      // any drift of a victim's dv entry from what the sidecars merged.
      if (snapNow.dvs.filter(kv => victimSet(kv._1)) != oldDvRefs) {
        cleanupAbort()
        val maxRetries = spark.conf
          .getOption("spark.graft.dml.conflictRetries")
          .flatMap(_.trim.toIntOption).getOrElse(3)
        if (conflictAttempt < maxRetries)
          // re-run the whole marking pass against the fresh head: the
          // fresh oldDvRefs union the winner's positions, so nothing is
          // dropped; bounded so a hostile commit storm still surfaces
          return dvRewrite(spark, dir, v, snapNow, victims, deleteCond,
            updated, statCols, opName, partCols, matchRows, append,
            conflictAttempt + 1)
        throw new ConflictAbortException(s"$opName: a concurrent " +
          s"commit changed a victim's deletion vector under $dir " +
          "(this statement's sidecars were merged from the stale entry " +
          "and would drop the winner's deleted positions; auto-retried " +
          s"$conflictAttempt times); re-run against the new head")
      }
      // materialized files splice OUT like whole-file deletes: their
      // survivors ride `moved` and their dv entries drop with the name
      val gone = fullyDeleted.toSet ++ materialize.keys.map(nameOf)
      val kept = files.filterNot(gone)
      if (moved.nonEmpty) requireLayoutMatch(kept, moved, opName)
      commitIf(spark, dir, kept ++ moved, v, hwm, mstats, msstats,
        dvs = dvAdds) match {
        case Some(v2) => return v2
        case None => attempts += 1
      }
    }
    cleanupAbort()
    sys.error(s"$opName lost $attempts races in $dir; giving up")
  }

  /** Shared tail of every slice rewrite (erase, replace-backfill, merge):
    * read the victims once with a merged schema, apply `keep`, union the
    * optional `append`, write, and victim-splice-commit with fresh
    * `column` stats. Victims whose merged schema predates `column` hold
    * only NULLs there, so no row can match the slice:
    * `keepAllWhenColumnMissing` keeps them untouched through a replace,
    * while an erase short-circuits to the unchanged head. One output file
    * per victim keeps the file-count (and the skipping stats'
    * granularity) stable instead of collapsing every touched file into
    * one — floored by the append's partition count so an insert-heavy
    * merge writes with the batch's parallelism (see below).
    *
    * HIVE-PARTITIONED tables (`partCols` non-empty): victims are read
    * with `basePath` pinned to the table root, so the name-carried
    * partition columns resolve as ordinary columns of the scan (the
    * condition and `keep` can reference them), and the rewrite is
    * written `partitionBy(partCols)` with every leaf file moved back
    * UNDER its `k=v/` directory — values re-attached by Spark's own
    * path escaping, never hand-formatted, so rows can never lose (or
    * change) their partition. The committed schema strips the partition
    * columns back out (they live in the names). The scan's tasks are
    * victim-file-aligned and partition values are constant per victim,
    * so the partitioned write stays leaf-aligned without any shuffle. */
  private def sliceRewrite(spark: SparkSession, dir: String, headV: Long,
      victims: Seq[String], column: String, keep: DataFrame => DataFrame,
      append: Option[DataFrame], keepAllWhenColumnMissing: Boolean,
      opName: String, partCols: Seq[String] = Seq.empty): Long = {
    // captured ONCE: the dv state the victim read applies is what the
    // splice commit verifies is still the victims' dv state at commit
    // time (a concurrent dv DELETE would otherwise be resurrected)
    val dvAtRead = readDvs(spark, dir)
    val oldPart: Either[Long, Option[DataFrame]] =
      if (victims.isEmpty) Right(None)
      else {
        val reader = spark.read.option("mergeSchema", "true")
        // projected to the declared schema: undeclared footer columns
        // (dropColumns leftovers) must not ride the rewrite back into
        // the carried schema through the splice commit; deletion
        // vectors applied FIRST (a rewrite must not resurrect rows)
        val read = projectToDeclared(
          coalesceRenamed(
            dropDeleted(spark, dir,
              (if (partCols.isEmpty) reader
               else reader.option("basePath", dir))
                .parquet(victims.map(f => s"$dir/$f"): _*),
              victims, dvAtRead),
            readRenames(spark, dir)),
          readSchema(spark, dir), partCols)
        if (!read.columns.contains(column))
          if (keepAllWhenColumnMissing) Right(Some(read)) else Left(headV)
        else Right(Some(keep(read)))
      }
    oldPart match {
      case Left(v) => v
      case Right(kept) =>
        val pieces = kept.toSeq ++ append.toSeq
        if (pieces.isEmpty) return headV
        // Output-file target: one per victim keeps the file count (and
        // skipping-stats granularity) stable for pure rewrites — but an
        // insert-heavy merge (zero or few victims, large append) must not
        // funnel the whole batch through one task, so the target is
        // FLOORED by the append's own partition count (the appends are
        // localCheckpoint-pinned by their callers, so getNumPartitions is
        // a metadata read). coalesce never raises a partition count, so a
        // small append still lands as few files.
        val target = math.max(math.max(victims.size, 1),
          append.map(_.rdd.getNumPartitions).getOrElse(0))
        val next = pieces
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .coalesce(target)
        val moved =
          if (partCols.isEmpty) writeAndMoveIn(next, opName, dir)
          else writeAndMoveInPartitioned(next, opName, dir, partCols)
        val (mstats, msstats) = fileAllStats(spark, dir, moved, Seq(column))
        val committed = StructType(next.schema.fields.filterNot(f =>
          partCols.exists(_.equalsIgnoreCase(f.name))))
        spliceCommit(spark, dir, victims, moved, mstats, msstats, opName,
          schema = Some(committed), dvAtRead = dvAtRead)
    }
  }

  /** Row-level MULTISET diff between two committed versions — the
    * reconciliation report a backfill/erase/compaction audit wants when
    * file-level CDC ([[addedBetween]]) can't tell a moved row from a new
    * one: per distinct row, how many copies version `vNew` gained or lost
    * versus `vOld`. Returns the distinct rows with a non-zero delta as
    * `(columns..., delta)` (positive = added copies, negative = removed).
    *
    * Exactness: rows are compared by NULL-SAFE equality on every column
    * of the two versions' merged schema (a column absent at one version
    * reads NULL there) — never by a lossy row hash, so no collision can
    * hide a discrepancy. Scale shape: one groupBy per side (map-side
    * combined to |distinct rows|) and one full-outer equi-join on the row
    * itself; the output is only the rows that changed. */
  def diffRows(spark: SparkSession, dir: String, vOld: Long,
      vNew: Long): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit}
    // O(delta), not O(table): a data file listed at BOTH versions and
    // read identically there — same dv entry, under identical renames,
    // schema and partition declaration — contributes the same multiset
    // to both sides of the diff, so its rows cancel to delta 0 and are
    // filtered out anyway. Scanning only the files that DIFFER turns a
    // backfill audit on a 100 TB table into a scan of the touched slice.
    // Any disagreement on renames/schema (the same bytes would read as
    // different logical rows) or a pre-schema manifest (empty file lists
    // cannot drive footer inference) falls back to the full two-version
    // scan, which is always correct.
    val (a, b) = (snapAt(spark, dir, vOld), snapAt(spark, dir, vNew)) match {
      case (Some(o), Some(n))
          if o.schema.nonEmpty && o.schema == n.schema &&
            o.renames == n.renames && o.partSchema == n.partSchema =>
        val common = o.files.toSet.intersect(n.files.toSet)
        val cancelling = common.filter(f => o.dvs.get(f) == n.dvs.get(f))
        (scanListed(spark, dir, o.files.filterNot(cancelling), o.schema,
            o.fstat, o.partSchema, o.renames, o.dvs),
          scanListed(spark, dir, n.files.filterNot(cancelling), n.schema,
            n.fstat, n.partSchema, n.renames, n.dvs))
      case _ =>
        (readTableAt(spark, dir, vOld), readTableAt(spark, dir, vNew))
    }
    val cols = (a.columns ++ b.columns).distinct.sorted.toSeq
    require(cols.forall(c => c != "delta" && !c.startsWith("__")),
      s"diffRows: reserved column name in schema: ${cols.mkString(", ")}")
    def widen(df: DataFrame) = {
      val have = df.columns.toSet
      df.select(cols.map(c =>
        if (have(c)) col(c) else lit(null).as(c)): _*)
    }
    val ca = widen(a).groupBy(cols.map(col): _*).agg(count(lit(1)).as("__ca"))
    val cb = widen(b).groupBy(cols.map(col): _*).agg(count(lit(1)).as("__cb"))
    val joined = ca.join(cb,
      cols.map(c => ca(c) <=> cb(c)).reduce(_ && _), "full_outer")
    joined.select(
      cols.map(c => coalesce(ca(c), cb(c)).as(c)) :+
        (coalesce(col("__cb"), lit(0L)) - coalesce(col("__ca"), lit(0L)))
          .as("delta"): _*)
      .filter(col("delta") =!= 0L)
  }

  /** One-row summary of [[diffRows]]: `(n_added, n_removed, n_changed_rows)`
    * — copies gained, copies lost, and distinct changed rows. */
  def diffVersions(spark: SparkSession, dir: String, vOld: Long,
      vNew: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    diffRows(spark, dir, vOld, vNew).agg(
      coalesce(sum(when(col("delta") > 0, col("delta")).otherwise(0L)),
        lit(0L)).as("n_added"),
      coalesce(sum(when(col("delta") < 0, -col("delta")).otherwise(0L)),
        lit(0L)).as("n_removed"),
      count(lit(1)).as("n_changed_rows"))
  }

  private def markerName(consumerId: String, v: Long): String =
    f"consumer-$consumerId-v$v%020d.marker"

  /** Highest version this consumer has durably processed (0 = nothing).
    * Markers are tiny exclusive-created files in the manifest dir, one per
    * advance, never rewritten — the same dense-version protocol as
    * commits, so an advance can never be lost to a concurrent worker and
    * a crash can never leave a half-written marker. */
  def consumerVersion(spark: SparkSession, dir: String,
      consumerId: String): Long = {
    val (fs, p) = fsFor(spark, dir)
    val mdir = new Path(p, ManifestDir)
    if (!fs.exists(mdir)) return 0L
    val prefix = s"consumer-$consumerId-v"
    fs.listStatus(mdir).toSeq.flatMap { s =>
      val n = s.getPath.getName
      if (n.startsWith(prefix) && n.endsWith(".marker"))
        n.stripPrefix(prefix).stripSuffix(".marker").toLongOption
      else None
    }.foldLeft(0L)(math.max)
  }

  /** Incremental consumption of a manifested table — the "table as a
    * stream" read side of the manifest protocol (the sink side is the
    * exactly-once streaming append): hand `f` the rows added since this
    * consumer's marker (exclusive) up to the current head (inclusive),
    * then advance the marker AFTER `f` returns. A crash mid-`f`
    * re-delivers the same range on the next call — at-least-once; pair
    * with idempotent effects (a CAS publish keyed on the range, or
    * [[Merge.maintainAgg]] state committed in the same manifest) for
    * exactly-once end to end. Each consumer id has its own marker chain,
    * so independent downstream views tail the same table at their own
    * pace. Returns the processed (from, to] version range, or None when
    * nothing is new.
    *
    * Scale: the delta scan reads ONLY the files added in the range
    * (file-granular CDC, [[addedBetween]]) — tailing a 100 TB table costs
    * the new files, not the table. */
  def consumeNew(spark: SparkSession, dir: String, consumerId: String)(
      f: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    require(consumerId.matches("[A-Za-z0-9_-]+"),
      s"consumerId must be [A-Za-z0-9_-]+: $consumerId")
    val from = consumerVersion(spark, dir, consumerId)
    val head = read(spark, dir).map(_._1).getOrElse(0L)
    if (head <= from) return None
    val advance = () => {
      val (fs, p) = fsFor(spark, dir)
      val mdir = new Path(p, ManifestDir)
      // losing this create means another worker of the same consumer
      // already advanced past us — re-delivery, not data loss; ignore
      createExclusive(fs, mdir, new Path(mdir, markerName(consumerId, head)),
        Array.emptyByteArray)
    }
    // a delete-only (or empty-table) range ADDS no files, so there is
    // nothing to deliver — handing `f` a poison empty frame would wedge
    // the consumer on the range forever; skip delivery (and the scan
    // construction entirely) but still advance the marker. Detected from
    // the manifest name sets (cache-amortized metadata — the head was
    // resolved a moment ago), never by running a scan.
    val addsNothing = {
      val toFiles = readAt(spark, dir, head).getOrElse(Seq.empty)
      if (from == 0L) toFiles.isEmpty
      else readAt(spark, dir, from) match {
        case Some(fromFiles) =>
          val seen = fromFiles.toSet
          toFiles.forall(seen)
        case None => false // pruned `from`: addedBetween's error names it
      }
    }
    if (addsNothing) { advance(); return None }
    val df =
      if (from == 0L) readTableAt(spark, dir, head)
      else addedBetween(spark, dir, from, head)
    // a schema-less (pre-schema, delete-only-history) table can still
    // serve a zero-column frame here — same poison-delivery skip
    if (df.columns.isEmpty) { advance(); return None }
    f(df, from, head)
    advance()
    Some((from, head))
  }

  private val MarkerRe = "consumer-(.+)-v([0-9]+)\\.marker".r

  /** Delete data files the head manifest no longer lists (plus leftover
    * temp dirs/files of crashed commits, including the streaming sink's
    * `.inflight-*` scratch), prune each consumer's superseded markers, and
    * prune manifests past `retainManifests`.
    *
    * `graceMillis` protects two distinct windows: IN-FLIGHT work (anything
    * with mtime younger than the grace is skipped, because a running
    * micro-batch's scratch dir and its moved-but-not-yet-committed data
    * files look dead to this scan) and IN-FLIGHT READERS (a data file whose
    * DELISTING commit — the successor of its newest listing manifest — is
    * younger than the grace is skipped even when its bytes are old: a
    * query that resolved the pre-compaction head may still be scanning
    * it). The default 0 keeps the historical "caller owns the grace
    * period" behavior; production loops should pass max(batch duration,
    * longest query runtime). Delisting time is proved from retained
    * manifests, so when `retainManifests` × commit-interval is SHORTER
    * than the grace (high-rate streaming tables), candidates whose
    * listers were already pruned are conservatively kept until the
    * surviving history spans the grace — size retention to cover the
    * grace window if prompt reclamation matters.
    *
    * Manifest retention: the newest `retainManifests` manifest versions are
    * kept (default: all — time travel to any version stays possible), and a
    * version at or above the slowest consumer's current marker is NEVER
    * pruned regardless of retention, so [[consumeNew]] can always compute
    * its delta and resume after a vacuum. Without pruning, `_manifest/`
    * listings grow one file per commit forever — at a 100 TB table's commit
    * rate that listing becomes the read-path bottleneck.
    *
    * Returns deleted names. */
  def vacuum(spark: SparkSession, dir: String, graceMillis: Long = 0L,
      retainManifests: Int = Int.MaxValue): Seq[String] = {
    require(retainManifests >= 1, "must retain at least the head manifest")
    val (fs, p) = fsFor(spark, dir)
    val (live, hwm) = readHead(spark, dir) match {
      case Some((_, files, h)) => (files.toSet, h.getOrElse(-1L))
      case None => return Seq.empty // untracked dirs have no dead-file notion
    }
    val cutoff = System.currentTimeMillis() - graceMillis
    val entries = fs.listStatus(p).toSeq
    val deadScratch = entries.filter { s =>
      val n = s.getPath.getName
      s.isDirectory && (n.startsWith("_publish_tmp-") ||
        n.startsWith("_compaction_tmp-") || n.startsWith(".inflight-")) &&
        s.getModificationTime <= cutoff
    }
    // An append batch's files are moved in under their final `b<id>-…`
    // names BEFORE its manifest commit; with a small grace they would
    // look dead in that window and the commit would then publish a
    // manifest referencing deleted data. A batch id ABOVE the committed
    // hwm identifies exactly that in-flight (or crashed-awaiting-replay)
    // window — protected within a FLOOR of max(grace, 10 min) of the
    // file's mtime, far beyond any real rename→commit latency, so the
    // race is closed even at graceMillis = 0 while a permanently-dead
    // query's orphans still reclaim once clearly stale. Once the batch
    // (or its replay) commits, the hwm covers the id and any orphaned
    // twin files become ordinary dead candidates under the plain grace.
    val inflightFloor =
      System.currentTimeMillis() - math.max(graceMillis, InflightAppendFloorMs)
    def inflightAppend(s: org.apache.hadoop.fs.FileStatus): Boolean =
      s.getPath.getName match {
        case AppendBatchFile(id) =>
          id.toLong > hwm && s.getModificationTime > inflightFloor
        case SqlInsertFile() => s.getModificationTime > inflightFloor
        case _ => false
      }
    // data candidates carry their dir-RELATIVE name (hive-partitioned
    // layouts list files under k=v/ subdirs — the manifest's name space),
    // so a partition dropped by [[dropPartitions]] is reclaimable like
    // any delisted top-level file. Protocol dirs (_manifest, _publish_tmp,
    // .inflight-*) are excluded by the same leading-_/. rule init uses.
    // the nested sweep descends ONLY hive-shaped `k=v` directories: a
    // user subdir the protocol never wrote (backups, exports) must never
    // become reclaimable collateral — partition dirs always carry '='
    def hivePartDir(s: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = s.getPath.getName
      s.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
        n.contains("=")
    }
    def nestedData(d: org.apache.hadoop.fs.FileStatus,
        prefix: String): Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      fs.listStatus(d.getPath).toSeq.flatMap { s =>
        val n = s.getPath.getName
        if (s.isFile && !n.startsWith("_") && !n.startsWith("."))
          Seq((prefix + n) -> s)
        else if (hivePartDir(s)) nestedData(s, s"$prefix$n/")
        else Seq.empty
      }
    val dataEntries: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      entries.collect { case s if s.isFile => s.getPath.getName -> s } ++
        entries.filter(hivePartDir)
          .flatMap(d => nestedData(d, d.getPath.getName + "/"))
    val deadDataCandidates = dataEntries.filter { case (rel, s) =>
      val base = s.getPath.getName
      !base.startsWith("_") && !base.startsWith(".") && !live(rel) &&
        !inflightAppend(s) && s.getModificationTime <= cutoff
    }
    val mdir = new Path(p, ManifestDir)
    val mstats = if (fs.exists(mdir)) fs.listStatus(mdir).toSeq else Seq.empty
    // Dereference grace: a dead file's BYTES can be old while its
    // delisting is seconds old (a compaction that just committed) — a
    // reader that resolved the pre-compaction head is still scanning it,
    // so the deletion gate must be time-since-DEREFERENCE, not file mtime.
    // The file's newest lister is manifest v ⇒ it was delisted at commit
    // v+1, whose manifest mtime IS the dereference time (versions are
    // dense, retention prunes oldest-first so v on disk ⇒ v+1 on disk,
    // and commit creation is sequential so manifest mtimes are monotone
    // in version). Scan newest→oldest, stopping once the manifests are
    // older than the cutoff: any file first found listed BELOW that point
    // has its delisting commit at or below a scanned ≤-cutoff mtime, so
    // it is provably outside the grace and deletable — the scan is
    // bounded by the grace window's commit count, never the history. If
    // the manifests are EXHAUSTED while still younger than the cutoff,
    // what remains depends on whether the scan was complete: with v1
    // still retained the history is exhaustive, so an unlisted file was
    // NEVER reader-visible (crash orphan) and the mtime gate suffices;
    // but once retention has pruned manifests (v1 gone), an unlisted
    // candidate may have been delisted recently by a pruned lister —
    // its delist time is unknowable, so keep it until the surviving
    // history spans the grace (or an explicit graceMillis=0 pass).
    val deadFiles: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      if (graceMillis <= 0L || deadDataCandidates.isEmpty) {
        deadScratch.map(s => s.getPath.getName -> s) ++ deadDataCandidates
      } else {
        val derefFresh = scala.collection.mutable.Set.empty[String]
        var pending = deadDataCandidates.map(_._1).toSet
        var newerMtime = Long.MaxValue // mtime of version v+1 in the loop
        var lastVersion = Long.MaxValue
        val listingMap = mstats
          .flatMap(s => versionOf(s.getPath.getName).map(_ -> s)).toMap
        val desc = listingMap.toSeq.sortBy(-_._1).iterator
        // the walk needs each scanned version's RESOLVED listing; delta
        // records are UNWOUND downward (listing(v-1) = listing(v) - adds
        // + removes — both name sets ride the record), so the scan costs
        // one chain resolution at the top plus the records themselves,
        // re-anchoring only across checkpoint boundaries or pruned gaps
        var unwound: Set[String] = null // listing at lastVersion - 1
        while (pending.nonEmpty && newerMtime > cutoff && desc.hasNext) {
          val (v, ms) = desc.next()
          val body = {
            val in = fs.open(ms.getPath)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            finally in.close()
          }
          val parsed = parseBody(v, body)
          val listed: Set[String] = parsed match {
            case Right(full) => full.files.toSet
            case Left(_) if unwound != null && lastVersion == v + 1 =>
              unwound
            case Left(_) =>
              resolveSnap(fs, p, dir, v, listingMap).files.toSet
          }
          // loop invariant: newerMtime > cutoff, so every pending file
          // listed here was delisted inside the grace window
          val listedPending = pending.filter(listed)
          derefFresh ++= listedPending
          pending --= listedPending
          newerMtime = ms.getModificationTime
          unwound = parsed match {
            case Left(d) => listed -- d.adds ++ d.removes
            case Right(_) => null // below a checkpoint: re-anchor
          }
          lastVersion = v
        }
        if (pending.nonEmpty && newerMtime > cutoff && lastVersion > 1L)
          derefFresh ++= pending // listers pruned: delist time unknowable
        deadScratch.map(s => s.getPath.getName -> s) ++
          deadDataCandidates.filterNot { case (rel, _) => derefFresh(rel) }
      }
    // grace applies here too: an in-flight commit's .tmp- (the non-local
    // createExclusive path) must not be deleted between write and rename
    val deadTmps = mstats.filter(s =>
      (s.getPath.getName.startsWith(".tmp-") ||
        s.getPath.getName.startsWith(".head-tmp-")) &&
        s.getModificationTime <= cutoff)
    // each consumer's chain of advance markers: only the highest is load-
    // bearing (consumerVersion takes the max), the rest accumulate forever
    val markers = mstats.flatMap { s =>
      s.getPath.getName match {
        case MarkerRe(id, v) => v.toLongOption.map(ver => (id, ver, s))
        case _ => None
      }
    }
    val deadMarkers = markers.groupBy(_._1).values.toSeq
      .flatMap(ms => ms.sortBy(_._2).dropRight(1).map(_._3))
    // manifests: keep the newest `retainManifests`, and everything any
    // consumer still needs (its delta scans start at its current marker)
    val manifests = mstats.flatMap(s => versionOf(s.getPath.getName).map(_ -> s))
    val keepFrom = manifests.map(_._1).sorted
      .takeRight(retainManifests).headOption.getOrElse(Long.MinValue)
    val minConsumer = markers.groupBy(_._1).values
      .map(_.map(_._2).max).minOption.getOrElse(Long.MaxValue)
    // the retention boundary is EXTENDED down to the oldest retained
    // version's chain BASE: a retained delta record is only readable with
    // its checkpoint and every record between them, so pruning must never
    // orphan a chain (bases are monotone in version, so one boundary
    // read covers every retained version). Costs one small body read
    // when the oldest retained version is a delta; at most one effective
    // checkpoint interval's worth (≤ 63) of extra manifests survive.
    val keepBound = math.min(keepFrom, minConsumer)
    val chainBase: Long = manifests.map(_._1).filter(_ >= keepBound)
      .minOption.flatMap { oldest =>
        manifests.find(_._1 == oldest).map { case (_, st) =>
          val body = {
            val in = fs.open(st.getPath)
            try new String(in.readAllBytes(), StandardCharsets.UTF_8)
            finally in.close()
          }
          DeltaBaseRe.findFirstMatchIn(body)
            .map(_.group(1).toLong).getOrElse(oldest)
        }
      }.getOrElse(keepBound)
    val deadManifests = manifests
      .filter { case (v, _) => v < math.min(keepBound, chainBase) }.map(_._2)
    // Last-moment liveness re-read: a RESTORE committing while this
    // vacuum computed its candidate set may have re-listed files that
    // were dead at the head read above — deleting them now would gut the
    // restored head. One extra manifest listing closes the vacuum side of
    // the window (restore's own post-CAS verification closes its side).
    val liveNow = readHead(spark, dir).map(_._2.toSet).getOrElse(Set.empty)
    // DELETION-VECTOR sidecars: reclaim `_dv/` files no SURVIVING
    // manifest references. References appear VERBATIM in bodies (a
    // checkpoint restates the whole dvs section; a delta carries the
    // overlay that introduced the dv), and retention keeps the whole
    // chain [chainBase, head], so one regex pass over the surviving
    // bodies is exhaustive for every still-resolvable version. A dv
    // whose last lister is pruned in THIS pass dies with it — the same
    // reader-exposure class as data files of pruned versions (time
    // travel is only guaranteed before a vacuum past that version). The
    // sweep costs O(surviving manifests) body reads and only runs when
    // `_dv/` exists at all. mtime grace applies like any data file —
    // A sidecar NO body (surviving or pruned) has ever referenced is
    // special: sidecars are written EXECUTOR-side before their manifest
    // commit, and a concurrent dv commit can also land between this
    // vacuum's `_manifest/` listing and its `_dv/` listing — so a young
    // never-referenced sidecar may belong to a commit this pass cannot
    // see, and a zero-grace vacuum deleting it would gut that commit
    // (loud FileNotFound at read — never silent, but a protocol
    // violation). Those reclaim only past the in-flight floor
    // (max(grace, 10 min) of mtime — the append-window discipline); a
    // sidecar referenced ONLY by manifests pruned in this pass
    // committed long ago and reclaims under the plain grace.
    val dvDir = new Path(p, Dv.DirName)
    val deadDvs: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      if (!fs.exists(dvDir)) Seq.empty
      else {
        val deadM = deadManifests.map(_.getPath.getName).toSet
        def refsOf(sts: Seq[org.apache.hadoop.fs.FileStatus]): Set[String] =
          sts.flatMap { st =>
            val body = {
              val in = fs.open(st.getPath)
              try new String(in.readAllBytes(), StandardCharsets.UTF_8)
              finally in.close()
            }
            """dv-[0-9a-f\-]+\.bin""".r.findAllIn(body)
          }.toSet
        val (deadSts, liveSts) = manifests.map(_._2)
          .partition(s => deadM(s.getPath.getName))
        val referenced = refsOf(liveSts)
        val everReferenced = referenced ++ refsOf(deadSts)
        fs.listStatus(dvDir).toSeq
          .filter(s => s.isFile && Dv.isDvName(s.getPath.getName))
          .filter { s =>
            val n = s.getPath.getName
            !referenced(n) && s.getModificationTime <= cutoff &&
              (everReferenced(n) || s.getModificationTime <= inflightFloor)
          }
          .map(s => s"${Dv.DirName}/${s.getPath.getName}" -> s)
      }
    val deleted =
      (deadFiles.filterNot { case (rel, _) => liveNow(rel) } ++ deadDvs ++
        (deadTmps ++ deadMarkers ++ deadManifests)
        .map(s => s.getPath.getName -> s)).map { case (rel, s) =>
        fs.delete(s.getPath, true)
        rel
      }
    // partition dirs emptied by the reclamation above are dropped too
    // (bottom-up), so a fully-vacuumed dropped partition leaves no husk
    if (deleted.exists(_.contains("/"))) {
      def pruneEmpty(d: Path): Boolean = { // true = d was deleted
        val children = fs.listStatus(d).toSeq
        val dirsGone = children.filter(_.isDirectory)
          .map(c => pruneEmpty(c.getPath)).forall(identity)
        if (dirsGone && children.forall(_.isDirectory)) fs.delete(d, false)
        else false
      }
      entries.filter(hivePartDir)
        .foreach(s => if (fs.exists(s.getPath)) pruneEmpty(s.getPath))
    }
    deleted
  }
}
