package graft.plans

import java.util

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}
import org.apache.spark.sql.types.{ByteType, DateType, IntegerType, LongType, ShortType, StructType, TimestampNTZType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.TableManifest

/** Table-reference resolution shared by every graft SQL statement that
  * addresses a manifest table by NAME: the statement's identifier resolves
  * through the session catalog to the table's path option, so a SQL-only
  * operator never needs to know where the table lives. An identifier
  * whose single part is an absolute path (back-ticked in SQL:
  * `` UPDATE `/wh/events` … ``) addresses the table directly — the
  * path-first escape hatch the maintenance statements' quoted-path form
  * already established. */
private[plans] object GraftTables {

  /** The manifest directory behind `parts`, or None when the reference is
    * not a graft-manifest table (caller falls through to Spark's own
    * behavior — its analyzer owns the not-found / unsupported errors). */
  def graftPath(spark: SparkSession, parts: Seq[String]): Option[String] = {
    parts match {
      case Seq(p) if p.startsWith("/") => return Some(p)
      case _ => ()
    }
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      // the fully-qualified form Spark itself prints in error messages
      case Seq(cat, db, t) if cat.equalsIgnoreCase("spark_catalog") =>
        TableIdentifier(t, Some(db))
      case _ => return None
    }
    // temp views shadow tables in SQL resolution; going through the
    // view-aware lookup keeps that contract (a view has no provider, so
    // it falls through and Spark reports the real error)
    scala.util.Try(
        spark.sessionState.catalog.getTempViewOrPermanentTableMetadata(ident))
      .toOption
      .filter(_.provider.exists(_.equalsIgnoreCase("graft-manifest")))
      .flatMap { m =>
        m.storage.properties.get("path").orElse(
          m.storage.locationUri.map(u => new org.apache.hadoop.fs.Path(u).toString))
      }
  }

  /** [[graftPath]] for statements that REQUIRE a graft table (maintenance
    * by name) — loud instead of falling through. */
  def requireGraftPath(spark: SparkSession, name: String): String = {
    val parts = spark.sessionState.sqlParser.parseMultipartIdentifier(name)
    graftPath(spark, parts).getOrElse(sys.error(
      s"`$name` is not a graft-manifest table (expected a catalog table " +
        "created with USING `graft-manifest`, or a quoted '/path')"))
  }
}

/** Rewrites of Spark-parsed DML / time-travel plans onto the manifest
  * table's own primitives — the [[GraftSqlParser]] post-pass. Spark's
  * grammar already parses `UPDATE`, `MERGE INTO`, and `FOR VERSION /
  * TIMESTAMP AS OF`; stock Spark then REJECTS them for v1/file tables at
  * analysis. For targets that resolve to graft-manifest tables these
  * rewrites route the statements onto [[TableManifest.updateWhere]] /
  * [[TableManifest.mergeByKey]] / the provider's pinned time-travel
  * snapshot instead; everything else returns unchanged so Spark keeps
  * ownership of its own surface. Out-of-shape statements on GRAFT tables
  * fail HERE — at planning, with the supported shape in the message —
  * never silently at runtime. */
private[plans] object GraftDmlRewrite {

  /** Strip a plain alias wrapper off a DML target. */
  private def unalias(plan: LogicalPlan): (Option[String], LogicalPlan) =
    plan match {
      case SubqueryAlias(ident, child) => (Some(ident.name), child)
      case other => (None, other)
    }

  /** Qualifier names that may prefix a column reference in a statement's
    * expressions: the explicit alias if any, else the table name parts. */
  private def qualifiers(alias: Option[String], parts: Seq[String]): Set[String] =
    alias.map(a => Set(a.toLowerCase))
      .getOrElse(parts.map(_.toLowerCase).toSet)

  /** Drop `t.` / alias qualifiers from column references so the stored
    * Columns resolve against the bare victim-file DataFrame at run time
    * (which has no alias in scope). A reference that is neither bare nor
    * qualified by the target is left alone — it will fail resolution
    * loudly at run, naming the attribute. */
  private def dequalify(e: Expression, quals: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(Seq(a.nameParts.last))
    }

  /** Stat-unit value of a foldable comparison literal — Catalyst literals
    * already carry [[TableManifest.analyze]]'s canonical units (micros
    * for timestamps, epoch days for dates, the raw value for integrals)
    * — PROVIDED the literal's unit KIND matches the target column's
    * declared type ([[pruneRanges]] checks that): a timestamp literal
    * compared to a DATE column is in micros while the column's committed
    * stats are in days, and pruning on it would silently skip files
    * Spark's cast semantics would match. */
  private def statUnits(e: Expression): Option[Long] = e match {
    case l: Literal => l.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Option(l.value).map {
          case b: Byte => b.toLong
          case s: Short => s.toLong
          case i: Int => i.toLong
          case v: Long => v
        }
      case TimestampType | TimestampNTZType =>
        Option(l.value).map(_.asInstanceOf[Long])
      case DateType => Option(l.value).map(_.asInstanceOf[Int].toLong)
      case _ => None
    }
    case _ => None
  }

  /** The stat-unit KIND of a type: integral, timestamp (micros), or date
    * (epoch days). None for everything else. */
  private def unitKind(dt: org.apache.spark.sql.types.DataType): Option[String] =
    dt match {
      case ByteType | ShortType | IntegerType | LongType => Some("integral")
      case TimestampType | TimestampNTZType => Some("timestamp")
      case DateType => Some("date")
      case _ => None
    }

  private def plainColumn(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute if a.nameParts.length == 1 =>
      Some(a.nameParts.head)
    case _ => None
  }

  /** Conservative manifest-prune ranges from an UPDATE condition: every
    * top-level AND conjunct comparing a plain column to a typed literal
    * OF THE COLUMN'S OWN UNIT KIND narrows that column's admissible
    * [lo, hi]; all other conjuncts are IGNORED — sound, because a
    * conjunction only shrinks the matching row set, and
    * [[TableManifest.updateWhere]]'s exact victim scan restores
    * exactness. The kind check (against `schema` — the table's declared
    * data + partition columns) is what keeps a CROSS-TYPE comparison
    * (`dateCol = TIMESTAMP '…'`: literal in micros, committed stats in
    * days) from pruning in the wrong units and silently under-updating;
    * such conjuncts simply don't prune, and the exact scan keeps the
    * statement correct. A column not in `schema` (or no schema at all —
    * untracked/pre-schema tables) never prunes. */
  def pruneRanges(cond: Expression,
      schema: StructType): Seq[(String, Long, Long)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val colKind: Map[String, String] = schema.fields.iterator
      .flatMap(f => unitKind(f.dataType).map(f.name.toLowerCase -> _))
      .toMap
    def typedColumn(a: Expression, v: Expression): Option[String] =
      for {
        c <- plainColumn(a)
        lk <- v match {
          case l: Literal => unitKind(l.dataType)
          case _ => None
        }
        ck <- colKind.get(c.toLowerCase)
        if ck == lk
      } yield c
    val bounds = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    def narrow(c: String, lo: Long, hi: Long): Unit = {
      val (l0, h0) = bounds.getOrElse(c, (Long.MinValue, Long.MaxValue))
      bounds(c) = (math.max(l0, lo), math.min(h0, hi))
    }
    def lt(a: Expression, v: Expression): Unit =
      for (c <- typedColumn(a, v); l <- statUnits(v) if l > Long.MinValue)
        narrow(c, Long.MinValue, l - 1)
    def le(a: Expression, v: Expression): Unit =
      for (c <- typedColumn(a, v); l <- statUnits(v)) narrow(c, Long.MinValue, l)
    def gt(a: Expression, v: Expression): Unit =
      for (c <- typedColumn(a, v); l <- statUnits(v) if l < Long.MaxValue)
        narrow(c, l + 1, Long.MaxValue)
    def ge(a: Expression, v: Expression): Unit =
      for (c <- typedColumn(a, v); l <- statUnits(v)) narrow(c, l, Long.MaxValue)
    conjuncts(cond).foreach {
      case EqualTo(a, v) if statUnits(v).isDefined => { le(a, v); ge(a, v) }
      case EqualTo(v, a) if statUnits(v).isDefined => { le(a, v); ge(a, v) }
      case LessThan(a, v) if statUnits(v).isDefined => lt(a, v)
      case LessThan(v, a) if statUnits(v).isDefined => gt(a, v)
      case LessThanOrEqual(a, v) if statUnits(v).isDefined => le(a, v)
      case LessThanOrEqual(v, a) if statUnits(v).isDefined => ge(a, v)
      case GreaterThan(a, v) if statUnits(v).isDefined => gt(a, v)
      case GreaterThan(v, a) if statUnits(v).isDefined => lt(a, v)
      case GreaterThanOrEqual(a, v) if statUnits(v).isDefined => ge(a, v)
      case GreaterThanOrEqual(v, a) if statUnits(v).isDefined => le(a, v)
      case _ => ()
    }
    bounds.toSeq.map { case (c, (lo, hi)) => (c, lo, hi) }
  }

  /** `UPDATE t SET … [WHERE …]` on a graft-manifest target →
    * [[GraftUpdateCommand]]; non-graft targets return unchanged. */
  def rewriteUpdate(spark: SparkSession, u: UpdateTable): LogicalPlan = {
    val (alias, rel) = unalias(u.table)
    val target = rel match {
      case ur: UnresolvedRelation => ur.multipartIdentifier
      case _ => return u
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return u)
    val quals = qualifiers(alias, target)
    val sets = u.assignments.map { case Assignment(key, value) =>
      val name = key match {
        case a: UnresolvedAttribute if a.nameParts.length == 1 =>
          a.nameParts.head
        case a: UnresolvedAttribute if a.nameParts.length == 2 &&
            quals.contains(a.nameParts.head.toLowerCase) =>
          a.nameParts.last
        case other => sys.error(
          s"graft-manifest UPDATE: unsupported assignment target `${other.sql}` " +
            "— only top-level columns can be SET (nested fields belong to " +
            "the library surface)")
      }
      name -> ColumnBridge.column(dequalify(value, quals))
    }
    val cond = u.condition.map(dequalify(_, quals))
    // the raw condition expression rides the command: prune-range
    // extraction needs the target's declared column TYPES (data +
    // partition columns) so cross-type literals never prune in the wrong
    // units, and that schema is read AT EXECUTION against the same head
    // the update runs on — a parse-time read would both pay two extra
    // head reads per statement and bake stale unit kinds into the plan
    // (a publish/replace — or now ALTER COLUMN TYPE — retyping a column
    // between parse and execution could prune in the old units).
    GraftUpdateCommand(path, sets, cond.map(ColumnBridge.column))
  }

  /** `MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN UPDATE SET *
    * WHEN NOT MATCHED THEN INSERT *` — exactly the whole-row upsert
    * [[TableManifest.mergeByKey]] implements (the reference's own
    * diff-and-publish loop is this statement's semantics:
    * `/root/reference/services/spark_batch_processor.py:83-100`).
    * Non-graft targets return unchanged; out-of-shape graft merges are
    * rejected here with the supported shape. */
  def rewriteMerge(spark: SparkSession, m: MergeIntoTable): LogicalPlan = {
    val (_, rel) = unalias(m.targetTable)
    val target = rel match {
      case ur: UnresolvedRelation => ur.multipartIdentifier
      case _ => return m
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return m)
    def reject(why: String): Nothing = sys.error(
      s"graft-manifest MERGE supports exactly `MERGE INTO t USING s ON " +
        "t.<key> = s.<key> WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED " +
        s"THEN INSERT *` (whole-row upsert, TableManifest.mergeByKey); $why")
    if (m.withSchemaEvolution)
      reject("WITH SCHEMA EVOLUTION is not supported (schema evolution " +
        "goes through ALTER TABLE / append)")
    if (m.notMatchedBySourceActions.nonEmpty)
      reject("WHEN NOT MATCHED BY SOURCE clauses are not supported")
    m.matchedActions match {
      case Seq(UpdateStarAction(None)) => ()
      case other => reject(s"unsupported WHEN MATCHED clause(s): $other")
    }
    m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => ()
      case other => reject(s"unsupported WHEN NOT MATCHED clause(s): $other")
    }
    val keyCol = m.mergeCondition match {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute)
          if l.nameParts.last.equalsIgnoreCase(r.nameParts.last) =>
        l.nameParts.last
      case other => reject(
        s"the ON condition must be a single same-named key equality, got " +
          s"`${other.sql}`")
    }
    GraftMergeCommand(path, keyCol, m.sourceTable)
  }

  /** `ALTER TABLE t ADD COLUMNS (name type, …)` on a graft-manifest
    * table → [[TableManifest.addColumns]] (a metadata-only CAS commit
    * widening the carried schema; old rows read NULL) — the sanctioned
    * SQL route for write-side schema evolution, after which `INSERT INTO
    * t` can carry the new column. A NAME-addressed table also gets its
    * catalog schema synced in the same command, so Spark's own INSERT
    * analysis sees the widened shape immediately. Only plain nullable
    * top-level columns are supported; defaults, positions, NOT NULL, and
    * nested paths are rejected at planning (a default/NOT NULL would
    * promise something no existing file can honor). Non-graft targets
    * return unchanged. */
  def rewriteAddColumns(spark: SparkSession,
      ac: org.apache.spark.sql.catalyst.plans.logical.AddColumns): LogicalPlan = {
    val target = ac.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case _ => return ac
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return ac)
    def reject(why: String): Nothing = sys.error(
      "graft-manifest ALTER TABLE ADD COLUMNS supports plain nullable " +
        s"top-level columns only; $why")
    val fields = ac.columnsToAdd.map { c =>
      if (c.path.nonEmpty) reject(s"`${c.name.mkString(".")}` is nested")
      if (!c.nullable) reject(s"`${c.colName}` is NOT NULL (existing rows " +
        "have no value for a new column)")
      if (c.position.nonEmpty) reject(s"`${c.colName}` carries a position")
      if (c.default.nonEmpty) reject(s"`${c.colName}` carries a default")
      org.apache.spark.sql.types.StructField(c.colName, c.dataType,
        nullable = true)
    }
    // name-addressed targets sync the catalog schema too (path targets
    // have no catalog entry)
    val catalogIdent =
      if (target.sizeIs <= 2 && !target.head.startsWith("/")) Some(target)
      else None
    GraftAddColumnsCommand(path, catalogIdent, fields)
  }

  /** `ALTER TABLE t DROP COLUMN[S] (…)` on a graft-manifest table →
    * [[TableManifest.dropColumns]] (a metadata-only CAS commit narrowing
    * the carried schema; no data file rewritten — the bytes age out as
    * files naturally rewrite, because every copy-on-write projects to
    * the declared schema). Name-addressed tables get their catalog
    * schema synced in the same command. Nested paths are rejected;
    * IF EXISTS filters unknown names (all-unknown is a no-op returning
    * the head). Non-graft targets return unchanged. */
  def rewriteDropColumns(spark: SparkSession,
      dc: org.apache.spark.sql.catalyst.plans.logical.DropColumns)
      : LogicalPlan = {
    val target = dc.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case _ => return dc
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return dc)
    val names = dc.columnsToDrop.map {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFieldName
          if f.name.length == 1 => f.name.head
      case other => sys.error(
        "graft-manifest ALTER TABLE DROP COLUMNS supports top-level " +
          s"columns only; `${other.name.mkString(".")}` is nested")
    }
    val catalogIdent =
      if (target.sizeIs <= 2 && !target.head.startsWith("/")) Some(target)
      else None
    GraftDropColumnsCommand(path, catalogIdent, names, dc.ifExists)
  }

  /** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` on a graft-manifest
    * table → [[TableManifest.widenColumnType]] (a metadata-only CAS
    * commit retyping the carried schema; old files' narrow physical type
    * up-casts at read, new appends write wide — the lakehouse
    * type-widening standard). Only the unit-preserving widens are
    * supported (integral → wider integral, float → double), so every
    * committed data-skipping stat stays sound — see the primitive's
    * scaladoc. Any OTHER alteration in the statement (nullability,
    * comment, position, defaults, nested paths) is rejected at planning;
    * non-graft targets return unchanged. Name-addressed tables get their
    * catalog schema synced in the same command. */
  def rewriteAlterColumns(spark: SparkSession,
      ac: org.apache.spark.sql.catalyst.plans.logical.AlterColumns)
      : LogicalPlan = {
    val target = ac.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case _ => return ac
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return ac)
    def reject(why: String): Nothing = sys.error(
      "graft-manifest ALTER TABLE ALTER COLUMN supports exactly " +
        s"`ALTER COLUMN <top-level column> TYPE <wider type>`; $why")
    val retypes = ac.specs.map { spec =>
      val name = spec.column.name match {
        case Seq(n) => n
        case parts => reject(s"`${parts.mkString(".")}` is nested")
      }
      if (spec.newNullability.nonEmpty) reject(s"`$name` changes nullability")
      if (spec.newComment.nonEmpty) reject(s"`$name` sets a comment")
      if (spec.newPosition.nonEmpty) reject(s"`$name` carries a position")
      if (spec.newDefaultExpression.nonEmpty || spec.dropDefault)
        reject(s"`$name` touches defaults")
      val dt = spec.newDataType.getOrElse(reject(s"`$name` changes no type"))
      name -> dt
    }
    val catalogIdent =
      if (target.sizeIs <= 2 && !target.head.startsWith("/")) Some(target)
      else None
    GraftAlterColumnTypeCommand(path, catalogIdent, retypes)
  }

  /** `ALTER TABLE t RENAME COLUMN a TO b` on a graft-manifest table →
    * [[TableManifest.renameColumn]] (a metadata-only CAS commit renaming
    * the carried schema and recording a column-mapping entry for the
    * files that still physically store the old name — reads group by
    * carried physical name and alias back, writes emit the new name;
    * see the primitive's scaladoc). Nested paths are rejected at
    * planning; name-addressed tables get their catalog schema synced in
    * the same command. Non-graft targets return unchanged. */
  def rewriteRenameColumn(spark: SparkSession,
      rc: org.apache.spark.sql.catalyst.plans.logical.RenameColumn)
      : LogicalPlan = {
    val target = rc.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case _ => return rc
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return rc)
    val from = rc.column.name match {
      case Seq(n) => n
      case parts => sys.error(
        "graft-manifest ALTER TABLE RENAME COLUMN supports top-level " +
          s"columns only; `${parts.mkString(".")}` is nested")
    }
    val catalogIdent =
      if (target.sizeIs <= 2 && !target.head.startsWith("/")) Some(target)
      else None
    GraftRenameColumnCommand(path, catalogIdent, from, rc.newName)
  }

  /** `SHOW PARTITIONS t` on a graft-manifest table → the DISTINCT
    * hive-segment prefixes of the head manifest's names (Spark's own
    * row convention, `k=v[/k2=v2]`), straight from one head read — no
    * filesystem listing. Stock Spark would reject the statement (the
    * catalog entry declares no partitioning); non-graft targets return
    * unchanged so every other SHOW PARTITIONS keeps Spark's behavior.
    * A bare-partition-spec filter (`SHOW PARTITIONS t PARTITION (…)`)
    * is not supported — rejected with the plain form named. */
  def rewriteShowPartitions(spark: SparkSession,
      sp: org.apache.spark.sql.catalyst.plans.logical.ShowPartitions)
      : LogicalPlan = {
    val target = sp.table match {
      case ut: org.apache.spark.sql.catalyst.analysis.UnresolvedTable =>
        ut.multipartIdentifier
      case _ => return sp
    }
    val path = GraftTables.graftPath(spark, target).getOrElse(return sp)
    // PARTITION (k=v[, …]) filters the listing to partitions whose
    // segments carry every named value (hive-escaped, so the SQL
    // spelling matches the directory form) — Spark's own semantics
    val filter = sp.pattern.map {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedPartitionSpec =>
        u.spec.map { case (k, v) =>
          k.toLowerCase -> org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.escapePathName(v)
        }
      case other => sys.error(
        s"graft-manifest SHOW PARTITIONS: unsupported filter shape $other")
    }
    GraftShowPartitionsCommand(path, filter.getOrElse(Map.empty))
  }

  /** `SELECT … FROM t VERSION AS OF v / TIMESTAMP AS OF ts` on a
    * graft-manifest table → the SAME pinned snapshot the reader options
    * hit ([[graft.sources.ManifestTableProvider]] resolves version,
    * schema, and file inventory from ONE manifest body). Non-graft
    * time travel returns unchanged (Spark owns its own error).
    * Resolution happens here — at parse — because stock
    * `V2SessionCatalog` rejects time travel before any injected
    * resolution rule could see the node. */
  def rewriteTimeTravel(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tt @ RelationTimeTravel(ur: UnresolvedRelation, ts, version) =>
        GraftTables.graftPath(spark, ur.multipartIdentifier) match {
          case None => tt
          case Some(path) =>
            val m = new util.HashMap[String, String]()
            m.put("path", path)
            version.foreach { v =>
              v.trim.toLongOption.getOrElse(sys.error(
                s"graft-manifest VERSION AS OF takes a numeric version, got '$v'"))
              m.put("versionAsOf", v.trim)
            }
            ts.foreach { e =>
              m.put("timestampAsOf", timestampAsOfMillis(e).toString)
            }
            val provider = new graft.sources.ManifestTableProvider
            val schema =
              provider.inferSchema(new CaseInsensitiveStringMap(m))
            DataSourceV2Relation.create(
              provider.getTable(schema, Array.empty, m), None, None)
        }
    }

  /** Evaluate a `TIMESTAMP AS OF` expression to epoch millis: an
    * INTEGRAL literal is epoch millis directly (the provider's
    * `timestampAsOf` option contract — a seconds interpretation via
    * Spark's long→timestamp cast would silently shift the pin by 1000×);
    * anything else folds through a timestamp cast in the session zone
    * (so `'2024-01-10 00:00:00'` and `TIMESTAMP '…'` behave like every
    * other SQL timestamp). Non-literals (e.g. current_timestamp()) are
    * rejected — a time-travel pin must be a stable value, not one that
    * moves between parse and execution. */
  private def timestampAsOfMillis(e: Expression): Long = {
    if (!e.resolved || !e.foldable) sys.error(
      s"graft-manifest TIMESTAMP AS OF takes a literal timestamp, got `${e.sql}`")
    e.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        e.eval() match {
          case b: java.lang.Byte => b.longValue()
          case s: java.lang.Short => s.longValue()
          case i: java.lang.Integer => i.longValue()
          case l: java.lang.Long => l.longValue()
          case _ => sys.error(
            s"graft-manifest TIMESTAMP AS OF: cannot read `${e.sql}`")
        }
      case _ =>
        val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
        val micros = Cast(e, TimestampType, Some(zone)).eval() match {
          case l: java.lang.Long => l.longValue()
          case _ => sys.error(
            s"graft-manifest TIMESTAMP AS OF: cannot read `${e.sql}` as a timestamp")
        }
        Math.floorDiv(micros, 1000L)
    }
  }
}

/** SQL `UPDATE` on a graft-manifest table → [[TableManifest.updateWhere]]
  * (stats-pruned, file-granular copy-on-write). Returns the committed
  * version — deterministic for scripted fixtures, and the natural "did
  * it commit" answer for an operator. */
case class GraftUpdateCommand(path: String,
    sets: Seq[(String, Column)], condition: Option[Column])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // an UPDATE on an untracked dir converts it in place first — the
    // same posture as INSERT/DELETE (the provider's ensureTracked rule)
    if (TableManifest.read(spark, path).isEmpty) TableManifest.init(spark, path)
    // prune ranges derived HERE, against the head this update executes
    // on: the unit-kind check compares the condition's literals to the
    // CURRENT declared column types, so a schema change landing between
    // parse and execution can never prune in stale units (tables without
    // a declared schema get no pruning — conservative; updateWhere's
    // exact victim scan owns correctness either way)
    val declared = org.apache.spark.sql.types.StructType(
      TableManifest.readSchema(spark, path).map(_.fields)
        .getOrElse(Array.empty) ++
        TableManifest.readPartitionSchema(spark, path).map(_.fields)
          .getOrElse(Array.empty))
    val ranges = condition.map(c =>
      GraftDmlRewrite.pruneRanges(ColumnBridge.expression(c), declared))
      .getOrElse(Seq.empty)
    Seq(Row(TableManifest.updateWhere(spark, path, sets, condition, ranges)))
  }
}

/** SQL `ALTER TABLE … ADD COLUMNS` on a graft-manifest table →
  * [[TableManifest.addColumns]], plus a catalog data-schema sync for
  * name-addressed tables (the stored catalog schema is what Spark hands
  * the provider as the user schema on later resolutions — leaving it
  * stale would hide the new column from `SELECT *` and fail INSERTs that
  * carry it). Returns the committed version. */
case class GraftAddColumnsCommand(path: String,
    catalogIdent: Option[Seq[String]],
    fields: Seq[org.apache.spark.sql.types.StructField])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TableManifest.addColumns(spark, path, fields)
    catalogIdent.foreach { parts =>
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return Seq(Row(v))
      }
      val widened = TableManifest.readSchema(spark, path).getOrElse(
        sys.error(s"graft-manifest ALTER TABLE: $path lost its schema " +
          "between the commit and the catalog sync"))
      spark.sessionState.catalog.alterTableDataSchema(ident, widened)
    }
    Seq(Row(v))
  }
}

/** SQL `ALTER TABLE … DROP COLUMNS` on a graft-manifest table →
  * [[TableManifest.dropColumns]], plus a catalog data-schema sync for
  * name-addressed tables (the AddColumns rationale: a stale catalog
  * schema would keep serving — and let INSERTs carry — the dropped
  * column). Returns the committed version (the unchanged head for an
  * all-unknown IF EXISTS). */
case class GraftDropColumnsCommand(path: String,
    catalogIdent: Option[Seq[String]], cols: Seq[String],
    ifExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // carried schema, falling back to the merged scan schema on
    // pre-schema manifests — IF EXISTS must see the REAL columns, or it
    // would silently no-op a drop that should bootstrap-and-narrow
    val present = TableManifest.readSchema(spark, path)
      .orElse(scala.util.Try(
        TableManifest.readTable(spark, path).schema).toOption)
      .map(_.fieldNames.toSeq).getOrElse(Seq.empty)
    val effective =
      if (!ifExists) cols
      else cols.filter(c => present.exists(_.equalsIgnoreCase(c)))
    val v =
      if (effective.isEmpty) // IF EXISTS and nothing matches: no-op
        TableManifest.read(spark, path).map(_._1).getOrElse(sys.error(
          s"ALTER TABLE DROP COLUMNS: $path is not manifest-tracked"))
      else TableManifest.dropColumns(spark, path, effective)
    catalogIdent.foreach { parts =>
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return Seq(Row(v))
      }
      val narrowed = TableManifest.readSchema(spark, path).getOrElse(
        sys.error(s"graft-manifest ALTER TABLE: $path lost its schema " +
          "between the commit and the catalog sync"))
      // full-metadata alterTable, not alterTableDataSchema: the latter
      // hard-rejects any narrowing ("we don't support dropping columns
      // yet" — a guard for formats whose files ARE the schema; ours is
      // manifest-declared, so the narrowed schema is the truth)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      spark.sessionState.catalog.alterTable(meta.copy(schema = narrowed))
    }
    Seq(Row(v))
  }
}

/** SQL `ALTER TABLE … ALTER COLUMN … TYPE` on a graft-manifest table →
  * [[TableManifest.widenColumnType]] per column, plus a catalog schema
  * sync for name-addressed tables (full-metadata alterTable, the
  * DropColumns posture — alterTableDataSchema hard-rejects type changes
  * for formats whose files ARE the schema; ours is manifest-declared).
  * Returns the last committed version. */
case class GraftAlterColumnTypeCommand(path: String,
    catalogIdent: Option[Seq[String]],
    retypes: Seq[(String, org.apache.spark.sql.types.DataType)])
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // ALL-OR-NOTHING in ONE commit: every spec validates against the
    // same head snapshot and the fully-folded schema lands in a single
    // CAS commit — a concurrent schema change between per-column commits
    // can no longer leave the statement partially applied (the conflict
    // retries the whole statement inside widenColumnTypes)
    val v = TableManifest.widenColumnTypes(spark, path, retypes)
    catalogIdent.foreach { parts =>
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return Seq(Row(v))
      }
      val widened = TableManifest.readSchema(spark, path).getOrElse(
        sys.error(s"graft-manifest ALTER TABLE: $path lost its schema " +
          "between the commit and the catalog sync"))
      // keep any name-carried partition columns the catalog schema serves
      val partCols = TableManifest.readPartitionSchema(spark, path)
        .map(_.fields.toSeq).getOrElse(Seq.empty)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      val served = org.apache.spark.sql.types.StructType(
        widened.fields ++ partCols.filterNot(p =>
          widened.fieldNames.exists(_.equalsIgnoreCase(p.name))))
      spark.sessionState.catalog.alterTable(meta.copy(schema = served))
    }
    Seq(Row(v))
  }
}

/** SQL `ALTER TABLE … RENAME COLUMN … TO …` on a graft-manifest table →
  * [[TableManifest.renameColumn]], plus a catalog schema sync for
  * name-addressed tables (full-metadata alterTable, the AlterColumnType
  * posture — alterTableDataSchema hard-rejects renames for formats whose
  * files ARE the schema; ours is manifest-declared with a column
  * mapping). Returns the committed version. */
case class GraftRenameColumnCommand(path: String,
    catalogIdent: Option[Seq[String]], from: String, to: String)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val v = TableManifest.renameColumn(spark, path, from, to)
    catalogIdent.foreach { parts =>
      val ident = parts match {
        case Seq(t) => TableIdentifier(t)
        case Seq(db, t) => TableIdentifier(t, Some(db))
        case _ => return Seq(Row(v))
      }
      val renamed = TableManifest.readSchema(spark, path).getOrElse(
        sys.error(s"graft-manifest ALTER TABLE: $path lost its schema " +
          "between the commit and the catalog sync"))
      val partCols = TableManifest.readPartitionSchema(spark, path)
        .map(_.fields.toSeq).getOrElse(Seq.empty)
      val meta = spark.sessionState.catalog.getTableMetadata(ident)
      val served = org.apache.spark.sql.types.StructType(
        renamed.fields ++ partCols.filterNot(p =>
          renamed.fieldNames.exists(_.equalsIgnoreCase(p.name))))
      spark.sessionState.catalog.alterTable(meta.copy(schema = served))
    }
    Seq(Row(v))
  }
}

/** `SHOW PARTITIONS [PARTITION (k=v, …)]` on a graft-manifest table:
  * the live partitions are the distinct directory prefixes of the head
  * manifest's file names — metadata the table already carries, served
  * without touching the filesystem — filtered to those carrying every
  * `k=v` of the optional spec (hive-escaped values, case-insensitive
  * keys). Sorted for determinism (Spark's own convention). */
case class GraftShowPartitionsCommand(path: String,
    filter: Map[String, String] = Map.empty)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("partition",
      org.apache.spark.sql.types.StringType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val (_, files) = TableManifest.read(spark, path).getOrElse(
      sys.error(s"SHOW PARTITIONS: $path is not manifest-tracked"))
    files.flatMap { n =>
      val segs = n.split('/').dropRight(1).toSeq
      if (segs.isEmpty) None else Some(segs)
    }.distinct // Seq equality — Array.distinct compares by REFERENCE and
               // duplicated every partition holding more than one file
      .filter(segs => filter.forall { case (k, v) =>
        segs.exists { seg =>
          seg.split("=", 2) match {
            case Array(sk, sv) => sk.toLowerCase == k && sv == v
            case _ => false
          }
        }
      })
      .map(_.mkString("/")).sorted.map(Row(_))
  }
}

/** SQL `MERGE INTO` (whole-row upsert shape) on a graft-manifest table →
  * [[TableManifest.mergeByKey]]. The source plan is analyzed at run time
  * (the CreateViewCommand pattern), so views/subqueries/CTE sources all
  * work; mergeByKey's own guards (schema equality, key uniqueness and
  * non-null) stay the single source of merge-contract truth. */
case class GraftMergeCommand(path: String, keyCol: String,
    source: LogicalPlan) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("version",
      org.apache.spark.sql.types.LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    // a MERGE into an untracked dir converts it in place first — the
    // same posture as INSERT/DELETE (the provider's ensureTracked rule)
    if (TableManifest.read(spark, path).isEmpty) TableManifest.init(spark, path)
    Seq(Row(TableManifest.mergeByKey(spark, path, keyCol,
      DatasetBridge.ofRows(spark, source))))
  }
}
