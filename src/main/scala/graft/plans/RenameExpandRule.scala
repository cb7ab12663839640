package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{DvReads, RenameReads}

/** Post-hoc resolution rule that expands every READ relation of a
  * graft-manifest table with renamed columns into the union-of-groups
  * plan [[graft.sources.RenameReads.expandIfRenamed]] builds — the SQL
  * half of metadata-only `ALTER TABLE … RENAME COLUMN` (the library half
  * is `TableManifest.readTable`'s own grouping). Read positions only:
  *
  *  - a V2 WRITE command's TARGET relation is left untouched (`INSERT
  *    INTO t` must keep binding the writable table — writes emit the
  *    LOGICAL names, which is what shrinks the carrier sets over time),
  *    while its QUERY subtree is expanded (`INSERT INTO other SELECT …
  *    FROM renamed_t` reads correctly);
  *  - `DeleteFromTable` is left whole: graft DELETE routes through the
  *    provider's `SupportsDelete` on the un-expanded relation (the
  *    condition shapes it accepts never scan the table);
  *  - subquery expressions are expanded recursively (a scalar subquery
  *    over a renamed table is still a read).
  *
  * Idempotent: the group relations the expansion mints carry no rename
  * entries, so a second pass leaves them alone. */
case class RenameExpandRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = expand(plan)

  private def expand(p: LogicalPlan): LogicalPlan = {
    val shaped = p match {
      case w: V2WriteCommand => w.withNewQuery(expand(w.query))
      case d: DeleteFromTable => d
      case rel: DataSourceV2Relation =>
        // deletion vectors take priority: the library plan DvReads
        // splices handles renames too, while the rename group-union
        // alone would serve deleted rows
        DvReads.expandIfDv(rel)
          .orElse(RenameReads.expandIfRenamed(rel)).getOrElse(rel)
      case other => other.mapChildren(expand)
    }
    shaped.transformExpressions {
      case se: SubqueryExpression => se.withNewPlan(expand(se.plan))
    }
  }
}
