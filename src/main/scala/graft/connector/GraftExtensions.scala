package graft.connector

import graft.table.{GraftTable, MergeDelete => GMergeDelete, MergeInsert => GMergeInsert, MergeUpdate => GMergeUpdate, MergeAction => GMergeAction}
import org.apache.spark.sql.{Column, Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.{EliminateSubqueryAliases, UnresolvedAttribute}
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Session extensions wiring SQL row-level DML onto graft tables:
  *
  * {{{
  *   spark.sql.extensions = graft.connector.GraftSparkSessionExtensions
  *
  *   UPDATE g.db.t SET qty = qty * 2 WHERE flag = 'R'
  *   MERGE INTO g.db.t t USING src s ON t.id = s.id
  *     WHEN MATCHED AND s.qty > 40 THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET *
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * (`DELETE FROM` needs no extension on copy-on-write tables —
  * GraftSparkTable implements SupportsDeleteV2 natively. Tables declaring
  * `write.delete.mode = merge-on-read` — the Iceberg property — have
  * their SQL DELETEs claimed here instead and routed to the engine's
  * MoR delete, which writes position-delete files, or deletion vectors
  * when `write.delete.format = deletion-vectors`.)
  *
  * A resolution rule claims resolved UpdateTable / MergeIntoTable plans
  * over graft relations before Spark's row-level-operation rewrites (which
  * require a full DSv2 BatchWrite) and maps them onto the engine's proven
  * copy-on-write mutations (`updateWhere` / `mergeApply`) — the same
  * extension-library pattern Iceberg uses for its SQL surface. Spark's
  * analyzer has already resolved and type-validated every expression and
  * expanded `SET *` / `INSERT *`; execution re-binds them by NAME against
  * the engine's scan (target columns bare, source columns under
  * `GraftTable.MergeSourcePrefix`).
  */
class GraftSparkSessionExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => GraftDmlRewrite)
    // view READ substitution over GraftCatalog's ViewCatalog ...
    ext.injectResolutionRule(_ => GraftViewRewrite)
    // ... and view DDL claimed at PARSE time: in-tree Spark routes view
    // commands only to the session catalog, and the throwing rule sits
    // ahead of injected resolution rules in the Resolution batch
    ext.injectParser((_, parser) => new GraftViewSqlParser(parser))
  }
}

object GraftDmlRewrite extends Rule[LogicalPlan] {

  private def graftLocation(table: LogicalPlan)
      : Option[(String, graft.table.MetadataIo)] =
    EliminateSubqueryAliases(table) match {
      case r: DataSourceV2Relation => r.table match {
        // the io rides along so REST-catalog tables keep committing
        // through the REST service, not around it
        case g: GraftSparkTable => Some((g.location, g.metadataIo))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(tbl, assignments, cond) if u.resolved =>
      graftLocation(tbl).fold(u: LogicalPlan) { case (loc, io) =>
        GraftUpdateCommand(loc,
          assignments.map(a => (attrName(a.key), a.value)), cond, io) }
    case d @ DeleteFromTable(tbl, cond) if d.resolved =>
      // claim ONLY merge-on-read tables; copy-on-write DELETEs keep the
      // native SupportsDeleteV2 path (metadata-only whole-file drops)
      graftLocation(tbl).fold(d: LogicalPlan) { case (loc, io) =>
        // graftLocation already proved this IS a graft table — a
        // metadata-load failure here is real (corruption, races) and
        // must propagate, not silently reroute a merge-on-read table's
        // DELETE to the copy-on-write path
        val mor = GraftTable.load(org.apache.spark.sql.SparkSession.active,
            loc).metadata.properties
          .exists(_.get(GraftTable.DeleteModeProp)
            .contains("merge-on-read"))
        if (mor) GraftMorDeleteCommand(loc, cond, io) else d
      }
    case m @ MergeIntoTable(tgt, src, mergeCond, matched, notMatched,
        notMatchedBySource, withSchemaEvolution) if m.resolved =>
      graftLocation(tgt).fold(m: LogicalPlan) { case (loc, io) =>
        if (withSchemaEvolution) throw new UnsupportedOperationException(
          "MERGE ... WITH SCHEMA EVOLUTION is not supported on graft tables")
        GraftMergeCommand(loc, src, mergeCond, matched, notMatched,
          notMatchedBySource, io)
      }
  }

  private[connector] def attrName(e: Expression): String = e match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"unsupported assignment target $other (nested fields not supported)")
  }
}

/** Eager `UPDATE` on a graft table: delegates to the engine's
  * file-granular CoW `updateWhere`.
  */
case class GraftUpdateCommand(location: String,
    assignments: Seq[(String, Expression)],
    condition: Option[Expression],
    io: graft.table.MetadataIo = graft.table.FileMetadataIo)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.load(spark, location, io)
    def toCol(e: Expression): Column = Bridge.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    val cond = condition.map(toCol).getOrElse(lit(true))
    val asg = assignments.map { case (n, v) => n -> toCol(v) }.toMap
    // Iceberg's write.update.mode: merge-on-read tables take the
    // row-delta path (position deletes/DVs + new versions) — a wide
    // UPDATE never rewrites data files
    if (t.metadata.properties.exists(_.get(GraftTable.UpdateModeProp)
        .contains("merge-on-read")))
      t.updateWhereMoR(cond, asg)
    else t.updateWhere(cond, asg)
    Seq.empty
  }
}

/** Eager merge-on-read `DELETE FROM` on a graft table declaring
  * `write.delete.mode = merge-on-read`: delegates to the engine's
  * `deleteWhereMoR` (position-delete files, or one merged deletion
  * vector per affected file under `write.delete.format =
  * deletion-vectors`) — frequent small SQL DELETEs cost O(deleted
  * rows), never a file rewrite.
  */
case class GraftMorDeleteCommand(location: String,
    condition: Expression,
    io: graft.table.MetadataIo = graft.table.FileMetadataIo)
    extends LeafRunnableCommand {

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.load(spark, location, io)
    val cond = Bridge.column(condition.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    t.deleteWhereMoR(cond)
    Seq.empty
  }
}

/** Eager `MERGE INTO` on a graft table: delegates to the engine's
  * generalized `mergeApply`. The ON clause must be a conjunction of
  * `target.col = source.col` equalities (the shape the engine's
  * key-envelope file pruning understands).
  */
case class GraftMergeCommand(location: String, source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction],
    io: graft.table.MetadataIo = graft.table.FileMetadataIo)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftTable.load(spark, location, io)
    val srcDf = Bridge.ofRows(spark, source)
    val srcAttrs = source.outputSet
    // re-bind by name: target columns bare, source columns prefixed (the
    // engine aliases the source side under MergeSourcePrefix pre-join)
    def toCol(e: Expression): Column = Bridge.column(e.transform {
      case a: AttributeReference if srcAttrs.contains(a) =>
        UnresolvedAttribute.quoted(GraftTable.MergeSourcePrefix + a.name)
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keys: Seq[(String, String)] = conjuncts(mergeCondition).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if srcAttrs.contains(r) && !srcAttrs.contains(l) => (l.name, r.name)
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if srcAttrs.contains(l) && !srcAttrs.contains(r) => (r.name, l.name)
      case other => throw new UnsupportedOperationException(
        "MERGE ON must be a conjunction of target.col = source.col " +
          s"equalities; got $other")
    }
    def assignmentsOf(asg: Seq[Assignment]): Map[String, Column] =
      asg.map(a => GraftDmlRewrite.attrName(a.key) -> toCol(a.value)).toMap
    def convert(a: MergeAction): GMergeAction = a match {
      case u: UpdateAction =>
        GMergeUpdate(u.condition.map(toCol), assignmentsOf(u.assignments))
      case d: DeleteAction => GMergeDelete(d.condition.map(toCol))
      case i: InsertAction =>
        GMergeInsert(i.condition.map(toCol), assignmentsOf(i.assignments))
      case other => throw new UnsupportedOperationException(
        s"unsupported MERGE action $other")
    }
    // Iceberg's write.merge.mode: merge-on-read tables commit a
    // row-delta (deletes + new versions/inserts) instead of rewriting
    // every affected file
    val mor = t.metadata.properties
      .exists(_.get(GraftTable.MergeModeProp).contains("merge-on-read"))
    val apply = if (mor) t.mergeApplyMoR _ else t.mergeApply _
    apply(srcDf, keys,
      matchedActions.map(convert),
      notMatchedActions.map(convert).map(_.asInstanceOf[GMergeInsert]),
      notMatchedBySourceActions.map(convert))
    Seq.empty
  }
}
