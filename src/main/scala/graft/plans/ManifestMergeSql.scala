package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{ManifestTable, ManifestTbl}

/** SQL `MERGE INTO` on the manifest store, routed onto the existing
  * merge-on-read commit ([[ManifestTable.mergeKeys]]) instead of Spark's
  * row-level rewrite — the manifest table deliberately does NOT implement
  * `SupportsRowLevelOperations`, because Spark's group-based rewrite is a
  * read-modify-WRITE-EVERYTHING plan, while the store's native merge
  * commits one version holding a delete entry + the replacement rows and
  * never touches existing data files (the Iceberg merge-on-read shape; at
  * 100 TB the difference between a request-sized commit and a table
  * rewrite).
  *
  * Injected as a POST-HOC resolution rule ([[graft.GraftExtensions]]):
  * Spark's own `RewriteMergeIntoTable` ignores non-row-level tables
  * (`MergeIntoTable.rewritable` is false), so by post-hoc time the
  * statement is fully resolved but un-rewritten, and without this rule
  * CheckAnalysis would reject it. The accepted shape is exactly what one
  * atomic upsert version can express:
  *
  * {{{
  *   MERGE INTO graft_cat.`/store` t USING src s
  *   ON t.key = s.key                       -- one integral equality
  *   WHEN MATCHED THEN UPDATE SET *         -- replacement = f(source)
  *   WHEN NOT MATCHED THEN INSERT *         -- same f — one row rule
  * }}}
  *
  * generalized to explicit assignment lists, provided the UPDATE and
  * INSERT assignments agree column-for-column and reference only source
  * attributes (a replacement row must be a pure function of the source —
  * `UPDATE SET cents = t.cents + s.cents` reads the matched target row,
  * which merge-on-read replacement cannot express; rejected loudly, with
  * the Scala `mergeKeys` + a pre-join as the documented alternative).
  * Clauses with extra conditions (`WHEN MATCHED AND …`) and
  * `WHEN NOT MATCHED BY SOURCE` are rejected for the same reason.
  */
case class ManifestMergeRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if m.resolved =>
      EliminateSubqueryAliases(m.targetTable) match {
        case r: DataSourceV2Relation =>
          r.table match {
            case t: ManifestTbl => rewrite(m, r, t.tablePath)
            case _ => plan
          }
        case _ => plan
      }
    case _ => plan
  }

  private def reject(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft manifest MERGE: $why — supported shape is ON t.intKey = " +
        "s.intKey WHEN MATCHED THEN UPDATE SET <exprs of source> WHEN NOT " +
        "MATCHED THEN INSERT <the same exprs>; for target-dependent " +
        "updates, pre-join in SQL and call ManifestTable.mergeKeys")

  private def rewrite(
      m: MergeIntoTable, target: DataSourceV2Relation, path: String): LogicalPlan = {
    if (m.withSchemaEvolution)
      reject("WITH SCHEMA EVOLUTION is not supported (manifest schema " +
        "evolution happens through widened appends)")
    if (m.notMatchedBySourceActions.nonEmpty)
      reject("WHEN NOT MATCHED BY SOURCE reads the target state")

    val targetOut = target.outputSet
    val sourceOut = m.sourceTable.outputSet

    // ON t.k = s.k — one integral equality across the two sides
    val (keyTarget, keySource) = m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if targetOut.contains(a) && sourceOut.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if targetOut.contains(a) && sourceOut.contains(b) => (a, b)
      case other => reject(s"merge condition must be one target-key = " +
        s"source-key equality, got: ${other.sql}")
    }

    val updateAssigns = m.matchedActions match {
      case Seq(UpdateAction(None, assigns, _)) => assigns
      case _ => reject("need exactly one unconditional WHEN MATCHED THEN UPDATE")
    }
    val insertAssigns = m.notMatchedActions match {
      case Seq(InsertAction(None, assigns)) => assigns
      case _ => reject("need exactly one unconditional WHEN NOT MATCHED THEN INSERT")
    }

    def byTargetCol(assigns: Seq[Assignment]): Map[String, Expression] =
      assigns.map {
        case Assignment(k: AttributeReference, v) if targetOut.contains(k) =>
          if (!v.references.subsetOf(sourceOut))
            reject(s"assignment to ${k.name} reads the target row (${v.sql})")
          if (!v.deterministic)
            reject(s"assignment to ${k.name} is nondeterministic (${v.sql})")
          k.name -> v
        case a => reject(s"unsupported assignment ${a.sql}")
      }.toMap

    val upd = byTargetCol(updateAssigns)
    val ins = byTargetCol(insertAssigns)
    val cols = target.output.map(_.name)
    if (upd.keySet != cols.toSet || ins.keySet != cols.toSet)
      reject("UPDATE and INSERT must assign every target column " +
        "(the store replaces whole rows)")
    cols.foreach { c =>
      if (!upd(c).semanticEquals(ins(c)))
        reject(s"UPDATE and INSERT disagree on column $c — one atomic " +
          "upsert version applies one row rule")
    }
    // the staged key must BE the join key, or matched rows would be
    // tombstoned under one key and re-inserted under another
    upd(keyTarget.name) match {
      case a: AttributeReference if a.semanticEquals(keySource) => ()
      case other => reject(s"key column ${keyTarget.name} must be assigned " +
        s"the ON condition's source key ${keySource.name}, got ${other.sql}")
    }

    // replacement rows = source projected through the (agreed) row rule,
    // in target column order under target names — mergeKeys validates
    // the schema and commits delete-entry + inserts as ONE version
    val projected = Project(
      cols.map(c => Alias(upd(c), c)()), m.sourceTable)
    ManifestMergeCommand(path, keyTarget.name, projected)
  }
}

/** The eagerly-executed command [[ManifestMergeRule]] rewrites to: stage
  * the projected source distributedly, commit one prior-only-delete +
  * inserts version. Runs through the same code path as the Scala API, so
  * ManifestMergeSpec's atomicity/sequencing pins cover the SQL surface
  * too.
  */
case class ManifestMergeCommand(
    path: String, keyCol: String, updates: LogicalPlan)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(updates)

  override def run(session: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.GraftPlanBridge.ofRows(session, updates)
    ManifestTable.mergeKeys(session, path, keyCol, df)
    Seq.empty
  }
}
