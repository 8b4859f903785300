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

/** SQL `UPDATE` on the manifest store — the third row-level statement,
  * routed onto the SAME one-version merge commit: an update of a bounded
  * key set is a read of the matched rows, the assignments applied, and a
  * [[ManifestTable.mergeKeys]] upsert (tombstone + replacement in one
  * version). Unlike MERGE (whose replacements must be pure functions of
  * the source), UPDATE assignments MAY read the target row
  * (`SET v = v + 1`) — the matched set is materialized first, bounded by
  * the key predicate.
  *
  * The WHERE must bound the matched set by one integral-key equality /
  * IN (conjuncts intersect): an unbounded `UPDATE t SET …` is a
  * TABLE REWRITE at 100 TB and is rejected loudly — that operation
  * should be an explicit maintenance decision
  * ([[ManifestTable.compactDeletes]]-shaped), not a statement that
  * looks request-sized. The key column itself cannot be reassigned
  * (the tombstone and the replacement must agree on the key).
  */
case class ManifestUpdateRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u: UpdateTable if u.resolved =>
      EliminateSubqueryAliases(u.table) match {
        case r: DataSourceV2Relation =>
          r.table match {
            case t: ManifestTbl => rewrite(u, r, t.tablePath)
            case _ => plan
          }
        case _ => plan
      }
    case _ => plan
  }

  private def reject(why: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft manifest UPDATE: $why — supported shape is UPDATE t SET " +
        "<col = expr, …> WHERE <intKey IN (…) | intKey = v>; an unbounded " +
        "update is a table rewrite and must be an explicit maintenance job")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def rewrite(
      u: UpdateTable, target: DataSourceV2Relation, path: String): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, In}
    import org.apache.spark.sql.types.{IntegerType, LongType}

    val cond = u.condition.getOrElse(reject("no WHERE clause"))
    val targetOut = target.outputSet

    // type coercion may wrap either IN side in a WIDENING integral cast
    // (int literals vs a bigint key column) — equality through such a
    // cast is equality on the underlying values, so look through it
    def stripCast(e: Expression): Expression = e match {
      case c: Cast if c.dataType == LongType || c.dataType == IntegerType =>
        stripCast(c.child)
      case other => other
    }
    def keyLit(l: Expression): Option[Long] = l match {
      case e if e.foldable && e.dataType == LongType =>
        Option(e.eval()).map(_.asInstanceOf[Long])
      case e if e.foldable && e.dataType == IntegerType =>
        Option(e.eval()).map(_.asInstanceOf[Int].toLong)
      case _ => None
    }
    def integralAttr(a: Expression): Option[AttributeReference] = stripCast(a) match {
      case ar: AttributeReference if targetOut.contains(ar) &&
        (ar.dataType == LongType || ar.dataType == IntegerType) => Some(ar)
      case _ => None
    }
    // every conjunct must bound the SAME integral key column
    val perConjunct: Seq[(AttributeReference, Set[Long])] = conjuncts(cond).map {
      case In(a, vs) =>
        val ar = integralAttr(a).getOrElse(reject(s"non-key IN (${a.sql})"))
        val keys = vs.map(keyLit)
        if (keys.exists(_.isEmpty)) reject("non-literal IN list")
        (ar, keys.flatten.toSet)
      case EqualTo(a, l) if integralAttr(a).isDefined && keyLit(l).isDefined =>
        (integralAttr(a).get, Set(keyLit(l).get))
      case EqualTo(l, a) if integralAttr(a).isDefined && keyLit(l).isDefined =>
        (integralAttr(a).get, Set(keyLit(l).get))
      case other => reject(s"WHERE conjunct is not an integral-key " +
        s"equality/IN: ${other.sql}")
    }
    val keyAttr = perConjunct.head._1
    if (!perConjunct.forall(_._1.semanticEquals(keyAttr)))
      reject("WHERE conjuncts bound different columns")

    val cols = target.output.map(_.name)
    val byName: Map[String, Expression] = u.assignments.map {
      case Assignment(k: AttributeReference, v) if targetOut.contains(k) =>
        if (!v.deterministic) reject(s"nondeterministic assignment to ${k.name}")
        k.name -> v
      case a => reject(s"unsupported assignment ${a.sql}")
    }.toMap
    byName.get(keyAttr.name).foreach {
      case a: AttributeReference if a.semanticEquals(keyAttr) => () // k = k
      case other => reject(s"key column ${keyAttr.name} cannot be " +
        s"reassigned (got ${other.sql})")
    }

    // matched rows → assignments applied (unassigned columns pass
    // through) → the same one-version tombstone+replacement commit
    val attrByName = target.output.map(a => a.name -> a).toMap
    val projected = Project(
      cols.map(c => Alias(byName.getOrElse(c, attrByName(c)), c)()),
      Filter(cond, u.table))
    ManifestMergeCommand(path, keyAttr.name, projected)
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
