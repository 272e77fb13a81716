package graft.sources.v2

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.{coalesce, lit, not}
import org.apache.spark.sql.graftshim.Bridge

import graft.sources.GraftTable

/** Plain-SQL `UPDATE` / `MERGE INTO` / `DELETE FROM` for graft tables —
  * the analysis rule (injected by [[graft.GraftExtensions]]) that routes
  * the three row-level statements into [[GraftTable]]'s stats-pruned
  * touched-bucket copy-on-write engine, completing the SQL DML family
  * the DSv2 catalog exposes (INSERT/DELETE landed with the catalog; the
  * reference's lakehouse analog exposes the full Hudi/Delta SQL DML
  * surface — demo.ipynb cell 8's upsert pipeline is driven by exactly
  * these statements at production sites).
  *
  * Design note — why an analysis rule and not
  * `SupportsRowLevelOperations`: Spark's group-based row-level hook
  * rewrites the statement into a generic scan-union-ReplaceData plan
  * and hands the replacement rows to a NEW DSv2 batch write; the graft
  * engine already owns an oracle-verified rewrite (`GraftTable.update`/
  * `mergeInto`) that prunes to touched buckets via manifest stats,
  * enforces key/constraint invariants, and commits under OCC — the
  * Delta-style analysis routing (DeltaAnalysis does the same) reuses
  * that single write path instead of maintaining a second, parallel
  * distributed writer with identical semantics. The rewrite cost model
  * is unchanged either way: only buckets holding matching rows are
  * rewritten.
  *
  * Loud-or-safe contract: any construct the routing cannot express
  * EXACTLY — subqueries in conditions or values, non-key-equality merge
  * conditions, `WHEN NOT MATCHED BY SOURCE`, schema evolution, nested
  * -field assignments — fails the STATEMENT with a clear error before
  * any write starts. Never a partial or approximated update.
  */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(GraftTarget(table, _), assignments, condition) if u.resolved =>
      requireHead(table, "UPDATE")
      val set = assignments.map { a =>
        targetColumnName(a.key, "UPDATE SET") -> unresolved(a.value, "UPDATE SET value")
      }.toMap
      val cond = condition.map(unresolved(_, "UPDATE condition")).getOrElse(lit(true))
      GraftUpdateCommand(table.path, cond, set)

    case d @ DeleteFromTable(GraftTarget(table, _), condition) if d.resolved =>
      // DELETE already works through SupportsDelete for conditions that
      // translate to DSv1 filters; this route lifts that restriction —
      // GraftTable.deleteWhere takes an arbitrary Column (still loud on
      // subqueries), so e.g. `WHERE substr(status, 1, 1) = 'F'` deletes
      // instead of refusing. Same stats-pruned COW underneath.
      requireHead(table, "DELETE")
      GraftDeleteCommand(table.path, unresolved(condition, "DELETE condition"))

    case m @ MergeIntoTable(GraftTarget(table, tgtAttrs), source, cond,
        matchedActions, notMatchedActions, notMatchedBySource, withSchemaEvolution)
        if m.resolved =>
      requireHead(table, "MERGE INTO")
      translateMerge(table, tgtAttrs, source, cond, matchedActions, notMatchedActions,
        notMatchedBySource, withSchemaEvolution)
  }

  private def fail(msg: String): Nothing =
    throw new UnsupportedOperationException(s"graft SQL DML: $msg")

  private def requireHead(table: GraftV2Table, what: String): Unit =
    table.pinned.foreach { v =>
      fail(s"$what against ${table.path} VERSION AS OF $v — historical snapshots " +
        "are read-only (restoreTo makes a version current)")
    }

  /** Re-target a resolved expression at [[GraftTable]]'s snapshot frame:
    * attribute references become plain unresolved names (the snapshot
    * has the same flat columns). Subqueries refuse — the engine applies
    * conditions against its own pruned reads, where a captured subquery
    * plan would be re-executed out of context.
    */
  private def unresolved(e: Expression, what: String): Column = {
    e.foreach {
      case _: SubqueryExpression =>
        fail(s"$what contains a subquery — materialize it into a source table " +
          "first (MERGE), or use the GraftTable API")
      case _ => ()
    }
    Bridge.column(e.transform { case a: AttributeReference => UnresolvedAttribute.quoted(a.name) })
  }

  private def targetColumnName(key: Expression, what: String): String = key match {
    case a: AttributeReference => a.name
    case other => fail(s"$what must assign a top-level column, got $other " +
      "(nested-field assignment is not supported)")
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  private def translateMerge(table: GraftV2Table, tgtAttrs: Seq[AttributeReference],
                             source: LogicalPlan, cond: Expression,
                             matchedActions: Seq[MergeAction],
                             notMatchedActions: Seq[MergeAction],
                             notMatchedBySource: Seq[MergeAction],
                             withSchemaEvolution: Boolean): LogicalPlan = {
    // MERGE WITH SCHEMA EVOLUTION: by the time this rule sees a RESOLVED
    // plan, Spark 4.1's ResolveMergeIntoSchemaEvolution has already
    // routed the new source columns through GraftCatalog.alterTable →
    // GraftTable.addColumns (the same additive metadata-only widening
    // the keyed upsert uses) and reloaded the target relation — so the
    // new columns ARE target columns here and translate like any other.
    // Genuinely incompatible changes (type changes, NOT NULL, dropped-
    // ledger resurrections) refuse in alterTable/addColumns BEFORE any
    // data write; the evolution commit itself is additive metadata, so
    // a merge that later refuses leaves no partial DATA write.
    val keys = GraftTable.keyColumns(table.path)
    val tgtSet = AttributeSet(tgtAttrs)
    val srcSet = AttributeSet(source.output)

    // ON must be EXACTLY the record-key equalities: the engine's merge
    // is a keyed upsert (source rows hash to their target buckets by
    // key); any other join shape has no bucket-pruned meaning here
    val pairs = splitConjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tgtSet.contains(a) && srcSet.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if tgtSet.contains(a) && srcSet.contains(b) => (a, b)
      case other => fail(s"MERGE ON must be a conjunction of target-key = source-column " +
        s"equalities over the table's record key (${keys.mkString(", ")}); got: $other" +
        (if (other.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Cast]))
           " — a Cast here means the key types differ; cast the source column in the source query"
         else ""))
    }
    if (pairs.map(_._1.name).toSet != keys.toSet || pairs.size != keys.size)
      fail(s"MERGE ON must equate exactly the record key (${keys.mkString(", ")}); " +
        s"got equalities on (${pairs.map(_._1.name).mkString(", ")})")

    // source frame: key-paired columns renamed to the TARGET key names
    // (GraftTable.mergeInto addresses source keys by the target's
    // names); refuse when the rename would collide with an existing
    // unrelated source column
    val keyPair: Map[String, AttributeReference] = pairs.map(p => p._1.name -> p._2).toMap
    var sourceDf = Bridge.dataFrame(spark, source)
    val renames: Map[org.apache.spark.sql.catalyst.expressions.ExprId, String] =
      keyPair.collect { case (k, srcAttr) if srcAttr.name != k => srcAttr.exprId -> k }
    renames.foreach { case (_, k) =>
      if (source.output.count(a => a.name == k) > 0)
        fail(s"MERGE source already has a column named '$k' distinct from the one " +
          s"paired with target key '$k' in ON — alias it away in the source query")
    }
    keyPair.foreach { case (k, srcAttr) =>
      if (srcAttr.name != k) sourceDf = sourceDf.withColumnRenamed(srcAttr.name, k)
    }

    // expressions inside clauses reference both sides; re-target them
    // at mergeConditional's t/s-aliased join (renamed source columns
    // resolve under their new names)
    def sided(e: Expression, what: String): Column = {
      e.foreach {
        case _: SubqueryExpression =>
          fail(s"$what contains a subquery — materialize it into the source query")
        case _ => ()
      }
      Bridge.column(e.transform {
        case a: AttributeReference if tgtSet.contains(a) =>
          UnresolvedAttribute(Seq("t", a.name))
        case a: AttributeReference if srcSet.contains(a) =>
          UnresolvedAttribute(Seq("s", renames.getOrElse(a.exprId, a.name)))
        case a: AttributeReference =>
          fail(s"$what references $a, which is neither a target nor a source column")
      })
    }
    def holds(c: Option[Expression], what: String): Column =
      c.map(sided(_, what)).getOrElse(lit(true))

    // MATCHED clauses → mergeConditional's (delete, update) pair.
    // mergeConditional evaluates DELETE before UPDATE, so the SQL
    // clause ORDER is preserved exactly: update-first statements guard
    // the delete condition with NOT(update-condition).
    var matchedDelete: Option[Column] = None
    var matchedUpdate: Option[(Column, Map[String, Column])] = None
    def updateSet(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map { a =>
        targetColumnName(a.key, "MERGE UPDATE SET") ->
          sided(a.value, "MERGE UPDATE SET value")
      }.toMap
    matchedActions match {
      case Seq() => ()
      case Seq(DeleteAction(dc)) =>
        matchedDelete = Some(holds(dc, "WHEN MATCHED DELETE condition"))
      case Seq(UpdateAction(uc, as, _)) =>
        matchedUpdate = Some((holds(uc, "WHEN MATCHED UPDATE condition"), updateSet(as)))
      case Seq(DeleteAction(dc), UpdateAction(uc, as, _)) =>
        matchedDelete = Some(holds(dc, "WHEN MATCHED DELETE condition"))
        matchedUpdate = Some((holds(uc, "WHEN MATCHED UPDATE condition"), updateSet(as)))
      case Seq(UpdateAction(uc, as, _), DeleteAction(dc)) =>
        // SQL: first clause wins, so DELETE only fires when the UPDATE
        // condition does NOT hold; an unconditional update-first makes
        // the delete clause unreachable (dropped — exact semantics)
        matchedUpdate = Some((holds(uc, "WHEN MATCHED UPDATE condition"), updateSet(as)))
        uc match {
          case Some(u) =>
            matchedDelete = Some(holds(dc, "WHEN MATCHED DELETE condition") &&
              not(coalesce(sided(u, "WHEN MATCHED UPDATE condition"), lit(false))))
          case None => () // unreachable delete
        }
      case other => fail(s"at most one WHEN MATCHED UPDATE and one WHEN MATCHED DELETE " +
        s"are supported; got ${other.size} matched clauses")
    }

    // NOT MATCHED → insert condition + explicit per-column values.
    // ANSI semantics exactly: unassigned non-key columns insert NULL
    // (never the engine's source-same-name fallback); the key columns
    // MUST be assigned from the ON-paired source columns — an inserted
    // row is bucketed by its source key, so any other key value would
    // be placed wrong.
    var notMatchedInsert: Option[Column] = None
    var notMatchedInsertSet: Map[String, Column] = Map.empty
    notMatchedActions match {
      case Seq() => ()
      case Seq(InsertAction(ic, as)) =>
        notMatchedInsert = Some(holds(ic, "WHEN NOT MATCHED INSERT condition"))
        val assigned = as.map(a => targetColumnName(a.key, "MERGE INSERT") -> a.value).toMap
        keys.foreach { k =>
          assigned.get(k) match {
            case Some(v: AttributeReference) if keyPair(k).exprId == v.exprId => ()
            case Some(other) => fail(s"WHEN NOT MATCHED INSERT must assign key column " +
              s"'$k' the ON-paired source column (got $other) — inserted rows are " +
              "bucketed by the source key")
            case None => fail(s"WHEN NOT MATCHED INSERT must assign key column '$k' " +
              "(from the ON-paired source column)")
          }
        }
        val tgtFields = tgtAttrs.filterNot(a => keys.contains(a.name))
        notMatchedInsertSet = tgtFields.map { f =>
          assigned.get(f.name) match {
            case Some(v) => f.name -> sided(v, s"MERGE INSERT value for ${f.name}")
            case None => f.name -> lit(null) // ANSI: unassigned → NULL
          }
        }.toMap
      case Seq(_: InsertStarAction) =>
        fail("INSERT * did not expand during analysis — list the columns explicitly")
      case other => fail(s"exactly one WHEN NOT MATCHED INSERT clause is supported; " +
        s"got ${other.size}")
    }

    // NOT MATCHED BY SOURCE (SQL:2023) — target rows with no source
    // pair. The source side is all-NULL on these rows by construction,
    // so a condition/SET referencing a source column is refused rather
    // than silently evaluating to NULL. Same DELETE-before-UPDATE
    // engine precedence and the same clause-order guard as the matched
    // pair. Cost class stated where the engine pays it: these clauses
    // make the MERGE a full-table rewrite (every bucket may hold
    // unpaired rows) — the same cost Delta pays.
    var bySourceDelete: Option[Column] = None
    var bySourceUpdate: Option[(Column, Map[String, Column])] = None
    def tSided(e: Expression, what: String): Column = {
      e.foreach {
        case a: AttributeReference if srcSet.contains(a) =>
          fail(s"$what references source column '${a.name}' — on NOT MATCHED BY " +
            "SOURCE rows the source side is all-NULL; reference only target columns")
        case _ => ()
      }
      sided(e, what)
    }
    def tHolds(c: Option[Expression], what: String): Column =
      c.map(tSided(_, what)).getOrElse(lit(true))
    def bsUpdateSet(assignments: Seq[Assignment]): Map[String, Column] =
      assignments.map { a =>
        targetColumnName(a.key, "BY SOURCE UPDATE SET") ->
          tSided(a.value, "BY SOURCE UPDATE SET value")
      }.toMap
    notMatchedBySource match {
      case Seq() => ()
      case Seq(DeleteAction(dc)) =>
        bySourceDelete = Some(tHolds(dc, "BY SOURCE DELETE condition"))
      case Seq(UpdateAction(uc, as, _)) =>
        bySourceUpdate = Some((tHolds(uc, "BY SOURCE UPDATE condition"), bsUpdateSet(as)))
      case Seq(DeleteAction(dc), UpdateAction(uc, as, _)) =>
        bySourceDelete = Some(tHolds(dc, "BY SOURCE DELETE condition"))
        bySourceUpdate = Some((tHolds(uc, "BY SOURCE UPDATE condition"), bsUpdateSet(as)))
      case Seq(UpdateAction(uc, as, _), DeleteAction(dc)) =>
        // SQL first-clause-wins: DELETE fires only where the UPDATE
        // condition does NOT hold; unconditional update-first makes the
        // delete unreachable
        bySourceUpdate = Some((tHolds(uc, "BY SOURCE UPDATE condition"), bsUpdateSet(as)))
        uc match {
          case Some(u) =>
            bySourceDelete = Some(tHolds(dc, "BY SOURCE DELETE condition") &&
              not(coalesce(tSided(u, "BY SOURCE UPDATE condition"), lit(false))))
          case None => () // unreachable delete
        }
      case other => fail(s"at most one BY SOURCE UPDATE and one BY SOURCE DELETE " +
        s"are supported; got ${other.size} clauses")
    }

    GraftMergeCommand(table.path, sourceDf, matchedDelete, matchedUpdate,
      notMatchedInsert, notMatchedInsertSet, bySourceDelete, bySourceUpdate)
  }

  /** Matches a (possibly aliased) DSv2 relation over a graft table,
    * yielding the table and the relation's output attributes (the
    * exprIds action expressions reference the target through).
    */
  private object GraftTarget {
    def unapply(plan: LogicalPlan): Option[(GraftV2Table, Seq[AttributeReference])] =
      plan match {
        case SubqueryAlias(_, child) => unapply(child)
        case r: DataSourceV2Relation => r.table match {
          case t: GraftV2Table =>
            Some((t, r.output.collect { case a: AttributeReference => a }))
          case _ => None
        }
        case _ => None
      }
  }
}

/** `UPDATE graft.\`path\` SET … WHERE …` — executes
  * [[GraftTable.updateRetry]]: stats-pruned candidate buckets, rewrite
  * only buckets holding matching rows, OCC commit.
  */
case class GraftUpdateCommand(path: String, cond: Column,
                              set: Map[String, Column]) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftTable.updateRetry(sparkSession, path, cond, set)
    Seq.empty
  }
}

/** `DELETE FROM graft.\`path\` WHERE …` with an arbitrary (subquery-
  * free) condition — [[GraftTable.deleteWhereRetry]].
  */
case class GraftDeleteCommand(path: String, cond: Column) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftTable.deleteWhereRetry(sparkSession, path, cond)
    Seq.empty
  }
}

/** `MERGE INTO graft.\`path\` t USING src s ON t.key = s.key WHEN …` —
  * executes [[GraftTable.mergeIntoRetry]]: source keys hash to their
  * buckets, only those buckets join and rewrite, the clause family
  * applies in one codegen'd projection.
  */
case class GraftMergeCommand(path: String, source: org.apache.spark.sql.DataFrame,
                             matchedDelete: Option[Column],
                             matchedUpdate: Option[(Column, Map[String, Column])],
                             notMatchedInsert: Option[Column],
                             notMatchedInsertSet: Map[String, Column],
                             bySourceDelete: Option[Column] = None,
                             bySourceUpdate: Option[(Column, Map[String, Column])] = None)
    extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    GraftTable.mergeIntoRetry(sparkSession, path, source,
      matchedDelete, matchedUpdate, notMatchedInsert, notMatchedInsertSet,
      bySourceDelete, bySourceUpdate)
    Seq.empty
  }
}
