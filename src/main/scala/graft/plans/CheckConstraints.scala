package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** CHECK-constraint enforcement for graft kv catalog tables (SURVEY.md §2
  * A8) — the Delta `delta.constraints.*` shape on the `check.<name>` table
  * properties.
  *
  * Every BATCH write command against a constrained table — INSERT/append
  * and INSERT OVERWRITE (`AppendData`/`OverwriteByExpression`, wrapped at
  * analysis time by [[CheckConstraintRule]]) and row-level DML's
  * `ReplaceData`/`WriteDelta` (produced only by the OPTIMIZER's row-level
  * rewrite, so wrapped there by [[CheckConstraintDmlRule]]) — gets its
  * query wrapped in a Filter whose condition `assert_true`s each
  * constraint and then passes every row through. Rows are checked where
  * they are produced, inside the write's own plan, so enforcement adds no
  * extra pass and no shuffle at any scale; a violation fails the JOB
  * before the connector commits, so a constrained table can never publish
  * a violating row. NULL passes — standard SQL CHECK semantics
  * (`coalesce(cond, true)`). Checking the DML's FINAL row images (not the
  * statement text) covers UPDATE/MERGE assignments of violating values
  * for free, at whatever column subset the rewrite projects.
  *
  * Row-level commands may project only a subset of the data columns (a
  * pure position-DELETE carries no data at all): when a constraint
  * references a column the write's query does not output, the wrap is
  * skipped for that command — deletes cannot introduce violations, and
  * UPDATE/MERGE queries always carry the columns they assign.
  */
private[graft] object CheckConstraints {

  val Marker = "graft_check"

  /** Driver-side: the full guard resolved by the session analyzer and
    * bound BY ORDINAL to `schema` — for enforcement points outside a plan
    * rewrite (the STREAMING write path, where no V2WriteCommand exists at
    * analysis time to wrap). The bound expression ships to executors; each
    * task compiles it once ([[org.apache.spark.sql.catalyst.expressions.Predicate]])
    * and evaluates per row — a violation raises with the constraint name
    * before the row reaches the writer. */
  def boundGuard(session: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cs: Map[String, String]): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, RuntimeReplaceable}
    val attrs = schema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())
    val resolved = session.sessionState.analyzer.execute(
      Project(Seq(Alias(guard(session, cs), "g")()), LocalRelation(attrs)))
      .asInstanceOf[Project].projectList.head
      .asInstanceOf[Alias].child
      .transformUp { case r: RuntimeReplaceable => r.replacement }
    resolved.transform {
      case a: AttributeReference =>
        BoundReference(attrs.indexWhere(_.exprId == a.exprId),
          a.dataType, a.nullable)
    }
  }

  /** The writer-level guard for a WRITE SCHEMA: a plain CHECK whose
    * referenced columns the writer does not carry is SKIPPED — the
    * omitted (evolved) column reads NULL for those rows and NULL passes
    * SQL CHECK semantics, the same projection-subset rule the plan rules
    * apply — so a legal narrower-schema append keeps working. A
    * GENERATED column's derived `__gen__<col>` check (the reserved
    * internal prefix — a user `check.gen_*` property is a plain CHECK,
    * and setChecks refuses user names claiming the reserved spelling)
    * with missing refs
    * REFUSES instead: rows written without the generated column would
    * read NULL and silently violate the standing invariant. None =
    * nothing applies to this write. */
  def writerGuard(session: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      cs: Map[String, String]): Option[Expression] = {
    if (cs.isEmpty) return None
    val resolver = session.sessionState.conf.resolver
    def covered(expr: String): Boolean =
      session.sessionState.sqlParser.parseExpression(expr)
        .collect { case u: UnresolvedAttribute => u.nameParts.last }
        .forall(n => schema.fieldNames.exists(resolver(_, n)))
    val applicable = cs.filter { case (name, expr) =>
      val ok = covered(expr)
      require(ok || !name.startsWith("__gen__"),
        s"graft_kv: this write's schema omits columns that generated-" +
          s"column check '$name' ($expr) depends on — generated columns " +
          "must be written together with their sources")
      ok
    }
    if (applicable.isEmpty) None
    else Some(boundGuard(session, schema, applicable))
  }

  /** The wrap-once guard: our Filter's condition carries the marker in its
    * assert_true message literal (stable across resolution iterations and
    * optimizer passes — the literal survives function resolution). */
  def alreadyGuarded(q: LogicalPlan): Boolean = q match {
    case f: Filter => f.condition.exists {
      case l: Literal if l.value != null =>
        l.value.toString.startsWith(Marker)
      case _ => false
    }
    case _ => false
  }

  private def sq(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** One always-true (or throwing) conjunct per constraint:
    * `assert_true(coalesce(CAST((expr) AS BOOLEAN), true), msg) IS NULL`
    * — NULL-passing CHECK semantics, a violation raises with the
    * constraint's name and text in the message. Parsed unresolved. */
  def guard(session: SparkSession, cs: Map[String, String]): Expression =
    cs.toSeq.sortBy(_._1).map { case (name, expr) =>
      session.sessionState.sqlParser.parseExpression(
        s"assert_true(coalesce(CAST(($expr) AS BOOLEAN), true), " +
          s"'$Marker: CHECK constraint `${sq(name)}` violated: " +
          s"${sq(expr)}') IS NULL")
    }.reduce(And)

  def constraintsOf(w: V2WriteCommand): Map[String, String] = w.table match {
    case r: DataSourceV2Relation => r.table match {
      case t: graft.sources.GraftKvTable => t.checkConstraints
      // the row-level rewrite wraps the target in RowLevelOperationTable
      // (private[sql] — unwrapped reflectively)
      case rl if rl.getClass.getName.endsWith("RowLevelOperationTable") =>
        rl.getClass.getMethod("table").invoke(rl) match {
          case t: graft.sources.GraftKvTable => t.checkConstraints
          case _ => Map.empty[String, String]
        }
      case _ => Map.empty[String, String]
    }
    case _ => Map.empty[String, String]
  }

  /** Does the write's query output every column the guard references?
    * (Case-insensitivity per session resolver.) */
  def coversRefs(session: SparkSession, g: Expression,
      query: LogicalPlan): Boolean = {
    val refs = g.collect { case u: UnresolvedAttribute => u.nameParts.last }
    val resolver = session.sessionState.conf.resolver
    refs.forall(n => query.output.exists(a => resolver(a.name, n)))
  }
}

/** Analysis half: wraps `AppendData` / `OverwriteByExpression` (any
  * V2WriteCommand present at analysis time). The guard is left unresolved —
  * the analyzer's own fixed point binds its columns and functions. */
class CheckConstraintRule(session: SparkSession) extends Rule[LogicalPlan] {
  import CheckConstraints._
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case w: V2WriteCommand if w.query.resolved && !alreadyGuarded(w.query) =>
        val cs = constraintsOf(w)
        if (cs.isEmpty) w
        else {
          val g = guard(session, cs)
          if (coversRefs(session, g, w.query))
            w.withNewQuery(Filter(g, w.query)).asInstanceOf[LogicalPlan]
          else w // projection lacks a referenced column (pure delete)
        }
    }
}

/** Optimizer half: `ReplaceData` / `WriteDelta` exist only after the
  * optimizer's row-level rewrite, past the analyzer — so the guard is
  * resolved HERE by a mini analyzer pass over a LocalRelation carrying the
  * write query's own attributes (same exprIds), then spliced in resolved.
  * This checks the DML's final row images: updated rows carry their new
  * values, carried-over rows their old (clean) ones. */
class CheckConstraintDmlRule(session: SparkSession) extends Rule[LogicalPlan] {
  import CheckConstraints._
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case w: V2WriteCommand if w.query.resolved && !alreadyGuarded(w.query) =>
        val cs = constraintsOf(w)
        if (cs.isEmpty) w
        else {
          val g = guard(session, cs)
          if (!coversRefs(session, g, w.query)) w
          else {
            val resolved = session.sessionState.analyzer.execute(
              Project(Seq(Alias(g, "g")()), LocalRelation(w.query.output)))
              .asInstanceOf[Project].projectList.head
              .asInstanceOf[Alias].child
              // the ReplaceExpressions phase already ran: runtime-replace
              // assert_true (and anything else replaceable) here, or the
              // splice reaches execution un-loweable
              .transformUp {
                case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
                  r.replacement
              }
            w.withNewQuery(Filter(resolved, w.query)).asInstanceOf[LogicalPlan]
          }
        }
    }
}
