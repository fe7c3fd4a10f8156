package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LeafNode, LogicalPlan, Statistics, UnaryNode}
import org.apache.spark.sql.catalyst.plans.logical.statsEstimation.EstimationUtils
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** ANALYZE-to-CBO bridge for graft keyed tables (SURVEY.md §2 A8; the
  * HBaseCatalog-kept-stats-for-join-selection analogue, re-expressed as a
  * Catalyst extension).
  *
  * A MUTATED keyed table reads as its replay plan — base parquet under
  * filters (DELETE), projections (UPDATE/ADD/DROP), unions (INSERT/LOAD)
  * and anti-joins (MERGE). Spark's size-only estimation cannot see through
  * that shape: a DELETE that removed 99% of the rows still carries the full
  * base file size, so a table that became broadcast-small keeps planning as
  * a shuffle join. `ANALYZE TABLE` already computes the TRUE current row
  * count in one scan; this rule injects it where Spark's own join selection
  * reads statistics.
  *
  * Mechanics: [[GraftStatsNode]] is a pass-through unary node that reports
  * the analyzed Statistics; [[AnalyzeStatsRule]] (injected via
  * `injectPreCBORule`, i.e. after operator optimization — pushdown is
  * done — and before stats-dependent planning) wraps each maximal subtree
  * that reads exclusively from an analyzed table's files and has replay
  * shape (no aggregates, no non-anti joins, so a self-join of the table
  * annotates each side, never the join); [[GraftStatsStrategy]] plans the
  * node away as its child. Stale stats never fire: ANALYZE records the
  * mutation-log position it ran at, and a later DML drops the table out of
  * [[graft.ops.Ddl.cboStats]] (SHOW STATS flags it `stats_stale`).
  *
  * Unmutated tables are deliberately NOT annotated — a plain parquet scan's
  * file-size estimate is already sound, and rewriting every TPC-H scan's
  * estimate from rows × width would perturb working broadcast decisions.
  *
  * At cluster scale this is the pre-shuffle win AQE cannot give: AQE flips
  * to broadcast only after both sides' shuffle files are written, while a
  * statistics-driven initial plan never shuffles the big side at all.
  */
final case class GraftStatsNode(child: LogicalPlan, rowCount: Long)
  extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = Some(rowCount)
  override lazy val stats: Statistics = Statistics(
    sizeInBytes = EstimationUtils.getOutputSize(output, BigInt(rowCount)),
    rowCount = Some(BigInt(rowCount)))
  override protected def withNewChildInternal(newChild: LogicalPlan): GraftStatsNode =
    copy(child = newChild)
}

object GraftStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GraftStatsNode(child, _) => planLater(child) :: Nil
    case _                        => Nil
  }
}

final class AnalyzeStatsRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    val tables = graft.ops.Ddl.cboStats()
    if (tables.isEmpty) plan else annotate(plan, tables)
  }

  private def annotate(p: LogicalPlan,
      tables: Seq[(Set[String], Long)]): LogicalPlan =
    matchTable(p, tables) match {
      case Some(rows) => GraftStatsNode(p, rows)
      case None => p.withNewChildren(p.children.map(annotate(_, tables)))
    }

  /** The subtree is one analyzed table's replay (possibly under its own
    * pushed filters/projections) iff every leaf is a file relation over
    * that table's path set and the shape is replay-only: no aggregate, no
    * join other than the merge replay's LeftAnti. */
  private def matchTable(p: LogicalPlan,
      tables: Seq[(Set[String], Long)]): Option[Long] = {
    if (p.isInstanceOf[GraftStatsNode]) return None
    var paths = Set.empty[String]
    var ok = true
    p.foreach {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          paths ++= fs.location.rootPaths.map(_.toUri.getPath)
        case _ => ok = false
      }
      case _: GraftStatsNode => ok = false // already annotated below
      case _: LeafNode  => ok = false
      case j: Join if j.joinType != LeftAnti => ok = false
      case _: Aggregate => ok = false
      case _ => ()
    }
    if (!ok || paths.isEmpty) None
    else tables.collectFirst { case (ps, rows) if paths.subsetOf(ps) => rows }
  }
}
