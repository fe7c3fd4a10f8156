package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator surface — the (c) rung of the extension ladder
  * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
  * `SparkSessionExtensions.injectPlannerStrategy`): TOP-K PER GROUP without
  * a sort.
  *
  * The stock plan for `row_number() OVER (PARTITION BY g ORDER BY o) <= k`
  * shuffles EVERY row to its group's reducer and sorts there (Spark 3.5's
  * WindowGroupLimit trims some rows pre-shuffle but keeps the full sort
  * machinery). This operator replaces the whole pattern with two bounded
  * heaps around one exchange:
  *
  *   GraftTopK(final)            — k-heap per group over candidates
  *     └ Exchange hash(g)        — carries ≤ k rows per (group × partition)
  *        └ GraftTopK(partial)   — k-heap per group per input partition
  *
  * At 100 TB the exchange carries O(groups × partitions × k) rows instead
  * of O(n), and nothing is ever sorted — per-row cost is one heap probe
  * (O(log k) only on the ≤ k·groups rows that displace a candidate). Heap
  * contents are order-agnostic, so results are deterministic iff the
  * SortOrder is total per group (give it a tiebreaker column — the same
  * contract every judged window query already observes). */
case class TopKPerGroup(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topK requires k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as the two-phase heap pair; EnsureRequirements
  * inserts the hash exchange between them (final demands clustering on the
  * group keys, partial accepts any distribution). */
object GraftTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      GraftTopKExec(g, o, k, partial = false,
        GraftTopKExec(g, o, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GraftTopKExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))
  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val sortE = ordering
    val childOutput = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // generated comparator for the requested SortOrder; "first k under
      // this ordering" = top-k, so the heap's max (its head) is the
      // current worst candidate and the eviction target
      val ord = RowOrdering.create(sortE, childOutput)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < limit) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue(); heap.enqueue(row.copy())
            }
          case None =>
            val heap =
              scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }
  }
}

/** Public entry: top-k rows per group under (column, ascending?) orderings.
  * Name-resolved against the frame's analyzed output, then handed to the
  * planner as the custom logical node. */
object TopK {
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    // runtime-registry path (mirrors VectorOps.ensureRegistered): sessions
    // built without GraftExtensions still plan the node — idempotent, and
    // harmless beside the injected copy (a strategy that matched first
    // wins; both produce the identical exec pair)
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftTopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftTopKStrategy
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output
      .find(_.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"topK: column '$n' not in ${plan.output.map(_.name).mkString(", ")}"))
    val ordering = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), ordering, k, plan))
  }
}
