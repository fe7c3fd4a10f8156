package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
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
  // groupExprs may be EMPTY: global top-k — one partial k-heap per input
  // partition, one final heap behind an AllTuples exchange that carries
  // ≤ k rows per partition. The same shape as TakeOrderedAndProject but
  // heap-per-partition instead of per-partition sort: nothing is ever
  // sorted, per-row cost is a heap probe.
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

/** Two-phase bounded-heap exec with BOUNDED MEMORY at adversarial group
  * cardinality (`spark.graft.topk.maxGroupsPerPartition`, default 65536
  * live heaps per partition):
  *
  *  - PARTIAL: once the cap is hit, rows of NEW groups stream straight to
  *    the exchange unfiltered (existing heaps keep trimming). Partial is an
  *    optimization only — its contract is "superset of the final top-k
  *    candidates" — so passthrough is always correct; the exchange just
  *    carries more rows for the overflow groups.
  *  - FINAL must be exact, so it SPILLS: at the cap, the heap map's entries
  *    are sorted by group-key bytes and written to a temp run file, the map
  *    is cleared, and at end-of-input all runs plus the in-memory map merge
  *    k-way by key (equal keys re-merge their ≤ k-row heaps). Peak memory
  *    is O(cap × k) rows plus O(runs × k) during the merge, never
  *    O(groups × k) — the HashAggregate-style spill discipline this
  *    operator previously lacked. */
case class GraftTopKExec(groupExprs: Seq[Expression], ordering: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples) // global: one final heap
    else Seq(ClusteredDistribution(groupExprs))
  override protected def withNewChildInternal(newChild: SparkPlan): GraftTopKExec =
    copy(child = newChild)

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] = Map(
    "numSpills" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of final-phase heap spills"),
    "numPassthroughRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "partial-phase rows passed through at group cap"))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val sortE = ordering
    val childOutput = child.output
    val limit = k
    val isPartial = partial
    val maxGroups = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.graft.topk.maxGroupsPerPartition", "65536").toInt
    val spillMetric = longMetric("numSpills")
    val passMetric = longMetric("numPassthroughRows")
    child.execute().mapPartitions { iter =>
      import scala.jdk.CollectionConverters._
      // spill hygiene under EARLY STOP (limit/take) or task failure: run
      // files and their open streams are normally reclaimed when the merge
      // exhausts them, but a partially-consumed iterator would leak both —
      // the completion listener sweeps whatever is still registered
      val liveSpills =
        java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
      val liveStreams =
        java.util.concurrent.ConcurrentHashMap.newKeySet[java.io.Closeable]()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          liveStreams.iterator().asScala.foreach(s =>
            try s.close() catch { case _: java.io.IOException => () })
          liveSpills.iterator().asScala
            .foreach(java.nio.file.Files.deleteIfExists(_))
        })
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      // identity projection for spilling: heap rows are whatever the child
      // emitted; the spill format needs UnsafeRow bytes
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(a => a: Expression), childOutput)
      // generated comparator for the requested SortOrder; "first k under
      // this ordering" = top-k, so the heap's max (its head) is the
      // current worst candidate and the eviction target
      val ord = RowOrdering.create(sortE, childOutput)
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      val spills = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      def push(heap: scala.collection.mutable.PriorityQueue[InternalRow],
          row: InternalRow): Unit = {
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      def newHeap(row: InternalRow, key: UnsafeRow): Unit = {
        val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
        heap.enqueue(row.copy())
        heaps.put(key.copy(), heap)
      }
      // live map as (key bytes, rows) entries, sorted by key bytes — the
      // run order every spill file shares, so equal keys align in the merge
      def sortedEntries: Seq[(Array[Byte], Seq[InternalRow])] =
        heaps.entrySet().iterator().asScala
          .map(e => (e.getKey.getBytes, e.getValue.toSeq))
          .toSeq.sortBy(_._1)(TopK.BytesOrdering)
      def spill(): Unit = {
        val f = java.nio.file.Files.createTempFile("graft_topk_spill", ".bin")
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          java.nio.file.Files.newOutputStream(f)))
        try sortedEntries.foreach { case (kb, rows) =>
          out.writeInt(kb.length); out.write(kb)
          out.writeInt(rows.length)
          rows.foreach { r =>
            val b = toUnsafe(r).getBytes
            out.writeInt(b.length); out.write(b)
          }
        } finally out.close()
        spills += f
        liveSpills.add(f)
        heaps.clear()
        spillMetric += 1
      }
      // overflow handling differs per phase (see class doc); flatMap is
      // lazy, so the heap-contents tail below only materializes after the
      // input is fully consumed
      val during = iter.flatMap { row =>
        val key = keyProj(row)
        val existing = heaps.get(key)
        if (existing != null) { push(existing, row); Nil }
        else if (heaps.size() < maxGroups) { newHeap(row, key); Nil }
        else if (isPartial) {
          passMetric += 1
          Seq(row.copy()) // stream through; the final phase is exact
        } else { spill(); newHeap(row, key); Nil }
      }
      def tail(): Iterator[InternalRow] =
        if (spills.isEmpty)
          heaps.values().iterator().asScala.flatMap(_.iterator)
        else {
          // k-way merge of the sorted runs + the sorted live map: equal
          // keys re-merge their bounded heaps, so peak memory is
          // O(cap × k) live plus O(runs × k) per merged key
          val runs = spills.toSeq.map(f =>
            TopK.readRun(f, childOutput.length, liveSpills, liveStreams)) :+
            sortedEntries.iterator
          TopK.mergeRuns(runs, ord, limit)
        }
      during ++ tail()
    }
  }
}

/** Public entry: top-k rows per group under (column, ascending?) orderings.
  * Name-resolved against the frame's analyzed output, then handed to the
  * planner as the custom logical node. */
object TopK {
  /** Unsigned lexicographic byte order — any total order works for run
    * alignment as long as every writer and the merge use the same one. */
  private[plans] val BytesOrdering: Ordering[Array[Byte]] =
    (a: Array[Byte], b: Array[Byte]) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var r = 0
      while (r == 0 && i < n) {
        r = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
        i += 1
      }
      if (r != 0) r else java.lang.Integer.compare(a.length, b.length)
    }

  /** Stream a spill run back as (key bytes, rows ≤ k); the file is deleted
    * once exhausted. */
  private[plans] def readRun(f: java.nio.file.Path, nRowFields: Int,
      liveSpills: java.util.Set[java.nio.file.Path],
      liveStreams: java.util.Set[java.io.Closeable])
      : Iterator[(Array[Byte], Seq[InternalRow])] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      java.nio.file.Files.newInputStream(f)))
    liveStreams.add(in)
    new Iterator[(Array[Byte], Seq[InternalRow])] {
      private var nextKey: Array[Byte] = advanceKey()
      private def advanceKey(): Array[Byte] = {
        val lenOr = try in.readInt() catch { case _: java.io.EOFException => -1 }
        if (lenOr < 0) {
          in.close(); liveStreams.remove(in)
          java.nio.file.Files.deleteIfExists(f); liveSpills.remove(f)
          null
        } else {
          val kb = new Array[Byte](lenOr); in.readFully(kb); kb
        }
      }
      override def hasNext: Boolean = nextKey != null
      override def next(): (Array[Byte], Seq[InternalRow]) = {
        val key = nextKey
        val n = in.readInt()
        val rows = (0 until n).map { _ =>
          val len = in.readInt()
          val b = new Array[Byte](len); in.readFully(b)
          val r = new UnsafeRow(nRowFields)
          r.pointTo(b, len)
          r: InternalRow
        }
        nextKey = advanceKey()
        (key, rows)
      }
    }
  }

  /** K-way merge of key-sorted runs: pop every run head sharing the
    * smallest key, re-merge their bounded heaps, emit. */
  private[plans] def mergeRuns(
      runs: Seq[Iterator[(Array[Byte], Seq[InternalRow])]],
      ord: Ordering[InternalRow], limit: Int): Iterator[InternalRow] = {
    val heads: Array[(Array[Byte], Seq[InternalRow])] =
      runs.map(r => if (r.hasNext) r.next() else null).toArray
    new Iterator[Seq[InternalRow]] {
      override def hasNext: Boolean = heads.exists(_ != null)
      override def next(): Seq[InternalRow] = {
        var minKey: Array[Byte] = null
        heads.foreach { h =>
          if (h != null &&
            (minKey == null || BytesOrdering.compare(h._1, minKey) < 0))
            minKey = h._1
        }
        val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](ord)
        var i = 0
        while (i < heads.length) {
          val h = heads(i)
          if (h != null && BytesOrdering.compare(h._1, minKey) == 0) {
            h._2.foreach { row =>
              if (heap.size < limit) heap.enqueue(row)
              else if (ord.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row)
              }
            }
            heads(i) = if (runs(i).hasNext) runs(i).next() else null
          }
          i += 1
        }
        heap.toSeq
      }
    }.flatten
  }

  /** GLOBAL top-k: the `orderBy(...).limit(k)` shape without any sort —
    * partial k-heaps per partition, one final heap behind a single-
    * partition exchange carrying ≤ k rows per input partition. Same
    * determinism contract as perGroup: give the ordering a tiebreaker. */
  def global(df: DataFrame, orderCols: Seq[(String, Boolean)], k: Int): DataFrame =
    perGroup(df, Nil, orderCols, k)

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
