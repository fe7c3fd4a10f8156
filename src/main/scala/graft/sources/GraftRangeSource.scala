package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read connector demonstrating the reference's storage-layer
  * contract Spark-natively (SURVEY.md §2 A2/A3, §7.4 stretch): Astro prunes
  * HBase regions from rowkey predicates and pushes filters into region scans
  * [ref*: …/hbase/CriticalPoint.scala, ScanPredClassifier.scala — mount
  * empty, public-knowledge citation per SURVEY.md §0]. Here the "regions" are
  * key ranges of a deterministic generated table:
  *
  *   k in [0, rows);  v = (k * 2654435761) % 1000;  tag = 'r' || (k % 97)
  *
  * - `SupportsPushDownFilters`: accepts =, >, >=, <, <= and BETWEEN-shaped
  *   And/conjuncts on the key column `k`; everything else stays residual.
  * - `planInputPartitions`: slices the key space into `slices` regions and
  *   emits only those overlapping the pushed key bounds (partition pruning —
  *   visible in explain/logs as fewer input partitions).
  * - `SupportsPushDownRequiredColumns`: generates only requested columns.
  * - `SupportsPushDownAggregates`: PARTIAL count/min/max/sum (with optional
  *   group-by on plain columns) computed inside the scan — each partition
  *   emits one pre-aggregated row per group instead of its raw rows, and
  *   Spark's final aggregate merges the partials. This is the faithful
  *   modern analogue of the reference's coprocessor-side partial
  *   aggregation (SURVEY.md §2 A5): the row-count crossing the
  *   "storage/compute" boundary drops from O(rows) to O(groups ×
  *   partitions), exactly what the region-server coprocessor bought. The
  *   pushdown declares itself partial (`supportCompletePushDown` = false),
  *   so correctness never depends on partition layout.
  *
  * The generator formula is mirrored in the DuckDB oracle via generate_series,
  * so this connector is correctness-gated like every other operator.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = properties.getOrDefault("rows", "100000").toLong
    val slices = properties.getOrDefault("slices", "16").toInt
    require(rows >= 0, s"graft_range: rows must be >= 0, got $rows")
    require(slices > 0, s"graft_range: slices must be > 0, got $slices")
    new GraftRangeTable(rows, slices)
  }
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))

  def valueOf(k: Long): Long = (k * 2654435761L) % 1000L
  def tagOf(k: Long): String = "r" + (k % 97L)
}

final class GraftRangeTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(rows, slices)
}

/** One pushed aggregate: op ∈ count_star|count|min|max|sum, col its input
  * column ("" for count_star). */
final case class GraftAggCall(op: String, col: String) {
  def name: String = if (col.isEmpty) op else s"${op}_$col"
}

final class GraftRangeScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
  with SupportsPushDownLimit with SupportsPushDownTopN {

  private var lo: Long = 0L              // inclusive pushed key lower bound
  private var hi: Long = rows            // exclusive pushed key upper bound
  private var pushed: Array[Filter] = Array.empty
  private var hadResidual = false
  private var required: StructType = GraftRangeSource.schema
  private var aggGroups: Seq[String] = Nil
  private var aggCalls: Seq[GraftAggCall] = Nil
  private var aggPushed = false

  /** Saturating x+1 so Long.MaxValue bounds can't wrap negative. */
  private def succ(x: Long): Long = if (x == Long.MaxValue) Long.MaxValue else x + 1

  /** Key-bound extraction — the CriticalPoint analogue for one key column. */
  private def tryPush(f: Filter): Boolean = f match {
    case EqualTo("k", x: Number)            => lo = math.max(lo, x.longValue()); hi = math.min(hi, succ(x.longValue())); true
    case GreaterThan("k", x: Number)        =>
      // k > MaxValue is unsatisfiable: empty the range rather than wrap
      if (x.longValue() == Long.MaxValue) { lo = hi } else lo = math.max(lo, x.longValue() + 1); true
    case GreaterThanOrEqual("k", x: Number) => lo = math.max(lo, x.longValue()); true
    case LessThan("k", x: Number)           => hi = math.min(hi, x.longValue()); true
    case LessThanOrEqual("k", x: Number)    => hi = math.min(hi, succ(x.longValue())); true
    case And(l, r)                          => val a = tryPush(l); val b = tryPush(r); a && b
    case IsNotNull("k")                     => true // k is never null
    case _                                  => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(tryPush)
    pushed = accepted
    hadResidual = residual.nonEmpty
    residual // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT pushdown: keys generate in order, so the first `limit` surviving
    * rows are exactly the key range [lo, lo+limit) — truncate the range and
    * the scan reads ≤limit keys no matter how large the table. Declared
    * PARTIAL (Spark keeps its own Limit above — harmless over ≤limit rows),
    * and refused when a residual filter exists: rows dropped ABOVE the scan
    * would starve a truncated range. */
  override def pushLimit(limit: Int): Boolean = {
    if (hadResidual || aggPushed || limit < 0) return false
    hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
    true
  }
  override def isPartiallyPushed(): Boolean = true

  /** Top-N pushdown (ORDER BY k [ASC|DESC] LIMIT n): the n smallest keys
    * are [lo, lo+n), the n largest [hi-n, hi) — same range truncation, so
    * a top-n over a petabyte key space touches n keys. Spark's sort+limit
    * stay above (partial), ordering other than plain `k` is refused. */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder], limit: Int): Boolean = {
    if (hadResidual || aggPushed || limit < 0 || orders.length != 1) return false
    val o = orders.head
    val byK = o.expression() match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("k"))
      case _ => false
    }
    if (!byK) return false
    import org.apache.spark.sql.connector.expressions.SortDirection
    o.direction() match {
      case SortDirection.ASCENDING =>
        hi = math.min(hi, if (lo > Long.MaxValue - limit) Long.MaxValue else lo + limit)
      case SortDirection.DESCENDING =>
        lo = math.max(lo, if (hi < Long.MinValue + limit) Long.MinValue else hi - limit)
    }
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Always partial: each partition ships per-group partials and Spark's
    * final aggregate merges them, so the result is independent of how the
    * key space happens to be sliced. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean = false

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def colOf(e: V2Expression): Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head).filter(GraftRangeSource.schema.fieldNames.contains)
      case _ => None
    }
    val groups = aggregation.groupByExpressions.toSeq.map(colOf)
    if (groups.exists(_.isEmpty)) return false
    val calls = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar                 => Some(GraftAggCall("count_star", ""))
      case c: Count if !c.isDistinct()  => colOf(c.column).map(GraftAggCall("count", _))
      case m: Min                       => colOf(m.column).map(GraftAggCall("min", _))
      case m: Max                       => colOf(m.column).map(GraftAggCall("max", _))
      // sum only over the numeric columns — a string sum has no partial type
      case s: Sum if !s.isDistinct()    =>
        colOf(s.column).filter(c => c == "k" || c == "v").map(GraftAggCall("sum", _))
      case _                            => None
    }
    if (calls.isEmpty || calls.exists(_.isEmpty)) return false
    aggGroups = groups.map(_.get)
    aggCalls = calls.map(_.get)
    aggPushed = true
    true
  }

  override def build(): Scan =
    if (aggPushed) new GraftRangeAggScan(rows, slices, lo, hi, aggGroups, aggCalls)
    else new GraftRangeScan(rows, slices, lo, hi, required)
}

final class GraftRangeScan(rows: Long, slices: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch
  with SupportsReportStatistics with SupportsRuntimeFiltering {

  // runtime-narrowed key bounds (see filter below); start at the
  // compile-time pushed bounds
  @volatile private var rlo: Long = lo
  @volatile private var rhi: Long = hi

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range rows=$rows keyBounds=[$rlo,$rhi) slices=$slices"

  /** Post-pushdown statistics: row count and bytes for the PRUNED range,
    * not the whole table — so a key-bounded slice of an arbitrarily large
    * keyed table is correctly seen as broadcast-able by the join planner
    * (the CBO leverage Astro got from HBase region metadata). ~21 bytes
    * per generated row: two longs + the short tag. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, rhi - rlo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 21L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
    // EXACT column stats — the generator's value law is closed-form
    // (k unique over the pruned range; v = hash(k) mod 1000; tag has 97
    // arms), so the CBO sees true NDV/bounds with zero metadata reads.
    override def columnStats(): java.util.Map[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
      def cs(ndv: Long, mn: Option[Long], mx: Option[Long]) =
        new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
          override def distinctCount(): java.util.OptionalLong =
            java.util.OptionalLong.of(ndv)
          override def min(): java.util.Optional[Object] =
            mn.map(v => java.util.Optional.of(Long.box(v).asInstanceOf[Object]))
              .getOrElse(java.util.Optional.empty[Object]())
          override def max(): java.util.Optional[Object] =
            mx.map(v => java.util.Optional.of(Long.box(v).asInstanceOf[Object]))
              .getOrElse(java.util.Optional.empty[Object]())
        }
      val out = new java.util.HashMap[NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
      if (n > 0) {
        import org.apache.spark.sql.connector.expressions.Expressions
        out.put(Expressions.column("k"), cs(n, Some(rlo), Some(rhi - 1)))
        out.put(Expressions.column("v"),
          cs(math.min(n, 1000L), Some(0L), Some(999L)))
        out.put(Expressions.column("tag"), cs(math.min(n, 97L), None, None))
      }
      out
    }
  }

  /** RUNTIME filtering (the DSv2 form of dynamic partition pruning, and
    * the closest modern analogue of Astro's runtime critical-point region
    * pruning): after a joined build side materializes, Spark hands the
    * scan an IN-list of its join keys; the key range narrows to the list's
    * [min, max] envelope BEFORE planInputPartitions runs, so whole regions
    * of the key space are never read. Rows outside the exact IN-set still
    * generate inside the envelope — the join above discards them, so the
    * narrowing is purely an optimization and can never change results. */
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("k"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("k", values) if values != null && values.nonEmpty =>
      val longs = values.collect { case n: Number => n.longValue() }
      if (longs.length == values.length) {
        rlo = math.max(rlo, longs.min)
        rhi = math.min(rhi, if (longs.max == Long.MaxValue) Long.MaxValue
          else longs.max + 1)
      }
    case _ => () // unknown runtime filter: keep the static bounds (safe)
  }

  /** Region pruning: only slices overlapping the (possibly runtime-
    * narrowed) key range survive. */
  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by step).flatMap { start =>
      val end = math.min(start + step, rows)
      val s = math.max(start, rlo)
      val e = math.min(end, rhi)
      if (s < e) Some(GraftRangePartition(s, e): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required.fieldNames)
}

final case class GraftRangePartition(start: Long, end: Long) extends InputPartition

/** Aggregate-pushdown scan: output schema is group-by columns followed by
  * one partial column per aggregate (positional contract with Spark's
  * V2ScanRelationPushDown), and each partition's reader emits one row per
  * group — the coprocessor-style partial aggregation. */
final class GraftRangeAggScan(rows: Long, slices: Int, lo: Long, hi: Long,
    groups: Seq[String], calls: Seq[GraftAggCall]) extends Scan with Batch {

  private def colType(c: String): DataType =
    GraftRangeSource.schema(c).dataType

  override def readSchema(): StructType = StructType(
    groups.map(g => StructField(g, colType(g), nullable = false)) ++
      calls.map { c =>
        val t = c.op match {
          case "count_star" | "count" | "sum" => LongType
          case _                              => colType(c.col)
        }
        StructField(c.name, t, nullable = false)
      })

  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range rows=$rows keyBounds=[$lo,$hi) slices=$slices " +
      s"PushedAggregation: [${calls.map(_.name).mkString(", ")}] " +
      s"GroupBy: [${groups.mkString(", ")}]"

  /** Same region pruning as the row scan. */
  override def planInputPartitions(): Array[InputPartition] = {
    val step = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by step).flatMap { start =>
      val end = math.min(start + step, rows)
      val s = math.max(start, lo)
      val e = math.min(end, hi)
      if (s < e) Some(GraftRangePartition(s, e): InputPartition) else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeAggReaderFactory(groups.toArray, calls.toArray)
}

final class GraftRangeAggReaderFactory(groups: Array[String],
    calls: Array[GraftAggCall]) extends PartitionReaderFactory {

  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private def valueOf(col: String, k: Long): Any = col match {
        case "k"   => k
        case "v"   => GraftRangeSource.valueOf(k)
        case "tag" => GraftRangeSource.tagOf(k)
      }
      // Hash aggregation over this partition's generated rows. Group count
      // is bounded (≤97 tags × slice) so the map stays tiny; a real
      // connector would run the same loop inside the storage engine.
      private val acc =
        scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
      private var k = gp.start
      while (k < gp.end) {
        val key = groups.toSeq.map(valueOf(_, k))
        val a = acc.getOrElseUpdate(key, Array.fill[Any](calls.length)(null))
        var i = 0
        while (i < calls.length) {
          val c = calls(i)
          a(i) = (c.op, a(i)) match {
            case ("count_star" | "count", prev) =>
              (if (prev == null) 0L else prev.asInstanceOf[Long]) + 1L
            case ("sum", prev) =>
              (if (prev == null) 0L else prev.asInstanceOf[Long]) +
                valueOf(c.col, k).asInstanceOf[Long]
            case ("min", null) => valueOf(c.col, k)
            case ("min", prev) => (valueOf(c.col, k), prev) match {
              case (x: Long, p: Long)     => math.min(x, p)
              case (x: String, p: String) => if (x < p) x else p
            }
            case ("max", null) => valueOf(c.col, k)
            case ("max", prev) => (valueOf(c.col, k), prev) match {
              case (x: Long, p: Long)     => math.max(x, p)
              case (x: String, p: String) => if (x > p) x else p
            }
          }
          i += 1
        }
        k += 1
      }
      private val it = acc.iterator
      private var cur: (Seq[Any], Array[Any]) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = {
        def catalyst(v: Any): Any = v match {
          case s: String => UTF8String.fromString(s)
          case other     => other
        }
        InternalRow.fromSeq((cur._1 ++ cur._2.toSeq).map(catalyst))
      }
      override def close(): Unit = ()
    }
  }
}

final class GraftRangeReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      // r21: per-ordinal generator tags resolved once per reader; get()
      // fills a primitive while-loop into GenericInternalRow — the old
      // fromSeq path allocated a Seq, a per-row closure frame and a
      // wrapped-array copy for every generated row (same rewrite the kv
      // file reader got in r20).
      private val tags: Array[Int] = cols.map {
        case "k" => 0
        case "v" => 1
        case _   => 2 // "tag"
      }
      private val nOut = tags.length
      // r21 follow-up: ONE mutable row reused across generated rows (the
      // kv reader's discipline) — long ordinals are SET, never boxed
      private val mrow =
        new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
          tags.toSeq.map {
            case 2 => org.apache.spark.sql.types.StringType
              : org.apache.spark.sql.types.DataType
            case _ => org.apache.spark.sql.types.LongType
              : org.apache.spark.sql.types.DataType
          })
      private var k = gp.start - 1
      override def next(): Boolean = { k += 1; k < gp.end }
      override def get(): InternalRow = {
        var i = 0
        while (i < nOut) {
          tags(i) match {
            case 0 => mrow.setLong(i, k)
            case 1 => mrow.setLong(i, GraftRangeSource.valueOf(k))
            case _ =>
              mrow.update(i, UTF8String.fromString(GraftRangeSource.tagOf(k)))
          }
          i += 1
        }
        mrow
      }
      override def close(): Unit = ()
    }
  }
}
