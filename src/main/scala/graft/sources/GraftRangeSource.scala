package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
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

final class GraftRangeScanBuilder(rows: Long, slices: Int)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo: Long = 0L              // inclusive pushed key lower bound
  private var hi: Long = rows            // exclusive pushed key upper bound
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeSource.schema

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
    residual // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GraftRangeScan(rows, slices, lo, hi, required)
}

final class GraftRangeScan(rows: Long, slices: Int, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_range rows=$rows keyBounds=[$lo,$hi) slices=$slices"

  /** Region pruning: only slices overlapping the pushed key range survive. */
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
    new GraftRangeReaderFactory(required.fieldNames)
}

final case class GraftRangePartition(start: Long, end: Long) extends InputPartition

final class GraftRangeReaderFactory(cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var k = gp.start - 1
      override def next(): Boolean = { k += 1; k < gp.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map {
          case "k"   => k
          case "v"   => GraftRangeSource.valueOf(k)
          case "tag" => UTF8String.fromString(GraftRangeSource.tagOf(k))
        })
      override def close(): Unit = ()
    }
  }
}
