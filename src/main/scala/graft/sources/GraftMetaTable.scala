package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Queryable METADATA TABLES (the Iceberg metadata-table UX):
  * `SELECT … FROM graft.ns.t.files | t.partitions | t.history` resolves
  * in the catalog by identifier suffix to a read-only relation derived
  * ENTIRELY from the manifest — zero data files are opened, so the
  * maintenance-dashboard join ("which partitions grew small files
  * today?") costs one JSON read however many petabytes the table holds.
  * Rows are materialized driver-side at resolution time (manifest-sized,
  * not data-sized) and served through a single input partition. */
final case class GraftMetaPartition(rows: Array[InternalRow])
  extends InputPartition

final class GraftMetaTable(tableName: String, metaSchema: StructType,
    rows: Seq[InternalRow]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = metaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = metaSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(GraftMetaPartition(rows.toArray))
        override def createReaderFactory(): PartitionReaderFactory =
          new PartitionReaderFactory {
            override def createReader(p: InputPartition)
                : PartitionReader[InternalRow] =
              new PartitionReader[InternalRow] {
                private val it =
                  p.asInstanceOf[GraftMetaPartition].rows.iterator
                private var cur: InternalRow = _
                override def next(): Boolean =
                  if (it.hasNext) { cur = it.next(); true } else false
                override def get(): InternalRow = cur
                override def close(): Unit = ()
              }
          }
      }
    }
}

object GraftMetaTable {
  private def utf(s: String): UTF8String =
    if (s == null) null else UTF8String.fromString(s)
  private def mapOf(m: Map[String, String]): ArrayBasedMapData = {
    val ks = m.keys.toArray.sorted
    new ArrayBasedMapData(
      new GenericArrayData(ks.map(k => utf(k).asInstanceOf[Any])),
      new GenericArrayData(ks.map(k => utf(m(k)).asInstanceOf[Any])))
  }

  /** The partition label a file's recorded tuple renders to — the SAME
    * format SHOW PARTITIONS prints, so `t.files` joins `t.partitions`
    * on it directly. */
  private def labelOf(stats: Map[String, (String, String)]): String = {
    val parts = stats.collect {
      case (k, (v, _)) if k.startsWith(GraftPartition.PartKey) =>
        k.stripPrefix(GraftPartition.PartKey) -> v
    }.toSeq.sortBy(_._1)
    if (parts.isEmpty) "<unpartitioned>"
    else parts.map { case (k, v) =>
      s"$k=${if (v == "\\N") "null" else v}" }.mkString("/")
  }

  val filesSchema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("epoch", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("delete_count", LongType, nullable = false),
    StructField("partition", StringType, nullable = false),
    StructField("min_values", MapType(StringType, StringType)),
    StructField("max_values", MapType(StringType, StringType))))

  /** One row per manifest entry — current base files, merge-on-read
    * deltas, and retained (CoW-superseded) history, tagged by `kind` so
    * a dashboard filters to the state it means. Per-column min/max ride
    * as maps (the Iceberg readable_metrics shape); partition-tuple keys
    * are excluded from the maps (they have their own column). */
  def files(m: GraftKvSink.Manifest): Seq[InternalRow] = {
    def statRow(name: String, kind: String, rows: Long, dels: Long)
        : InternalRow = {
      val st = m.stats.getOrElse(name, Map.empty)
      // only true per-column min/max entries belong in the maps: tuple
      // keys (part:) render in the partition column, and sketch entries
      // (hll:/cnt:/len:) are aggregate payloads, not value bounds — leaking
      // them would surface pseudo-columns with sketch blobs in the
      // readable-metrics maps
      val plain = st.filterNot { case (k, _) =>
        k.startsWith(GraftPartition.PartKey) ||
          k.startsWith(GraftKvSink.HllKey) ||
          k.startsWith(GraftKvSink.CntKey) ||
          k.startsWith(GraftKvSink.LenKey)
      }
      new GenericInternalRow(Array[Any](
        utf(name), utf(kind), GraftKvSink.epochOf(name), rows, dels,
        utf(labelOf(st)),
        mapOf(plain.map { case (k, (mn, _)) => k -> mn }),
        mapOf(plain.map { case (k, (_, mx)) => k -> mx })))
    }
    m.files.map { case (n, r) => statRow(n, "base", r, 0L) } ++
      m.deltas.map(d => statRow(d.name, "delta", d.inserts, d.deletes)) ++
      m.removed.map(r => statRow(r.name, "retained", r.rows, 0L))
  }

  val partitionsSchema: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("num_files", LongType, nullable = false),
    StructField("num_rows", LongType, nullable = false)))

  /** SHOW PARTITIONS as a relation: current base files aggregated by
    * their recorded tuple label. */
  def partitions(m: GraftKvSink.Manifest): Seq[InternalRow] =
    m.files.groupBy(f => labelOf(m.stats.getOrElse(f._1, Map.empty)))
      .toSeq.sortBy(_._1).map { case (label, fs) =>
        new GenericInternalRow(Array[Any](
          utf(label), fs.length.toLong, fs.map(_._2).sum))
      }

  val refsSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("epoch", LongType, nullable = false)))

  /** Named refs (tags + branches) as a relation — joinable against
    * `t.history` on epoch ("which commits does each tag pin?"). The
    * internal `__fork__` bookkeeping ref of a branch head's own manifest
    * is excluded: it is lineage plumbing, not a user-visible ref. */
  def refs(m: GraftKvSink.Manifest): Seq[InternalRow] =
    m.refs.toSeq.filterNot(_._1 == "__fork__").sortBy(_._1).map {
      case (n, (e, kind)) =>
        new GenericInternalRow(Array[Any](utf(n), utf(kind), e))
    }

  val historySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("rows_added", LongType, nullable = false),
    StructField("rows_deleted", LongType, nullable = false),
    StructField("commit_ts", TimestampType)))

  /** DESCRIBE HISTORY as a relation — the same epoch commit log, now
    * joinable (e.g. history ⋈ files on epoch: "what did commit N
    * physically add?"). */
  def history(dir: String): Seq[InternalRow] =
    GraftKvSink.history(dir).map { case (v, op, add, del, ts) =>
      new GenericInternalRow(Array[Any](
        v, utf(op), add, del,
        if (ts == null) null
        else org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(ts)))
    }
}
