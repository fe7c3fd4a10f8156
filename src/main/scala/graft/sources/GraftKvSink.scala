package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 WRITE connector — the sink-side twin of GraftRangeSource's
  * read contract, and the Spark-native analogue of the reference's bulk-load
  * write path (Astro wrote sorted HFiles per region and registered them
  * atomically [ref*: …/hbase/execution/hbaseCommands.scala — mount empty,
  * public-knowledge citation per SURVEY.md §0]). What it demonstrates, at
  * deployment shape:
  *
  *  - `SupportsWrite` / `WriteBuilder` / `BatchWrite` / `DataWriterFactory`:
  *    one `DataWriter` per partition TASK writes an uncommitted
  *    `part-<partition>-<task>.tmp` file and reports it in its commit
  *    message; nothing is visible until the driver-side `commit()`.
  *  - Commit protocol: `commit(messages)` renames exactly the files named
  *    by the SUCCESSFUL task attempts to their final names, deletes any
  *    stray `.tmp` left by failed/speculative attempts, and finalizes the
  *    write by publishing `_graft_manifest.json` (schema + file list + row
  *    counts). Readers only ever see manifest-listed files — the same
  *    "files exist but are invisible until the atomic metadata publish"
  *    contract HFile bulk load (and every table format) relies on.
  *    `abort()` removes this write's temp files and publishes nothing.
  *  - Append merges the new files into the existing manifest; `overwrite`
  *    routes through `SupportsTruncate` and replaces it.
  *  - `SupportsRead`: the manifest drives `planInputPartitions` (one per
  *    data file), so the connector round-trips through its own scan and is
  *    DuckDB-oracle-gated end to end (`dsv2_sink`).
  *
  * Encoding is deliberately simple — tab-separated text, one row per line,
  * types limited to int/long/double/string/timestamp/date (time types
  * stored as their Catalyst-internal micros/days numbers, UTC-anchored,
  * so ordering, stats pruning and the temporal partition transforms all
  * reduce to long comparisons), tabs/newlines rejected in
  * strings. Longs and doubles round-trip exactly (shortest-decimal
  * toString/parse, the same property csv_ingest leans on). Paths go through
  * java.nio, which pins this demo to a shared/local filesystem; a cluster
  * deployment would swap in the Hadoop FileSystem API with the commit
  * protocol unchanged.
  *
  * CONCURRENCY: every manifest read-modify-publish runs under a per-table
  * commit lock ([[GraftKvSink.withCommitLock]]) and the manifest carries a
  * monotonically-increasing `version`. A batch committer snapshots the
  * manifest at plan time and, at publish, compares versions under the
  * lock: unchanged → publish; advanced → Delta/Iceberg-style conflict
  * resolution (concurrent APPENDs merge — the file lists union; anything
  * racing a truncate, a row-level replace, or a compaction refuses
  * loudly). On a distributed deployment the lock becomes the table
  * format's put-if-absent commit slot (Delta's LogStore contract); the
  * version-compare conflict matrix is identical.
  */
class GraftKvSink extends TableProvider {
  // the write path hands the DataFrame's schema to getTable
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = GraftKvSink.pathOf(options.asCaseSensitiveMap())
    val mf = GraftKvSink.manifestPath(dir)
    require(Files.exists(mf),
      s"graft_kv: no manifest at $dir — write first (schema lives in the manifest)")
    val base = GraftKvSink.readManifest(mf).schema
    // CDC streaming read: rows plus their change kind and commit epoch
    // (the Delta CDF `_change_type`/`_commit_version` column convention)
    if (Option(options.get("readChangeFeed")).exists(_.toBoolean))
      GraftKvSink.withCdcColumns(base)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    schema.fields.foreach { f =>
      require(GraftKvSink.supported(f.dataType),
        s"graft_kv: unsupported column type ${f.dataType.simpleString} for '${f.name}'")
    }
    def ci(k: String): Option[String] =
      properties.asScala.collectFirst {
        case (key, v) if key.equalsIgnoreCase(k) => v }
    val dir = GraftKvSink.pathOf(properties)
    // CHECK constraints bind to the TABLE: the path route reads them from
    // the manifest (persisted there by the catalog's CREATE/ALTER), so a
    // writer that never saw the catalog entry still enforces. Explicit
    // `check.*` write options compose on top. LAZY — the manifest parse
    // (per-file stats/bloom maps) must not tax pure reads, which never
    // consult constraints; only write planning forces it.
    val optChecks = properties.asScala.collect {
      case (k, v) if k.toLowerCase.startsWith("check.") =>
        k.toLowerCase.stripPrefix("check.") -> v
    }.toMap
    new GraftKvTable(dir, schema,
      mor = Option(properties.get("mor")).exists(_.toBoolean),
      stampEpochs = Option(properties.get("epochs")).exists(_.toBoolean),
      checkConstraintsF = () => {
        val mf = GraftKvSink.manifestPath(dir)
        // the path route's table schema is the WRITER's (metadata-less),
        // so generated-column checks must derive from the manifest schema
        // here — the manifest is where CREATE persisted them
        (if (Files.exists(mf)) {
          val m = GraftKvSink.readManifest(mf)
          m.checks ++ GraftKvSink.generatedChecks(m.schema)
        } else Map.empty[String, String]) ++ optChecks
      },
      sortCols = GraftKvSink.sortColsOf(ci("sortBy")),
      sortBuckets = ci("sortBuckets").map(_.toInt).getOrElse(0),
      partitionSpecF = () => {
        // option-declared spec canonicalizes against the write schema; a
        // manifest-recorded spec (persisted by the catalog's CREATE, or
        // by this route's own first write) is authoritative — a
        // conflicting redeclaration refuses rather than silently mixing
        // layouts
        val opt = ci("partitionedBy").toSeq
          .flatMap(GraftPartition.splitSpec)
          .map(t => GraftPartition.parseOne(t, schema).key)
        val mfP = GraftKvSink.manifestPath(dir)
        val rec =
          if (Files.exists(mfP)) GraftKvSink.readManifest(mfP).partitionSpec
          else Nil
        if (opt.nonEmpty) {
          require(rec.isEmpty || rec == opt,
            s"graft_kv: write declares partitioning [${opt.mkString(", ")}] " +
              s"but $dir is partitioned by [${rec.mkString(", ")}]")
          opt
        } else rec
      })
  }
}

object GraftKvSink {
  /** Comma-separated `sortBy` table-option value -> column list. */
  private[sources] def sortColsOf(v: Option[String]): Seq[String] =
    v.toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  /** `compactedUpTo` < 0 = never compacted; otherwise every epoch <= that
    * id has been rewritten into a single file and its fine-grained history
    * vacuumed (asOfEpoch below it is unanswerable and must error).
    * `stats`: per-file per-column (min, max) over NON-NULL values, stringly
    * stored and compared under the schema type — the connector's
    * region-boundary analogue, driving file pruning in [[GraftKvScan]]. A
    * column absent from a file's stats map is "unknown" (all-null file,
    * NaN seen, or a pre-stats manifest) and never prunes.
    * `deltas`: MERGE-ON-READ delta files (name, inserts, deletes) — the
    * HBase-native write shape (cells are deltas; compaction merges). Each
    * `.kvd` file carries `D\tfile\tpos` position-deletes and `I\t<row>`
    * inserts, epoch-stamped like data files; a read at epoch >= the
    * delta's applies it, below it sees the pre-DML state (merge-on-read
    * DML never fences time travel — that is its point). */
  final case class DeltaFile(name: String, inserts: Long, deletes: Long)
  /** One manifest shard's entry in the two-level manifest list (the
    * Iceberg manifest-list shape, adapted — SURVEY §7.45): `file` names
    * the shard JSON under `_graft_manifest_shards/`, `sig` is a content
    * digest over the shard's entries (commit-time change detection: an
    * untouched shard is never re-serialized), and `summary` is the
    * conservative per-column (min,max) UNION over the shard's files —
    * present for a column only when EVERY file in the shard records
    * stats for it (absent stats never prune, so a partial union would
    * be unsound). `tuples` is the shard's DISTINCT partition-tuple set
    * (bounded; empty = unknown): same-tuple files hash to the same
    * shard, so a partitioned table's shard holds a handful of tuples,
    * and planning prunes the shard by running the EXACT per-file
    * partition test ([[GraftPartition.mayMatch]]) over each — the same
    * exactness per tuple the file path has (bucket residues, truncated
    * ranges, time transforms), lifted to shard granularity. Planning
    * prunes WHOLE shards against `summary`/`tuples` with the same
    * predicates the per-file path uses, then parses only survivors. */
  final case class ShardInfo(id: Int, file: String, count: Long, rows: Long,
      sig: String, summary: Map[String, (String, String)],
      tuples: Seq[Map[String, String]] = Nil)
  /** A data file superseded by copy-on-write DML at epoch `removedAt`:
    * kept on disk and listed here (not in `files`) so any boundary state
    * in [its own epoch, removedAt) still reconstructs exactly — the
    * Delta/Iceberg old-version retention shape. `vacuum` reclaims these
    * and raises the fence. */
  final case class RemovedFile(name: String, rows: Long, removedAt: Long)
  final case class Manifest(schema: StructType, files: Seq[(String, Long)],
      compactedUpTo: Long = -1L,
      stats: Map[String, Map[String, (String, String)]] = Map.empty,
      blooms: Map[String, Map[String, String]] = Map.empty,
      deltas: Seq[DeltaFile] = Nil,
      removed: Seq[RemovedFile] = Nil,
      // the newest copy-on-write replacement epoch: streams (whose replay
      // has no retraction) fence here; batch time travel does NOT — it
      // reconstructs from `removed` until vacuum folds this into
      // compactedUpTo
      rewrittenUpTo: Long = -1L,
      // OPTIMISTIC-CONCURRENCY token: monotonically incremented on every
      // publish. A committer records the version it planned against and,
      // at publish time (under the commit lock), compares it with the
      // current one — equal means no concurrent commit; greater means a
      // conflict check decides merge-or-refuse (see GraftKvBatchWrite).
      version: Long = 0L,
      // STREAMING TRANSACTIONS (Delta's SetTransaction shape): the
      // streaming-query id that committed each epoch. A recovered query
      // replaying its own epoch is idempotent (same id -> duplicates
      // discarded); a DIFFERENT query hitting an epoch another stream
      // already committed refuses loudly instead of silently losing its
      // batch. Entries prune with their epochs; batch commits never add.
      txn: Map[Long, String] = Map.empty,
      // COMMIT TIMESTAMPS: wall-clock millis recorded when each epoch
      // first appeared in a published manifest (stamped strictly
      // monotonically, so equal-millisecond commits still order).
      // `TIMESTAMP AS OF t` resolves to the max epoch with ts <= t
      // (Iceberg's snapshot-at-timestamp rule); DESCRIBE HISTORY
      // surfaces them. Entries prune with their epochs (vacuum/compact).
      epochTs: Map[Long, Long] = Map.empty,
      // CHECK CONSTRAINTS persisted in the TABLE's own metadata (the
      // Delta-protocol stance: constraints bind to the table, so EVERY
      // writer enforces them — catalog-route plans via the analysis
      // rewrite, path-route plans via getTable reading this map, the
      // streaming write via a bound predicate). Name -> boolean SQL text;
      // carried verbatim across every publish (truncate included —
      // constraints are table-level, not data-level).
      checks: Map[String, String] = Map.empty,
      // NAMED REFS (the Iceberg tag shape): name -> (epoch, kind). A
      // "tag" pins its epoch's boundary state against maintenance —
      // compaction clamps below the oldest tag, vacuum keeps the retained
      // CoW files a tagged state reconstructs from, and VERSION AS OF
      // '<name>' resolves through this map. Carried across every publish
      // except a truncating one (truncate restarts history; a tag into
      // the old numbering would silently pin the wrong state).
      refs: Map[String, (Long, String)] = Map.empty,
      // DECLARATIVE PARTITIONING (the Iceberg spec-in-metadata shape):
      // canonical transform strings ("c", "bucket(4,c)", "truncate(7,c)").
      // Table-level like checks — carried verbatim across every publish;
      // per-file tuples ride the stats map under "part:" keys. Empty =
      // unpartitioned. See [[GraftPartition]].
      partitionSpec: Seq[String] = Nil,
      // COLUMN MAPPING (the Iceberg field-id / Delta column-mapping
      // shape, positions as ids): rows are positional TSV, so each live
      // field carries its PHYSICAL position in field metadata
      // ([[PidKey]]; absent = the field's schema index — the pre-mapping
      // layout). DROP COLUMN retires a position into this list: writers
      // keep emitting a null placeholder there (one global positional
      // layout — no per-file schema needed) and ADD COLUMN never reuses
      // a retired position (reuse would resurface the dropped column's
      // committed values under the new name). Vacuumed away only by a
      // full rewrite. RENAME is pure metadata: the position is the
      // identity, the name is a label.
      droppedPids: Seq[Int] = Nil,
      // STREAM EPOCH BASES: engine epoch ids are checkpoint-relative
      // (0,1,2,…), but published epoch numbers must append AFTER the
      // history the table already holds (batch epoch stamps, a branch
      // fork's cloned files) or a fresh stream's first commits would
      // collide with existing names and be dropped as replay duplicates
      // — silent loss. queryId -> base, recorded at the stream's first
      // commit; published epoch = base + engine epoch, stable across
      // recovery replays (the dedup requires a frozen mapping). Dropped
      // by a truncating publish like txn (epoch numbering restarts).
      streamBase: Map[String, Long] = Map.empty,
      // TWO-LEVEL MANIFEST (SURVEY §7.45): 0 = legacy single-JSON (every
      // existing table reads unchanged); > 0 = the per-file entries live
      // in `shardCount` hash-assigned shard files and this manifest's
      // `files`/`stats`/`blooms` were assembled from them. `shardInfo`
      // carries each live shard's list entry so a commit can (a) name
      // unchanged shards without re-reading them and (b) skip
      // re-serializing any shard whose content digest is unchanged.
      // Everything else (deltas, removed, refs, txn, epochTs, …) stays
      // in the list: those are maintenance-bounded, the 1e6-entry scale
      // problem is the per-file stats maps (measured in ManifestProbe).
      shardCount: Int = 0,
      shardInfo: Seq[ShardInfo] = Nil) {
    /** THE boundary-state visibility rule — the one definition every
      * reader (scan, agg pushdown, changefeed planning) must share, or
      * metadata-answered COUNTs silently diverge from data-path reads: at
      * epoch `n`, a current file is visible iff its epoch <= n, and a
      * CoW-superseded file iff additionally n < removedAt (it existed
      * then and had not yet been replaced). None = the current state. */
    def visibleFilesAt(e: Option[Long]): Seq[(String, Long)] = e match {
      case None    => files
      case Some(n) => files.filter(f => epochOf(f._1) <= n) ++
        removed.collect {
          case r if epochOf(r.name) <= n && n < r.removedAt => (r.name, r.rows)
        }
    }
    /** Merge-on-read deltas applying at epoch `n` (their own epoch at or
      * below it); None = all. */
    def visibleDeltasAt(e: Option[Long]): Seq[DeltaFile] = e match {
      case None    => deltas
      case Some(n) => deltas.filter(d => epochOf(d.name) <= n)
    }
  }

  /** Iterate a delta file's position-delete records — the single read-side
    * definition of the `D\t<file>\t<pos>` and `U\t<file>\t<pos>\t<row>`
    * line formats (writers: [[GraftKvDeltaWriter.delete]]/`update`). A `U`
    * record IS a position-delete of the pre-image (plus an insert of the
    * post-image, surfaced elsewhere); `kinds` restricts which record kinds
    * feed `f` — CDC classification reads "D" and "U" separately, every
    * masking/fold path wants the default union. Malformed lines skipped. */
  private[sources] def foreachDelete(dir: String, delta: String,
      kinds: String = "DU")(f: (String, Long) => Unit): Unit = {
    val st = Files.lines(dataPath(dir, delta))
    try {
      val it = st.iterator()
      while (it.hasNext) {
        val l = it.next()
        val k = if (l.length > 2 && l.charAt(1) == '\t') l.charAt(0) else ' '
        if ((k == 'D' || k == 'U') && kinds.indexOf(k.toInt) >= 0) {
          val p1 = l.indexOf('\t', 2)
          // D: pos runs to end of line; U: pos runs to the next tab
          val p2 = if (p1 > 2) l.indexOf('\t', p1 + 1) else -1
          val end = if (p2 > 0) p2 else l.length
          if (p1 > 2 && end > p1 + 1)
            f(l.substring(2, p1),
              java.lang.Long.parseLong(l, p1 + 1, end, 10))
        }
      }
    } finally st.close()
  }

  /** One driver-side scan of a (tiny — one DML statement's actions) delta
    * file for CDC planning: does it carry plain inserts / updates, and
    * which target files do its D- and U-records position-delete from. */
  private[sources] def deltaShape(dir: String, delta: String)
      : (Boolean, Boolean, Seq[String], Seq[String]) = {
    var hasI = false
    var hasU = false
    val dT = scala.collection.mutable.LinkedHashSet.empty[String]
    val uT = scala.collection.mutable.LinkedHashSet.empty[String]
    val st = Files.lines(dataPath(dir, delta))
    try {
      val it = st.iterator()
      while (it.hasNext) {
        val l = it.next()
        if (l.startsWith("I\t")) hasI = true
        else if (l.startsWith("D\t") || l.startsWith("U\t")) {
          val p1 = l.indexOf('\t', 2)
          if (p1 > 2) {
            if (l.charAt(0) == 'D') dT += l.substring(2, p1)
            else { hasU = true; uT += l.substring(2, p1) }
          }
        }
      }
    } finally st.close()
    (hasI, hasU, dT.toSeq, uT.toSeq)
  }

  /** The row payload of a delta line: `I\t<row>` → after the marker,
    * `U\t<file>\t<pos>\t<row>` → after the third tab. */
  private[sources] def deltaPayload(l: String): String =
    if (l.startsWith("U\t"))
      l.substring(l.indexOf('\t', l.indexOf('\t', 2) + 1) + 1)
    else l.substring(2)

  /** Per-file bloom parameters: identical across every writer so
    * compaction can merge filters bit-for-bit; files beyond the row cap
    * drop their blooms (fpp would degrade into uselessness). */
  private[sources] val BloomItems = 4096L
  private[sources] val BloomFpp = 0.01
  private[sources] val BloomRowCap = 65536L

  // ---- HyperLogLog NDV sketch (the manifest's column-statistics feed) ---
  /** Fixed-parameter HLL (p=11 → 2 KB per column per file, ~2.3% typical
    * error): blooms cap out at BloomRowCap rows, but the CBO needs a
    * distinct count at EVERY file size — Spark's FilterEstimation refuses
    * to estimate a predicate whose column carries no NDV, so without this
    * a large table gets no selectivity estimates exactly where they matter
    * most. Values hash by their canonical string image (the same one the
    * stats/bloom feed uses), registers merge by elementwise max (standard
    * HLL union), so per-file sketches compose to an exact-union table NDV
    * at any fan-in. Stored in the manifest's per-file sketch map under the
    * reserved "hll:<col>" key — the blooms plumbing carries it through
    * every commit/restore/clone path untouched, and name-matched bloom
    * probes can never collide with the prefixed key. */
  private[sources] val HllP = 11
  private[sources] val HllM = 1 << HllP
  private[sources] val HllKey = "hll:"
  // two more per-file per-column counters riding the same sketch map:
  // "cnt:<col>" = NON-NULL values (nullCount = file rows − cnt, the IS
  // NULL selectivity feed) and "len:<col>" = total UTF8 string bytes
  // (avgLen = len / cnt — catalyst's default guess of 20 B/string is the
  // wrong size estimate everywhere it matters). Sum-merged on compaction.
  private[sources] val CntKey = "cnt:"
  private[sources] val LenKey = "len:"
  private[sources] def isSketchKey(k: String): Boolean =
    k.startsWith(HllKey) || k.startsWith(CntKey) || k.startsWith(LenKey)
  /** [[hllAdd]] for a long-backed column value WITHOUT materializing the
    * canonical String (r20 write-path fast path): writes v's decimal ASCII
    * image — byte-identical to `Long.toString(v).getBytes(UTF_8)` — into
    * the caller's reusable buffer, hashes the same bytes with the same
    * seed, and updates the register identically. Sketches stay mergeable
    * with string-fed registers because the hash input is the same. */
  private[sources] def hllAddLong(reg: Array[Byte], v: Long,
      buf: Array[Byte]): Int = {
    var len = 0
    if (v == Long.MinValue) { // -v overflows; rare enough for the slow path
      val s = "-9223372036854775808".getBytes(StandardCharsets.US_ASCII)
      System.arraycopy(s, 0, buf, 0, s.length); len = s.length
    } else {
      var x = v
      if (x < 0) { buf(0) = '-'; len = 1; x = -x }
      var nd = 1; var t = x
      while (t >= 10L) { t /= 10L; nd += 1 }
      var pos = len + nd - 1
      while (pos >= len) { buf(pos) = ('0' + (x % 10L)).toByte; x /= 10L; pos -= 1 }
      len += nd
    }
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
    val idx = (h >>> (64 - HllP)).toInt
    val w = h << HllP
    val rho = (if (w == 0L) 64 - HllP
               else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > reg(idx)) reg(idx) = rho.toByte
    len
  }
  private[sources] def hllAdd(reg: Array[Byte], value: String): Int = {
    // returns the value's UTF-8 BYTE length (the writer's len: counter
    // feed — String.length counts UTF-16 code units and would understate
    // avgLen up to 4x on non-ASCII text; the bytes are materialized for
    // the hash anyway, so the count is free)
    val b = value.getBytes(StandardCharsets.UTF_8)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    val idx = (h >>> (64 - HllP)).toInt
    val w = h << HllP
    val rho = (if (w == 0L) 64 - HllP
               else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rho > reg(idx)) reg(idx) = rho.toByte
    b.length
  }
  private[sources] def hllEstimate(reg: Array[Byte]): Long = {
    val m = HllM.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0; var zeros = 0; var i = 0
    while (i < HllM) {
      sum += java.lang.Math.pow(2.0, -reg(i))
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / sum
    // linear-counting correction for the small range; the 64-bit hash
    // makes the classic large-range correction unnecessary
    val corrected = if (e <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else e
    math.max(1L, math.round(corrected))
  }
  /** Union of base64-encoded register arrays (elementwise max). */
  private[sources] def hllMergeB64(parts: Seq[String]): Array[Byte] = {
    val acc = new Array[Byte](HllM)
    parts.foreach { b64 =>
      val r = java.util.Base64.getDecoder.decode(b64)
      var i = 0
      while (i < HllM && i < r.length) {
        if (r(i) > acc(i)) acc(i) = r(i); i += 1
      }
    }
    acc
  }

  private[sources] def pathOf(props: util.Map[String, String]): String = {
    val p = props.get("path")
    require(p != null && p.nonEmpty, "graft_kv: 'path' option is required")
    p
  }

  // ---- column mapping (physical-position field ids) ---------------------
  /** Field-metadata key holding a column's PHYSICAL position in the TSV
    * layout. Absent = the field's schema index (every pre-mapping table).
    * Stamped on all fields by the first RENAME/DROP and on every column
    * added afterwards; never changes once assigned — the position is the
    * column's identity, its name is a relabelable alias. */
  private[graft] val PidKey = "graft_pid"

  private[graft] def pidOf(f: StructField, idx: Int): Int =
    if (f.metadata.contains(PidKey)) f.metadata.getLong(PidKey).toInt else idx

  private[graft] def withPid(f: StructField, pid: Int): StructField =
    f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
      .withMetadata(f.metadata).putLong(PidKey, pid.toLong).build())

  /** Physical row width: one slot per position ever assigned, live or
    * retired. Writers emit exactly this many TSV columns. */
  private[graft] def physWidth(schema: StructType, dropped: Seq[Int]): Int =
    (schema.fields.zipWithIndex.map { case (f, i) => pidOf(f, i) } ++
      dropped).maxOption.map(_ + 1).getOrElse(0)

  /** Physical WRITE layout for a writer schema against the PLANNED
    * manifest: physical position -> logical field index (-1 = retired
    * hole, filled with the null marker and never read). Positions come
    * from the MANIFEST's authoritative schema BY NAME — the writer's own
    * schema carries no pid metadata on the path route
    * (df.write.format(...).option("path", ...)), and trusting its field
    * indexes there would write values into retired holes. Writer columns
    * the manifest does not know (a widening write) take fresh positions
    * past every live and retired one, matching evolveSchema's rule.
    * Null = identity layout (no manifest yet, or a never-renamed
    * table) — the fast path. */
  private[sources] def writeLayout(writeSchema: StructType,
      mf: Option[Manifest]): Array[Int] = mf match {
    case None => null
    case Some(m) =>
      val pidByName = m.schema.fields.zipWithIndex.map { case (f, i) =>
        f.name.toLowerCase -> pidOf(f, i) }.toMap
      var next = (pidByName.values ++ m.droppedPids).maxOption.getOrElse(-1) + 1
      val pids = writeSchema.fields.map { f =>
        pidByName.getOrElse(f.name.toLowerCase,
          { val p = next; next += 1; p }) }
      val trivial = m.droppedPids.isEmpty &&
        pids.zipWithIndex.forall { case (pd, i) => pd == i }
      if (trivial) null
      else {
        val arr = Array.fill((pids ++ m.droppedPids).max + 1)(-1)
        pids.zipWithIndex.foreach { case (pd, i) => arr(pd) = i }
        arr
      }
  }

  private[sources] def supported(dt: DataType): Boolean = dt match {
    case IntegerType | LongType | DoubleType | FloatType | StringType |
         TimestampType | TimestampNTZType | DateType |
         BooleanType => true
    // DECIMAL(p,s): stored as the plain (non-scientific) string at the
    // column's declared scale; ordered by BigDecimal compare everywhere
    // the stats/pruning paths order values (string order would put "9.5"
    // above "10.5")
    case _: DecimalType           => true
    // ARRAY<scalar> (SURVEY §7.46): one `[e1,e2,…]` TSV cell with element
    // images in the element type's canonical form — parsing is a split
    // INSIDE the cell, row splitting by \t is untouched, so the format
    // change is purely additive. No nesting (ARRAY<ARRAY<…>> waits for
    // the §7.47 struct/map round).
    case ArrayType(et, _)         => et match {
      case _: ArrayType | _: MapType | _: StructType => false
      case other                                     => supported(other)
    }
    case _                        => false
  }

  // ---- ARRAY cell codec (SURVEY §7.46) ---------------------------------
  // `[e1,e2,…]`: element images in the element type's canonical scalar
  // form, with `\` escaping every structural character (`\` `,` `[` `]`)
  // inside an element. NULL ELEMENT = the raw two-char token `\N` — a
  // literal string element "N" writes unescaped as `N`, and a literal
  // string "\N" doubles its backslash to `\\N`, so the null token never
  // collides. Empty array `[]` ≠ NULL cell `\N` (the cell-level marker).
  // Elements never contain tabs/newlines (required below, the same rule
  // scalar strings enforce), so the enclosing TSV row format is untouched.
  private def appendArrayEscaped(sb: StringBuilder, img: String): Unit = {
    var j = 0
    while (j < img.length) {
      val c = img.charAt(j)
      if (c == '\\' || c == ',' || c == '[' || c == ']') sb.append('\\')
      sb.append(c)
      j += 1
    }
  }
  private[sources] def encodeArrayCell(et: DataType,
      arr: org.apache.spark.sql.catalyst.util.ArrayData): String = {
    val sb = new StringBuilder("[")
    var j = 0
    while (j < arr.numElements()) {
      if (j > 0) sb.append(',')
      if (arr.isNullAt(j)) sb.append("\\N")
      else {
        val img = et match {
          case IntegerType => arr.getInt(j).toString
          case LongType    => arr.getLong(j).toString
          case TimestampType | TimestampNTZType => arr.getLong(j).toString
          case DateType    => arr.getInt(j).toString
          case DoubleType  => arr.getDouble(j).toString
          case FloatType   => arr.getFloat(j).toString
          case BooleanType => arr.getBoolean(j).toString
          case d: DecimalType =>
            arr.getDecimal(j, d.precision, d.scale)
              .toJavaBigDecimal.toPlainString
          case StringType  =>
            val v = arr.getUTF8String(j).toString
            require(!v.contains('\t') && !v.contains('\n'),
              "graft_kv: tab/newline in array string element")
            v
          case other => throw new IllegalStateException(
            s"unsupported array element type $other")
        }
        appendArrayEscaped(sb, img)
      }
      j += 1
    }
    sb.append(']')
    sb.toString
  }
  /** Total element count of an encoded array cell — the `len:` sketch
    * feed (unescaped commas + 1; "[]" = 0). */
  private[sources] def arrayCellLen(cell: String): Long = {
    if (cell.length <= 2) 0L
    else {
      var n = 1L
      var j = 1
      while (j < cell.length - 1) {
        val c = cell.charAt(j)
        if (c == '\\') j += 1
        else if (c == ',') n += 1
        j += 1
      }
      n
    }
  }
  private[sources] def parseArrayCell(et: DataType, cell: String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    require(cell.length >= 2 && cell.charAt(0) == '[' &&
      cell.charAt(cell.length - 1) == ']',
      s"graft_kv: malformed array cell '$cell'")
    if (cell.length == 2)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    // split on unescaped commas, escapes intact (the null token test is
    // on the RAW token — unescaping first would alias a literal "N")
    val raws = scala.collection.mutable.ArrayBuffer.empty[String]
    val tok = new StringBuilder
    var j = 1
    while (j < cell.length - 1) {
      val c = cell.charAt(j)
      if (c == '\\' && j + 1 < cell.length - 1) {
        tok.append(c); j += 1; tok.append(cell.charAt(j))
      } else if (c == ',') { raws += tok.toString; tok.clear() }
      else tok.append(c)
      j += 1
    }
    raws += tok.toString
    def unescape(r: String): String =
      if (r.indexOf('\\') < 0) r
      else {
        val b = new StringBuilder
        var k = 0
        while (k < r.length) {
          if (r.charAt(k) == '\\' && k + 1 < r.length) k += 1
          b.append(r.charAt(k)); k += 1
        }
        b.toString
      }
    val out = raws.map { r =>
      if (r == "\\N") null
      else {
        val v = unescape(r)
        et match {
          case IntegerType => v.toInt
          case LongType    => v.toLong
          case TimestampType | TimestampNTZType => v.toLong
          case DateType    => v.toInt
          case DoubleType  => v.toDouble
          case FloatType   => v.toFloat
          case BooleanType => v.toBoolean
          case d: DecimalType =>
            org.apache.spark.sql.types.Decimal(
              new java.math.BigDecimal(v), d.precision, d.scale)
          case StringType  => UTF8String.fromString(v)
          case other => throw new IllegalStateException(
            s"unsupported array element type $other")
        }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Canonical string image of a FILTER value for a column of type `dt` —
    * the single conversion point between what Spark hands a connector and
    * what the data files / stats / partition tuples store. Time-typed
    * values arrive in three shapes: external java.sql objects (v1
    * pushFilters, java8API off), external java.time objects (java8API
    * on), and Catalyst-internal micros/days numbers (v2-translated
    * predicates). All land on the file encoding: TIMESTAMP = micros
    * since epoch (UTC), DATE = epoch days. */
  private[sources] def canonValue(dt: DataType, v: Any): String = dt match {
    case TimestampType => v match {
      case t: java.sql.Timestamp =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(t).toString
      case i: java.time.Instant =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .instantToMicros(i).toString
      case l: java.lang.Long => l.toString // Catalyst-internal micros
      case other             => String.valueOf(other)
    }
    case TimestampNTZType => v match {
      case d: java.time.LocalDateTime => // external NTZ shape
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .localDateTimeToMicros(d).toString
      case l: java.lang.Long => l.toString // Catalyst-internal micros
      case other             => String.valueOf(other)
    }
    case DateType => v match {
      case d: java.sql.Date =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaDate(d).toString
      case d: java.time.LocalDate => d.toEpochDay.toString
      case i: java.lang.Integer   => i.toString // Catalyst-internal days
      case other                  => String.valueOf(other)
    }
    case _: DecimalType => v match {
      // plain string, never scientific notation — BigDecimal.toString
      // renders 1E+2 shapes the parse-side BigDecimal accepts but the
      // equality image must match the writer's toPlainString
      case b: java.math.BigDecimal => b.toPlainString
      case b: scala.math.BigDecimal => b.underlying.toPlainString
      case d: org.apache.spark.sql.types.Decimal =>
        d.toJavaBigDecimal.toPlainString
      case other => String.valueOf(other)
    }
    case _ => String.valueOf(v)
  }

  private[graft] def manifestPath(dir: String): Path =
    Paths.get(dir, "_graft_manifest.json")

  // ---- two-level manifest (manifest-list + shards, SURVEY §7.45) -------
  // The single-JSON manifest has a MEASURED cliff (ManifestProbe, r19):
  // 1e6 file entries = 573 MB JSON, 52-88 s per op, OOMs an 8 GB driver —
  // and 100 TB at 128 MB files is ~8e5 entries. Past `shardSplitThreshold`
  // live entries, a commit splits the per-file entries into hash-assigned
  // shard files under `_graft_manifest_shards/`; the manifest list (still
  // `_graft_manifest.json`, same atomic-rename publish, same commit lock,
  // same optimistic-concurrency version) then holds per-shard summaries
  // instead of per-file entries. Commit cost becomes proportional to the
  // shards a commit TOUCHES (content-digest change detection), planning
  // parses shards in parallel and the filtered scan path prunes whole
  // shards by summary before parsing anything. Absent shard dir = legacy
  // single manifest: zero migration for existing tables.
  private[sources] val ShardDirName = "_graft_manifest_shards"
  private[sources] def shardDirPath(dir: String): Path =
    Paths.get(dir, ShardDirName)
  /** Live-file-entry count at which a commit splits (test-overridable; the
    * measured safe region is <= 1e5 entries, so the default splits a
    * healthy margin before the cliff). */
  private[sources] def shardSplitThreshold: Int =
    sys.props.get("graft.manifest.shard.threshold").map(_.toInt)
      .getOrElse(50000)
  /** Shard count chosen at split time: ~10k entries per shard (a ~6 MB
    * shard parses in ~0.1 s), floored at 8 so tiny test thresholds still
    * exercise multi-shard behavior, capped so the list stays small. */
  private[sources] def shardCountFor(n: Int): Int =
    math.max(8, math.min(512, n / 10000))
  /** A file's shard key: its partition tuple when the file records one
    * (co-locating a partition's files makes shard summaries tight, which
    * is what lets planning prune whole shards on partition-correlated
    * predicates), else the basename (hash spread; summaries go wide and
    * shard pruning degrades to "parse everything" — sound, just not
    * helpful). Stable per file: a commit's new files land in the shards
    * their keys hash to, every other shard's bytes are untouched. */
  /** A file's shard id from its partition tuple when it records one
    * (same-tuple files co-locate — that is what makes shard summaries/
    * tuple sets tight), else its basename. XOR of the entries' (cached)
    * String hashCodes: order-independent, stable across JVMs
    * (String.hashCode is specified), and allocation-free — this runs
    * once per file entry per commit, 1e6 times on a big table. */
  private def shardIdOfEntry(name: String,
      stats: Map[String, (String, String)], n: Int): Int = {
    var h = 0; var found = false
    stats.foreach { case (k, (v, _)) =>
      if (k.startsWith("part:")) { found = true; h ^= k.hashCode * 31 + v.hashCode }
    }
    if (!found) h = baseName(name).hashCode
    math.floorMod(h, n)
  }
  /** Content signature over one shard's entries — the commit-time "did
    * this shard change" test; equal sig => the shard file is
    * re-referenced without re-serialization. A 128-bit arithmetic fold
    * over each entry's name/rows/stats/blooms hashes (String hashCodes
    * are cached by the JVM and Map hashCodes are order-independent), in
    * entry order: ~100x cheaper per commit than a byte-level digest at
    * 1e6 entries, at a collision risk (~2^-128 per shard-commit pair)
    * on par with the MD5 it replaces. A pure entry REORDER flips the
    * sig and harmlessly rewrites an identical shard — sigs may
    * over-detect change, never under-detect content. */
  private def shardSig(entries: Seq[(String, Long)],
      stats: Map[String, Map[String, (String, String)]],
      blooms: Map[String, Map[String, String]]): String = {
    var h1 = 0xcbf29ce484222325L
    var h2 = 0x9e3779b97f4a7c15L
    def mix(x: Long): Unit = {
      h1 = (h1 ^ x) * 0x100000001b3L
      h2 = java.lang.Long.rotateLeft(h2 ^ x, 31) * 0xff51afd7ed558ccdL
    }
    entries.foreach { case (n, c) =>
      mix(n.hashCode.toLong); mix(c)
      val st = stats.getOrElse(n, null)
      mix(if (st == null) 0L else st.hashCode.toLong)
      val bl = blooms.getOrElse(n, null)
      mix(if (bl == null) 0L else bl.hashCode.toLong)
    }
    java.lang.Long.toHexString(h1) + "-" + java.lang.Long.toHexString(h2)
  }
  /** Conservative per-column (min,max) union over a shard's files: a
    * column summarizes only when EVERY file records stats for it — a
    * stats-less file's values are unknown, and the standing soundness
    * rule (absent stats never prune) must hold at shard granularity too.
    * Only plain data columns participate (part:/sketch keys have their
    * own per-file semantics); an unparseable image declines the column,
    * mirroring mayMatch's NumberFormatException rule. */
  private def shardSummary(schema: StructType, entries: Seq[(String, Long)],
      stats: Map[String, Map[String, (String, String)]])
      : Map[String, (String, String)] =
    schema.fields.flatMap { f =>
      val ranges = entries.map { case (n, _) =>
        stats.getOrElse(n, Map.empty)
          .find(_._1.equalsIgnoreCase(f.name)).map(_._2)
      }
      if (ranges.isEmpty || ranges.exists(_.isEmpty)) None
      else try {
        val folded = ranges.flatten.reduce[(String, String)] {
          case ((amn, amx), (bmn, bmx)) =>
            (if (le(f.dataType, amn, bmn)) amn else bmn,
             if (le(f.dataType, amx, bmx)) bmx else amx)
        }
        Some(f.name -> folded)
      } catch { case _: NumberFormatException => None }
    }.toMap
  /** Assemble (files, stats, blooms) by parsing the named shard files in
    * parallel — each shard's Jackson tree is small, so the 573-MB
    * single-tree allocation spike (the measured OOM) never happens. */
  private def parseShards(dir: Path, shards: Seq[ShardInfo])
      : (Seq[(String, Long)], Map[String, Map[String, (String, String)]],
         Map[String, Map[String, String]]) = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = Await.result(Future.sequence(shards.map { si =>
      Future {
        val p = dir.resolve(si.file)
        val k = p.toAbsolutePath.normalize.toString
        val hit = shardParseCache.get(k)
        if (hit != null && hit._1 == si.sig) hit._2
        else {
          val entries = parseFileEntries(mapper.readTree(
            Files.readAllBytes(p)))
          if (shardParseCache.size > 2048) shardParseCache.clear()
          shardParseCache.put(k, (si.sig, entries))
          entries
        }
      }
    }), Duration.Inf)
    // deterministic order: shards sorted by id at write time, entries keep
    // their in-shard order — reassembly is stable across reads. One
    // builder pass over all shards: flatMap-then-toMap built every
    // intermediate collection twice, which at 1e6 entries was the
    // dominant assembly cost in the probe.
    val fb = Seq.newBuilder[(String, Long)]
    val sb = Map.newBuilder[String, Map[String, (String, String)]]
    val bb = Map.newBuilder[String, Map[String, String]]
    parsed.foreach { case (f, st, bl) =>
      fb ++= f; sb ++= st; bb ++= bl
    }
    (fb.result(), sb.result(), bb.result())
  }
  /** Parse a "files" array node (manifest list legacy form or one shard
    * file) into (entries, stats, blooms) — ONE pass over the tree with
    * builders (the three-comprehension version walked it three times and
    * rebuilt every inner map). */
  private def parseFileEntries(root: com.fasterxml.jackson.databind.JsonNode)
      : (Seq[(String, Long)], Map[String, Map[String, (String, String)]],
         Map[String, Map[String, String]]) = {
    val files = Seq.newBuilder[(String, Long)]
    val stats = Map.newBuilder[String, Map[String, (String, String)]]
    val blooms = Map.newBuilder[String, Map[String, String]]
    val it = root.get("files").elements()
    while (it.hasNext) {
      val f = it.next()
      val name = f.get("name").asText()
      files += (name -> f.get("rows").asLong())
      val st = f.get("stats")
      if (st != null) {
        val b = Map.newBuilder[String, (String, String)]
        val pit = st.properties().iterator()
        while (pit.hasNext) {
          val e = pit.next()
          b += (e.getKey -> (e.getValue.get("min").asText(),
            e.getValue.get("max").asText()))
        }
        stats += (name -> b.result())
      }
      val bl = f.get("blooms")
      if (bl != null) {
        val b = Map.newBuilder[String, String]
        val pit = bl.properties().iterator()
        while (pit.hasNext) {
          val e = pit.next()
          b += (e.getKey -> e.getValue.asText())
        }
        blooms += (name -> b.result())
      }
    }
    (files.result(), stats.result(), blooms.result())
  }
  /** Serialize file entries into `arr` — the ONE entry shape both the
    * legacy manifest and every shard file use. */
  private def writeFileEntries(
      arr: com.fasterxml.jackson.databind.node.ArrayNode,
      files: Seq[(String, Long)],
      stats: Map[String, Map[String, (String, String)]],
      blooms: Map[String, Map[String, String]]): Unit =
    files.foreach { case (n, c) =>
      val o = arr.addObject(); o.put("name", n); o.put("rows", c)
      stats.get(n).filter(_.nonEmpty).foreach { cols =>
        val st = o.putObject("stats")
        cols.toSeq.sortBy(_._1).foreach { case (col, (mn, mx)) =>
          val co = st.putObject(col); co.put("min", mn); co.put("max", mx)
        }
      }
      blooms.get(n).filter(_.nonEmpty).foreach { cols =>
        val bl = o.putObject("blooms")
        cols.toSeq.sortBy(_._1).foreach { case (col, b64) =>
          bl.put(col, b64) }
      }
    }

  // ---- table-level histogram sidecar -----------------------------------
  // Equi-height histograms (ANALYZE … FOR COLUMNS under
  // spark.sql.statistics.histogram.enabled) live BESIDE the manifest, not
  // in it: they are CBO estimates with their own staleness rule, not part
  // of the transactional state — appends must not have to rewrite them,
  // and a stale histogram must degrade to "report nothing", never to a
  // wrong bound. Format: first line `rows\t<n>` (the visible row count at
  // compute time — the staleness feed), then `<col>\t<lo,hi,ndv;…>` per
  // column. No .kv/.kvd suffix, so vacuum's stray sweep never eats it.
  private[graft] def colHistPath(dir: String): Path =
    Paths.get(dir, "_graft_colhist")

  def writeColHist(dir: String, rows: Long,
      cols: Map[String, String]): Unit = {
    val p = colHistPath(dir)
    if (cols.isEmpty) { Files.deleteIfExists(p); return }
    val tmp = Paths.get(dir, "_graft_colhist.sidecar")
    Files.writeString(tmp,
      (s"rows\t$rows" +: cols.toSeq.sortBy(_._1)
        .map { case (c, b) => s"${c.toLowerCase}\t$b" }).mkString("\n"),
      StandardCharsets.UTF_8)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING): Unit
  }

  def readColHist(dir: String): Option[(Long, Map[String, String])] = {
    val p = colHistPath(dir)
    if (!Files.exists(p)) None
    else try {
      val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      val rows = lines.head.split('\t')(1).toLong
      Some((rows, lines.drop(1).map { l =>
        val i = l.indexOf('\t'); l.substring(0, i) -> l.substring(i + 1)
      }.toMap))
    } catch { case _: Exception => None } // unreadable = absent, never wrong
  }

  // ---- per-table commit lock -------------------------------------------
  // Serializes every manifest read-modify-publish: a JVM monitor (keyed by
  // the normalized table path) covers threads in this process, and an OS
  // advisory file lock on `_graft_commit.lock` covers other processes on
  // the shared filesystem. Reentrant per thread so a locked operation may
  // call another locked helper. On HDFS/S3 this slot is where a LogStore
  // put-if-absent (Delta) or a metastore CAS (Iceberg) plugs in — callers
  // only depend on "read-merge-publish is atomic against other committers".
  private val commitMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private val heldLocks = new ThreadLocal[java.util.HashSet[String]] {
    override def initialValue(): java.util.HashSet[String] =
      new java.util.HashSet[String]()
  }
  private[graft] def withCommitLock[T](dir: String)(f: => T): T = {
    val key = Paths.get(dir).toAbsolutePath.normalize.toString
    if (heldLocks.get.contains(key)) f
    else {
      val monitor = commitMonitors.computeIfAbsent(key, _ => new Object)
      monitor.synchronized {
        Files.createDirectories(Paths.get(dir))
        val ch = java.nio.channels.FileChannel.open(
          Paths.get(dir, "_graft_commit.lock"),
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.WRITE)
        try {
          val fileLock = ch.lock()
          heldLocks.get.add(key)
          try f
          finally { heldLocks.get.remove(key); fileLock.release() }
        } finally ch.close()
      }
    }
  }

  /** Tiny hand-rolled JSON (schema via StructType.json, files as a flat
    * list) — same zero-dependency approach as the DDL catalog. */
  private[sources] def writeManifest(dir: String, schema: StructType,
      files: Seq[(String, Long)], compactedUpTo: Long = -1L,
      stats: Map[String, Map[String, (String, String)]] = Map.empty,
      blooms: Map[String, Map[String, String]] = Map.empty,
      deltas: Seq[DeltaFile] = Nil,
      removed: Seq[RemovedFile] = Nil,
      rewrittenUpTo: Long = -1L,
      // a TRUNCATING publish restarts history: epoch numbers restart too,
      // so prior commit timestamps must NOT carry over (a reused epoch 0
      // inheriting the pre-truncate stamp would let TIMESTAMP AS OF an
      // old time silently read post-truncate data)
      freshHistory: Boolean = false,
      // streaming-transaction entries: null = carry the prior manifest's
      // (pruned with their epochs); streaming commits pass the updated map
      txn: Map[Long, String] = null,
      // CHECK constraints: null = carry the prior manifest's verbatim
      // (table-level metadata, truncate-proof); setChecks passes updates
      checks: Map[String, String] = null,
      // named refs: null = carry the prior's (dropped by freshHistory —
      // a truncate restarts epoch numbering); createRef/dropRef update
      refs: Map[String, (Long, String)] = null,
      // partition spec: null = carry the prior's verbatim (table-level,
      // truncate-proof — layout declarations survive a TRUNCATE exactly
      // like CHECK constraints); setPartitionSpec passes updates
      partitionSpec: Seq[String] = null,
      // retired physical positions (column mapping): null = carry the
      // prior's verbatim — table-level layout metadata like the spec;
      // only DROP COLUMN (adds) and full-rewrite maintenance (clears)
      // pass updates. Truncate-PROOF: post-truncate writers still emit
      // the holes, keeping one global positional layout.
      droppedPids: Seq[Int] = null,
      // stream epoch bases: null = carry the prior's; the streaming
      // commit passes updates. Dropped by freshHistory with txn (a
      // truncate restarts epoch numbering).
      streamBase: Map[String, Long] = null,
      // forced shard layout for this publish: Some(0) rewrites a sharded
      // table back into the legacy single JSON, Some(n>0) (re)splits into
      // n shards regardless of thresholds. None = keep the prior layout
      // (splitting automatically past shardSplitThreshold). Only the
      // maintenance reshard path passes this.
      reshardTo: Option[Int] = None,
      // the currently-published manifest, when the caller (always under
      // the same commit lock) has already read it — saves the second
      // full JSON parse per publish, which the per-file stats/bloom maps
      // make the dominant driver-side cost on a many-file table. null =
      // read from disk here.
      priorHint: Option[Manifest] = null): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("schema", schema.json)
    // version auto-increments off the currently-published manifest: every
    // publish site runs under withCommitLock, so read-then-+1 here is the
    // CAS bump (first publish = version 0)
    val mfp = manifestPath(dir)
    val prior = Option(priorHint).getOrElse(
      if (Files.exists(mfp)) Some(readManifest(mfp)) else None)
    root.put("version", prior.map(_.version + 1L).getOrElse(0L))
    if (compactedUpTo >= 0L) root.put("compactedUpTo", compactedUpTo)
    if (rewrittenUpTo >= 0L) root.put("rewrittenUpTo", rewrittenUpTo)
    // COMMIT TIMESTAMPS: every epoch this manifest references keeps (or
    // gains, for epochs new in this publish) a wall-clock stamp. Stamps
    // are strictly monotonic — max(now, prior max + 1) — so TIMESTAMP AS
    // OF resolution (max epoch with ts <= t) is total even for commits
    // landing in the same millisecond. Epochs no longer referenced
    // (vacuumed/compacted away) drop their entries here automatically.
    locally {
      val refsKept0 =
        if (freshHistory) Map.empty[String, (Long, String)]
        else Option(refs).orElse(prior.map(_.refs)).getOrElse(Map.empty)
      val referenced = (files.map(f => epochOf(f._1)) ++
        deltas.map(d => epochOf(d.name)) ++
        removed.map(r => epochOf(r.name)) ++ removed.map(_.removedAt) ++
        refsKept0.values.map(_._1) ++ // tagged epochs keep their stamps
        Seq(compactedUpTo, rewrittenUpTo).filter(_ >= 0L)).distinct.sorted
      val priorTs =
        if (freshHistory) Map.empty[Long, Long]
        else prior.map(_.epochTs).getOrElse(Map.empty)
      var clock = math.max(System.currentTimeMillis(),
        priorTs.values.maxOption.getOrElse(0L))
      val stamped = referenced.map { e =>
        e -> priorTs.getOrElse(e, { clock += 1L; clock })
      }
      if (stamped.nonEmpty) {
        val to = root.putObject("epochTs")
        stamped.foreach { case (e, ts) => to.put(e.toString, ts) }
      }
      val txn0 =
        if (freshHistory) Map.empty[Long, String]
        else Option(txn).orElse(prior.map(_.txn)).getOrElse(Map.empty)
      val txnKept = txn0.filter { case (e, _) => referenced.contains(e) }
      if (txnKept.nonEmpty) {
        val to = root.putObject("txn")
        txnKept.toSeq.sortBy(_._1).foreach { case (e, q) =>
          to.put(e.toString, q) }
      }
      // CHECK constraints are TABLE-level: carried verbatim across every
      // publish, truncate included (null = keep the prior's; setChecks
      // passes the updated map)
      val checksKept =
        Option(checks).orElse(prior.map(_.checks)).getOrElse(Map.empty)
      if (checksKept.nonEmpty) {
        val co = root.putObject("checks")
        checksKept.toSeq.sortBy(_._1).foreach { case (k, v) => co.put(k, v) }
      }
      val refsKept = refsKept0
      if (refsKept.nonEmpty) {
        val ro = root.putObject("refs")
        refsKept.toSeq.sortBy(_._1).foreach { case (n, (e, kind)) =>
          val o = ro.putObject(n); o.put("epoch", e); o.put("kind", kind)
        }
      }
      val specKept = Option(partitionSpec)
        .orElse(prior.map(_.partitionSpec)).getOrElse(Nil)
      if (specKept.nonEmpty) {
        val pa = root.putArray("partitionSpec")
        specKept.foreach(pa.add)
      }
      val droppedKept = Option(droppedPids)
        .orElse(prior.map(_.droppedPids)).getOrElse(Nil)
      if (droppedKept.nonEmpty) {
        val da = root.putArray("droppedPids")
        droppedKept.sorted.foreach(p => da.add(p): Unit)
      }
      val sbKept =
        if (freshHistory) Map.empty[String, Long]
        else Option(streamBase).orElse(prior.map(_.streamBase))
          .getOrElse(Map.empty)
      if (sbKept.nonEmpty) {
        val so = root.putObject("streamBase")
        sbKept.toSeq.sortBy(_._1).foreach { case (q, b) => so.put(q, b) }
      }
    }
    // two-level split decision: once sharded, stay sharded (a table past
    // the threshold that compacts back under it keeps its shard layout —
    // re-splitting on every boundary crossing would churn); a legacy
    // table splits the first time its live entry count crosses the
    // threshold; reshardTo forces a layout (the maintenance rewrite).
    val newVersion = prior.map(_.version + 1L).getOrElse(0L)
    val desired: Int = reshardTo.getOrElse(
      prior.map(_.shardCount).getOrElse(0) match {
        case n if n > 0 => n
        case _ =>
          if (files.size >= shardSplitThreshold) shardCountFor(files.size)
          else 0
      })
    // stale-generation GC runs AFTER the list publish (readers resolve
    // shard names through the list, so nothing referenced is ever deleted)
    var shardGc: Option[(Path, Set[String])] = None
    if (desired <= 0) {
      val arr = root.putArray("files")
      writeFileEntries(arr, files, stats, blooms)
    } else {
      val sd = shardDirPath(dir)
      Files.createDirectories(sd)
      val grouped: Map[Int, Seq[(String, Long)]] = files.groupBy(f =>
        shardIdOfEntry(f._1, stats.getOrElse(f._1, Map.empty), desired))
      val priorById: Map[Int, ShardInfo] =
        if (prior.exists(_.shardCount == desired))
          prior.get.shardInfo.map(si => si.id -> si).toMap
        else Map.empty
      // retirement stamps: every prior shard file this publish stops
      // referencing gets mtime = NOW, starting its GC grace clock at the
      // moment of DEREFERENCE (a crash before the list publish is safe —
      // a still-referenced file is never a GC candidate)
      def stampRetired(name: String): Unit = {
        val p = sd.resolve(name)
        if (Files.exists(p))
          try Files.setLastModifiedTime(p, java.nio.file.attribute
            .FileTime.fromMillis(System.currentTimeMillis())): Unit
          catch { case _: java.io.IOException => }
      }
      // a count-changing reshard (or a legacy->shard split over a stale
      // dir) dereferences EVERY prior-layout file
      prior.toSeq.flatMap(_.shardInfo)
        .filterNot(si => priorById.get(si.id).exists(_.file == si.file))
        .foreach(si => stampRetired(si.file))
      val shardArr = root.putArray("shards")
      val kept = scala.collection.mutable.Set.empty[String]
      grouped.toSeq.sortBy(_._1).foreach { case (id, entries) =>
        val sig = shardSig(entries, stats, blooms)
        val si = priorById.get(id) match {
          // content digest unchanged: re-reference the existing shard
          // file — the commit writes ZERO bytes for this shard, which is
          // the whole point (commit cost ∝ shards touched, not table
          // size)
          case Some(p) if p.sig == sig => p
          case _ =>
            val fname = s"shard-$id-$newVersion.json"
            val so = mapper.createObjectNode()
            writeFileEntries(so.putArray("files"), entries, stats, blooms)
            val tmpS = sd.resolve(fname + ".new")
            Files.write(tmpS, mapper.writeValueAsBytes(so))
            Files.move(tmpS, sd.resolve(fname),
              StandardCopyOption.REPLACE_EXISTING)
            // this rewrite dereferences the shard's previous file
            priorById.get(id).filter(_.file != fname)
              .foreach(p0 => stampRetired(p0.file))
            // distinct partition tuples, bounded: a tuple-less file makes
            // the set unknown (it could match anything), as does a shard
            // with more distinct tuples than the list should carry
            val parts = entries.map { case (n, _) =>
              GraftPartition.filePartsOf(stats.getOrElse(n, Map.empty)) }
            val tuples =
              if (parts.exists(_.isEmpty)) Nil
              else {
                val d = parts.distinct
                if (d.length > 64) Nil else d
              }
            ShardInfo(id, fname, entries.length, entries.map(_._2).sum, sig,
              shardSummary(schema, entries, stats), tuples)
        }
        kept += si.file
        val o = shardArr.addObject()
        o.put("id", si.id); o.put("file", si.file)
        o.put("count", si.count); o.put("rows", si.rows)
        o.put("sig", si.sig)
        if (si.summary.nonEmpty) {
          val su = o.putObject("summary")
          si.summary.toSeq.sortBy(_._1).foreach { case (c, (mn, mx)) =>
            val co = su.putObject(c); co.put("min", mn); co.put("max", mx)
          }
        }
        if (si.tuples.nonEmpty) {
          val ta = o.putArray("tuples")
          si.tuples.foreach { t =>
            val to = ta.addObject()
            t.toSeq.sortBy(_._1).foreach { case (k, v) => to.put(k, v) }
          }
        }
      }
      // shards that VANISHED this publish (every file they held left the
      // table) have no grouped entry — their prior files retire too
      priorById.values
        .filter(si => !grouped.contains(si.id) && !kept.contains(si.file))
        .foreach(si => stampRetired(si.file))
      root.put("shardCount", desired)
      shardGc = Some((sd, kept.toSet))
    }
    if (deltas.nonEmpty) {
      val darr = root.putArray("deltas")
      deltas.foreach { d =>
        val o = darr.addObject()
        o.put("name", d.name); o.put("inserts", d.inserts)
        o.put("deletes", d.deletes)
      }
    }
    if (removed.nonEmpty) {
      val rarr = root.putArray("removed")
      removed.foreach { r =>
        val o = rarr.addObject()
        o.put("name", r.name); o.put("rows", r.rows); o.put("at", r.removedAt)
      }
    }
    // publish atomically (write-temp-then-rename): a live streaming read
    // polls this file from latestOffset, and a plain truncate-then-write
    // would let it observe half-written JSON
    // (.new, not .tmp: the batch commit's stray-attempt sweep removes *.tmp)
    val tmp = Paths.get(dir, "_graft_manifest.json.new")
    Files.write(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root))
    try Files.move(tmp, manifestPath(dir), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, manifestPath(dir), StandardCopyOption.REPLACE_EXISTING)
    }
    // parse-cache hygiene: the rename already invalidates by attributes;
    // dropping the entry just frees the superseded parse immediately
    invalidateManifestCache(manifestPath(dir))
    // stale shard-generation GC, AFTER the list publish: a superseded
    // shard file is deleted only once it is (a) unreferenced by the list
    // just published and (b) at least 8 list versions old — a lock-free
    // reader that resolved an older list keeps its shard files for an
    // 8-commit grace window (the single-JSON design's atomic-replace
    // semantics had the same property trivially: a reader re-reads the
    // whole state). Vacuum's orphan sweep never enters this directory
    // (its candidate set is suffix-scoped to .kv/.kvd/.tmp at top level).
    shardGc.foreach { case (sd, kept) =>
      // Grace is TIME-based and keyed off RETIREMENT, not creation (a
      // review catch: the earlier version-suffix window gave a
      // long-stable shard's file ZERO grace the moment a rewrite retired
      // it — its suffix was ancient by then). The publish loop above
      // stamps a just-dereferenced file's mtime to NOW ("retired at");
      // this sweep deletes only unreferenced files whose stamp is past
      // the grace window, so a lock-free reader holding the previous
      // list always has the full window to resolve its shard files.
      val cutoff = System.currentTimeMillis() - ShardGcGraceMs
      val s = Files.list(sd)
      try s.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith("shard-") && n.endsWith(".json") &&
            !kept.contains(n) &&
            Files.getLastModifiedTime(p).toMillis <= cutoff)
          Files.deleteIfExists(p): Unit
      } finally s.close()
    }
  }

  /** Retired-shard grace: a lock-free reader that resolved the previous
    * manifest list gets this long to open its shard files after a
    * rewrite dereferences them (planning is seconds; 10 minutes is the
    * same in-flight grace vacuum's stray sweep grants). */
  private[sources] val ShardGcGraceMs: Long = 10L * 60L * 1000L

  // ---- manifest parse cache (r21) --------------------------------------
  // Multi-statement kv workflows re-read a table's manifest many times per
  // statement (loadTable schema, scan planning, metadata helpers, commit
  // paths — 100+ call sites), and every read re-parsed the JSON from
  // scratch; Profile attribution (r20) put 40–55% of those queries' wall
  // driver-side, of which the repeated manifest I/O is the graft-owned
  // slice. Every publish is an atomic rename of a FRESH temp file, so a
  // manifest's identity is its (fileKey≈inode, size, mtime) triple: a
  // cached parse is returned only while all three match a fresh stat of
  // the path, so any publish — this process or another — replaces the
  // inode and invalidates the entry by construction (the stat costs one
  // syscall, the same open the parse path would issue; cross-process
  // visibility is therefore identical to parse-per-read). Entries are
  // immutable parsed Manifests; the map is bounded by periodic clear.
  private final case class MfCacheEntry(fileKey: AnyRef, size: Long,
      mtime: java.nio.file.attribute.FileTime, m: Manifest) {
    def matches(a: java.nio.file.attribute.BasicFileAttributes): Boolean =
      java.util.Objects.equals(fileKey, a.fileKey) && size == a.size &&
        mtime == a.lastModifiedTime
  }
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Path, MfCacheEntry]()
  private def statAttrs(p: Path): java.nio.file.attribute.BasicFileAttributes =
    try Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    catch { case _: java.io.IOException => null }
  private[sources] def invalidateManifestCache(mf: Path): Unit =
    manifestCache.remove(mf.toAbsolutePath.normalize): Unit

  /** Shard parses cached by (path, sig): a shard's sig names its CONTENT —
    * the commit path already relies on equal sig ⇒ identical entries to
    * re-reference shard files without re-serialization, so a cached parse
    * under the same sig is sound by the same rule. A rewritten shard
    * publishes a new sig in the manifest list and misses here. */
  private val shardParseCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, (Seq[(String, Long)],
      Map[String, Map[String, (String, String)]],
      Map[String, Map[String, String]]))]()

  private[graft] def readManifest(mf: Path): Manifest =
    readManifestImpl(mf, Nil)._1

  /** Filtered manifest read for the SCAN path: on a sharded table, whole
    * shards whose summary contradicts a pushed filter are skipped BEFORE
    * any parse — the per-file pruning that follows would have dropped
    * every one of their files anyway (shard summary = conservative union
    * of the files' ranges), so the result set is identical and only the
    * parse cost changes. Returns (manifest, shardsParsed, shardsTotal);
    * (-1, -1) marks a legacy single-JSON table. The pruned manifest's
    * `files`/`stats`/`blooms` hold only surviving shards' entries —
    * READ-ONLY: never feed it to writeManifest as priorHint. */
  private[sources] def readManifestPruned(mf: Path,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : (Manifest, Int, Int) = readManifestImpl(mf, filters)

  private def readManifestImpl(mf: Path,
      pruneFilters: Seq[org.apache.spark.sql.sources.Filter])
      : (Manifest, Int, Int) = {
    // Cache only FULL reads: a pruned read's result depends on the filter
    // set (its shardsParsed count is asserted by the sharded-table query);
    // pruned reads still reuse cached shard parses below.
    val full = pruneFilters.isEmpty
    val canon = if (full) mf.toAbsolutePath.normalize else null
    val attrs0 = if (full) statAttrs(canon) else null
    if (attrs0 != null) {
      val hit = manifestCache.get(canon)
      if (hit != null && hit.matches(attrs0)) {
        val sp = if (hit.m.shardCount > 0) hit.m.shardInfo.length else -1
        return (hit.m, sp, sp)
      }
    }
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(Files.readAllBytes(mf), StandardCharsets.UTF_8))
    val schema = DataType.fromJson(root.get("schema").asText()).asInstanceOf[StructType]
    val (files, stats, blooms, shardCount, shardInfo, sParsed, sTotal) =
      if (root.has("shards")) {
        val scount = root.get("shardCount").asInt()
        val sis = root.get("shards").elements().asScala.map { s =>
          val summary = Option(s.get("summary")).map(_.properties().asScala
            .map { e =>
              e.getKey -> (e.getValue.get("min").asText(),
                e.getValue.get("max").asText())
            }.toMap).getOrElse(Map.empty[String, (String, String)])
          val tuples = Option(s.get("tuples")).toSeq
            .flatMap(_.elements().asScala).map { t =>
              t.properties().asScala.map(e =>
                e.getKey -> e.getValue.asText()).toMap
            }
          ShardInfo(s.get("id").asInt(), s.get("file").asText(),
            s.get("count").asLong(), s.get("rows").asLong(),
            s.get("sig").asText(), summary, tuples)
        }.toSeq
        val partCache = scala.collection.mutable.HashMap
          .empty[String, Option[GraftPartition.PTransform]]
        val survivors =
          if (pruneFilters.isEmpty) sis
          else sis.filter { si =>
            pruneFilters.forall(f => mayMatch(schema, si.summary, f)) &&
              // tuple-set pruning: the shard survives iff SOME recorded
              // tuple may match every filter — each tuple runs the exact
              // per-file partition test, so a shard is dropped only when
              // every file in it would have been dropped anyway
              (si.tuples.isEmpty || si.tuples.exists { t =>
                val spec = GraftPartition.fileSpecOf(t, schema, partCache)
                pruneFilters.forall(f =>
                  GraftPartition.mayMatch(spec, t, f))
              })
          }
        val (f, st, bl) =
          parseShards(mf.getParent.resolve(ShardDirName), survivors)
        (f, st, bl, scount, sis, survivors.length, sis.length)
      } else {
        val (f, st, bl) = parseFileEntries(root)
        (f, st, bl, 0, Seq.empty[ShardInfo], -1, -1)
      }
    val upTo = Option(root.get("compactedUpTo")).map(_.asLong()).getOrElse(-1L)
    val deltas = Option(root.get("deltas")).toSeq.flatMap(_.elements().asScala)
      .map(d => DeltaFile(d.get("name").asText(), d.get("inserts").asLong(),
        d.get("deletes").asLong()))
    val removed = Option(root.get("removed")).toSeq.flatMap(_.elements().asScala)
      .map(r => RemovedFile(r.get("name").asText(), r.get("rows").asLong(),
        r.get("at").asLong()))
    val rw = Option(root.get("rewrittenUpTo")).map(_.asLong()).getOrElse(-1L)
    val ver = Option(root.get("version")).map(_.asLong()).getOrElse(0L)
    val ets = Option(root.get("epochTs")).map { o =>
      o.properties().iterator().asScala
        .map(e => e.getKey.toLong -> e.getValue.asLong()).toMap
    }.getOrElse(Map.empty[Long, Long])
    val txn = Option(root.get("txn")).map { o =>
      o.properties().iterator().asScala
        .map(e => e.getKey.toLong -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[Long, String])
    val checks = Option(root.get("checks")).map { o =>
      o.properties().iterator().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    val refs = Option(root.get("refs")).map { o =>
      o.properties().iterator().asScala.map { e =>
        e.getKey -> (e.getValue.get("epoch").asLong(),
          e.getValue.get("kind").asText())
      }.toMap
    }.getOrElse(Map.empty[String, (Long, String)])
    val pspec = Option(root.get("partitionSpec")).toSeq
      .flatMap(_.elements().asScala).map(_.asText())
    val dropped = Option(root.get("droppedPids")).toSeq
      .flatMap(_.elements().asScala).map(_.asInt())
    val sbase = Option(root.get("streamBase")).map { o =>
      o.properties().iterator().asScala
        .map(e => e.getKey -> e.getValue.asLong()).toMap
    }.getOrElse(Map.empty[String, Long])
    val m = Manifest(schema, files, upTo, stats, blooms, deltas, removed, rw,
      ver, txn, ets, checks, refs, pspec, dropped, sbase, shardCount, shardInfo)
    if (attrs0 != null) {
      // cache only when the file is provably the one stat'ed before the
      // read (a publish racing between stat and read would otherwise bind
      // the NEW content to attributes a later stat can never produce —
      // harmless — but skipping the put keeps the invariant trivial)
      val attrs1 = statAttrs(canon)
      if (attrs1 != null && java.util.Objects.equals(
            attrs0.fileKey, attrs1.fileKey) &&
          attrs0.size == attrs1.size &&
          attrs0.lastModifiedTime == attrs1.lastModifiedTime) {
        if (manifestCache.size > 512) manifestCache.clear()
        manifestCache.put(canon,
          MfCacheEntry(attrs1.fileKey, attrs1.size,
            attrs1.lastModifiedTime, m))
      }
    }
    (m, sParsed, sTotal)
  }

  private val EpochFileRe = """epoch-(\d+)-.*""".r
  /** SHALLOW-CLONE manifests reference foreign files by absolute path; any
    * name-shape test (epoch parsing, epoch-published probes, the
    * keep-history rule) must look at the BASENAME. */
  private[sources] def baseName(name: String): String =
    name.substring(name.lastIndexOf('/') + 1)
  private[graft] def epochOf(name: String): Long = baseName(name) match {
    case EpochFileRe(e) => e.toLong
    case _              => 0L // batch-written files count as epoch 0
  }

  /** A manifest entry naming a file OUTSIDE the table directory — a
    * SHALLOW CLONE's reference into its source table. Foreign files are
    * read in place and NEVER deleted by this table's maintenance (vacuum /
    * compaction / truncate only drop the reference). */
  private[sources] def isForeign(name: String): Boolean =
    Paths.get(name).isAbsolute

  /** Resolve a manifest entry to its on-disk location: local names under
    * the table dir, foreign (clone-referenced) names as-is. */
  private[sources] def dataPath(dir: String, name: String): Path = {
    val p = Paths.get(name)
    if (p.isAbsolute) p else Paths.get(dir, name)
  }

  /** Delete a manifest-referenced file ONLY if this table owns it — a
    * clone must never reach into its source's directory. */
  private[sources] def deleteOwned(dir: String, name: String): Unit =
    if (!isForeign(name)) Files.deleteIfExists(Paths.get(dir, name)): Unit

  /** Delete `names` from `dir`, skipping foreign references AND files a
    * live external SHALLOW CLONE still references (back-ref registry):
    * clone-held survivors stay on disk as manifest-unreferenced strays
    * the orphan sweep reports as `clone-referenced` and reclaims once
    * the clone drops. Every maintenance/DML path that physically
    * reclaims data files goes through here (vacuum has its own guard) —
    * a source deleting a file a clone serves would dangle the clone with
    * no fence to catch it. */
  private[sources] def deleteOwnedUnheld(dir: String,
      names: Seq[String]): Unit = {
    if (names.isEmpty) return
    val held = cloneReferenced(dir)
    names.foreach { n =>
      if (!isForeign(n) &&
          !held.contains(Paths.get(dir, n).toAbsolutePath.normalize))
        Files.deleteIfExists(Paths.get(dir, n)): Unit
    }
  }

  /** Encode one row in the tab-separated line format — shared by the data
    * writer and the delta writer's insert records. `observed(i)` receives
    * the value's string image for non-null columns (the stats/bloom feed;
    * "NaN" on a double column flags stats poisoning), stays null for SQL
    * NULL — EXCEPT long-backed columns (int/long/date/timestamp), which
    * always leave it null (r20): their stats consumer reads primitives
    * straight from the row (null-ness via row.isNullAt), so the per-field
    * string was pure allocation. */
  private[sources] def encodeRow(schema: StructType, row: InternalRow,
      sb: StringBuilder, observed: Array[String],
      // physical->logical map from [[byPidOf]]; null = identity layout.
      // Non-null, the line is emitted in PHYSICAL position order with
      // the null marker at retired holes — every file shares one global
      // positional layout regardless of renames/drops since its write.
      byPid: Array[Int] = null): Unit = {
    require(row.numFields == schema.length,
      s"graft_kv: writer got a ${row.numFields}-field row for a " +
        s"${schema.length}-column schema (${schema.fieldNames.mkString(",")})")
    def field(i: Int): Unit = {
      observed(i) = null
      if (row.isNullAt(i)) sb.append("\\N") // null marker: backslash-N
      else schema(i).dataType match {
        // long-backed types leave observed(i) null (r20): the stats writer
        // reads these columns' primitives straight from the row (null-ness
        // via row.isNullAt, HLL via hllAddLong, min/max images built only
        // on a new extreme) — materializing the string per field per row
        // was pure allocation. sb.append(long) writes digits directly.
        case IntegerType =>
          sb.append(row.getInt(i))
        case LongType =>
          sb.append(row.getLong(i))
        case TimestampType | TimestampNTZType =>
          // Catalyst-internal micros since epoch (UTC / wall-clock)
          sb.append(row.getLong(i))
        case DateType => // Catalyst-internal epoch days
          sb.append(row.getInt(i))
        case DoubleType =>
          // one Double.toString per value (r21): sb.append(double) runs the
          // same FloatingDecimal conversion internally, so appending the
          // string image halves the dominant cost of a double field
          val d = row.getDouble(i).toString
          sb.append(d); observed(i) = d
        case FloatType =>
          // Float.toString = the SHORTEST decimal that round-trips via
          // parseFloat — one canonical image per float value (built once,
          // appended as the image — same r21 note as DoubleType)
          val fl = row.getFloat(i).toString
          sb.append(fl); observed(i) = fl
        case BooleanType =>
          val b = row.getBoolean(i); sb.append(b); observed(i) = b.toString
        case dt: DecimalType =>
          // plain string at the declared scale — one canonical image per
          // value, so stats/HLL/equality all agree with the filter side
          val v = row.getDecimal(i, dt.precision, dt.scale)
            .toJavaBigDecimal.toPlainString
          sb.append(v); observed(i) = v
        case at: ArrayType =>
          val cell = GraftKvSink.encodeArrayCell(at.elementType,
            row.getArray(i))
          sb.append(cell); observed(i) = cell
        case StringType =>
          val s = row.getUTF8String(i).toString
          require(!s.contains('\t') && !s.contains('\n'),
            s"graft_kv: tab/newline in string value for '${schema(i).name}'")
          // a literal leading backslash gets doubled so the null marker
          // can never collide with real data
          if (s.startsWith("\\")) sb.append('\\')
          sb.append(s)
          observed(i) = s
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
    }
    if (byPid == null) {
      var i = 0
      while (i < schema.length) {
        if (i > 0) sb.append('\t')
        field(i)
        i += 1
      }
    } else {
      var p = 0
      while (p < byPid.length) {
        if (p > 0) sb.append('\t')
        if (byPid(p) < 0) sb.append("\\N") else field(byPid(p))
        p += 1
      }
    }
    sb.append('\n')
  }

  /** One column's canonical string image (null -> null) — the same
    * encoding [[encodeRow]] produces per field, factored out for the
    * partition router which must know a row's tuple BEFORE any line is
    * built (the line lands in the tuple's own file). */
  private[sources] def encodeValue(dt: DataType, row: InternalRow,
      i: Int): String =
    if (row.isNullAt(i)) null
    else dt match {
      case IntegerType   => row.getInt(i).toString
      case LongType      => row.getLong(i).toString
      case TimestampType | TimestampNTZType =>
        row.getLong(i).toString // internal micros
      case DateType      => row.getInt(i).toString // internal epoch days
      case DoubleType    => row.getDouble(i).toString
      case FloatType     => row.getFloat(i).toString
      case at: ArrayType =>
        encodeArrayCell(at.elementType, row.getArray(i))
      case BooleanType   => row.getBoolean(i).toString
      case d: DecimalType =>
        row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString
      case StringType    => row.getUTF8String(i).toString
      case other => throw new IllegalStateException(s"unsupported $other")
    }

  /** Typed "a <= b" over the stringly-stored stats values. Strings compare
    * in UTF8String BINARY order — the order Spark's own string comparisons
    * use; Java's compareTo is UTF-16 order, which disagrees beyond the BMP
    * (surrogates sort below U+E000 in UTF-16 but above it in UTF-8), and a
    * pruning order that disagrees with the engine's would silently drop
    * matching files. */
  private def le(dt: DataType, a: String, b: String): Boolean = dt match {
    case IntegerType | LongType |
         TimestampType | TimestampNTZType | DateType => a.toLong <= b.toLong
    case DoubleType               => a.toDouble <= b.toDouble
    // parseFloat(toString(f)) == f exactly (Java's shortest-decimal
    // round-trip guarantee), so float images compare in true IEEE order
    case FloatType                => a.toFloat <= b.toFloat
    case _: DecimalType =>
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) <= 0
    // BOOLEAN falls through to string order: "false" < "true" in UTF-8
    // binary order, which matches the engine's false < true
    case _ => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) <= 0
  }

  /** Can a file whose column range is [mn, mx] contain a row satisfying
    * the filter? Conservative: unknown filter shapes / unknown columns
    * never prune. Sound under nulls (stats cover non-null values only,
    * and every handled predicate is null-rejecting). */
  private[sources] def mayMatch(schema: StructType,
      stats: Map[String, (String, String)],
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def rangeOf(col: String): Option[(DataType, String, String)] = for {
      field <- schema.fields.find(_.name.equalsIgnoreCase(col))
      (mn, mx) <- stats.find(_._1.equalsIgnoreCase(col)).map(_._2)
    } yield (field.dataType, mn, mx)
    // a NULL comparison value matches no row at all (three-valued logic),
    // so for equality pruning it contributes nothing — and feeding it to
    // toLong would throw on a query that should simply return no rows
    def contains(col: String, v: Any): Boolean =
      v != null && (rangeOf(col) match {
        case Some((dt, mn, mx)) =>
          val s = canonValue(dt, v)
          le(dt, mn, s) && le(dt, s, mx)
        case None => true
      })
    // canonValue falls through to String.valueOf for value shapes it does
    // not recognize; on a numeric-ordered column le() would then throw at
    // PLANNING time. An unparseable image must DECLINE to prune (the
    // bloom path's conservative rule), never fail the query.
    try f match {
      case EqualTo(c, v)  => contains(c, v)
      case In(c, vs)      => vs.exists(contains(c, _))
      // max > v  <=>  NOT (max <= v); min < v  <=>  NOT (v <= min)
      case GreaterThan(c, v) => v != null && rangeOf(c)
        .forall { case (dt, _, mx) => !le(dt, mx, canonValue(dt, v)) }
      case GreaterThanOrEqual(c, v) => v != null && rangeOf(c)
        .forall { case (dt, _, mx) => le(dt, canonValue(dt, v), mx) }
      case LessThan(c, v) => v != null && rangeOf(c)
        .forall { case (dt, mn, _) => !le(dt, canonValue(dt, v), mn) }
      case LessThanOrEqual(c, v) => v != null && rangeOf(c)
        .forall { case (dt, mn, _) => le(dt, mn, canonValue(dt, v)) }
      case And(l, r) => mayMatch(schema, stats, l) && mayMatch(schema, stats, r)
      case Or(l, r)  => mayMatch(schema, stats, l) || mayMatch(schema, stats, r)
      case _         => true
    } catch { case _: NumberFormatException => true }
  }

  /** Is the named file PROVABLY outside the conjunction `fs` — some
    * conjunct contradicted by its recorded partition tuple, min/max
    * stats, or bloom? The ONE disjointness proof every conflict gate
    * shares (CoW rewrite, replaceWhere, MOR delta): a soundness fix here
    * fixes them all. Conservative: false whenever unprovable. */
  private[sources] def fileProvablyOutside(m: Manifest, name: String,
      fs: Seq[org.apache.spark.sql.sources.Filter],
      cache: scala.collection.mutable.Map[String, Option[GraftPartition.PTransform]])
      : Boolean = {
    val st = m.stats.getOrElse(name, Map.empty)
    lazy val bl = m.blooms.getOrElse(name, Map.empty)
    val parts = GraftPartition.filePartsOf(st)
    lazy val spec = GraftPartition.fileSpecOf(parts, m.schema, cache)
    fs.exists(f => !mayMatch(m.schema, st, f) ||
      !bloomMayMatch(m.schema, bl, f) ||
      (parts.nonEmpty && !GraftPartition.mayMatch(spec, parts, f)))
  }

  /** HBase's HFile-bloom story: point/IN probes additionally consult the
    * file's per-column bloom — the pruner that works where min/max ranges
    * can't (value sets interleaved across files share the full range).
    * One-sided like all blooms: "false" guarantees absence. */
  private[sources] def bloomMayMatch(schema: StructType,
      blooms: Map[String, String],
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def might(col: String, v: Any): Boolean = (for {
      field <- schema.fields.find(_.name.equalsIgnoreCase(col))
      b64 <- blooms.find(_._1.equalsIgnoreCase(col)).map(_._2)
    } yield {
      val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(
          java.util.Base64.getDecoder.decode(b64)))
      (field.dataType, v) match {
        case (IntegerType | LongType, n: java.lang.Number) =>
          bf.mightContainLong(n.longValue())
        case (StringType, s: String) => bf.mightContainString(s)
        case (TimestampType | TimestampNTZType | DateType, _) =>
          // blooms over time columns index the canonical micros/days long
          try bf.mightContainLong(canonValue(field.dataType, v).toLong)
          catch { case _: NumberFormatException => true }
        case _ => true
      }
    }).getOrElse(true)
    f match {
      case EqualTo(c, v) => might(c, v)
      case In(c, vs)     => vs.exists(might(c, _))
      case And(l, r) =>
        bloomMayMatch(schema, blooms, l) && bloomMayMatch(schema, blooms, r)
      case Or(l, r) =>
        bloomMayMatch(schema, blooms, l) || bloomMayMatch(schema, blooms, r)
      case _ => true
    }
  }

  /** COMPACTION + RETENTION — the major-compaction / log-retention analogue
    * for the epoch changelog: every file of epoch <= `upTo` (including
    * epoch-less batch files, which count as epoch 0) is concatenated into
    * ONE `epoch-<upTo>-compacted.kv` file, the manifest swaps the inputs
    * for that file atomically (single visibility switch, like every other
    * publish here), and the superseded files are deleted. The data files
    * are line-oriented with a manifest-held schema, so compaction is a
    * driver-side streaming byte concat — no job, no re-encode; at cluster
    * scale this per-directory maintenance runs one task per table shard.
    * Reads of the CURRENT state and of any asOfEpoch >= upTo are
    * bit-identical before/after; asOfEpoch < upTo now names vacuumed
    * history and errors clearly instead of returning partial rows, and a
    * streaming read whose checkpoint ends strictly inside the compacted
    * range refuses to resume (it could only replay duplicates). Returns
    * the number of files removed (0 = nothing to do). */
  /** GARBAGE COLLECTION (the HBase HFile-cleaner analogue): delete every
    * `.kv` data file the manifest does not list. Healthy operation leaves
    * no garbage — commits and compaction clean up after themselves — but a
    * crash between a file move and the manifest publish (or a killed
    * abort) can orphan files; readers never see them (manifest-listed
    * only), this reclaims the space. `.tmp` task attempts older than the
    * grace window are presumed dead and reclaimed too (commits sweep only
    * their own writeId-scoped temps, so crashed jobs' attempts land
    * here) — the grace window is the liveness proxy, exactly Delta's
    * tombstone-retention contract: size `graceMs` above the longest write
    * a live job can take, and never pass 0 while writers may be running.
    * The manifest itself is never touched. Returns the number of files
    * removed. */
  /** A wall-clock argument in any of the three spellings users actually
    * have at hand: epoch-millis, ISO-8601 instant, or the SQL timestamp
    * DESCRIBE HISTORY renders (`yyyy-MM-dd HH:mm:ss[.S]`, session-local). */
  private[graft] def parseTsMillis(s: String): Long =
    try s.toLong
    catch { case _: NumberFormatException =>
      try java.time.Instant.parse(s).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        java.sql.Timestamp.valueOf(s).getTime }
    }

  /** `VACUUM … DRY RUN`: the files a real vacuum would act on right now,
    * as (name, reason) rows — reason ∈ stray-data / stray-delta /
    * stale-attempt / retained-history / foreign-reference-dropped (a
    * clone's references leave the manifest but the source file is never
    * deleted). Read-only: nothing is deleted, no manifest is written. */
  def vacuumDryRun(dir: String,
      graceMs: Long = 10 * 60 * 1000L): Seq[(String, String)] = {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m0 = readManifest(mfp)
    val listed = m0.files.map(_._1).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val listedDeltas = m0.deltas.map(_.name).toSet
    val listedRemoved = m0.removed.map(_.name).toSet
    val cloneHeld = cloneReferenced(dir)
    val stray = {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.flatMap { p =>
        val n = p.getFileName.toString
        val aged = Files.getLastModifiedTime(p).toMillis <= cutoff
        if (cloneHeld.contains(p.toAbsolutePath.normalize))
          None // mirrored: the real vacuum never reclaims clone-held files
        else if (!aged) None
        else if (n.endsWith(".kv") && !listed.contains(n) &&
          !listedRemoved.contains(n)) Some(n -> "stray-data")
        else if (n.endsWith(".kvd") && !listedDeltas.contains(n))
          Some(n -> "stray-delta")
        else if (n.endsWith(".tmp")) Some(n -> "stale-attempt")
        else None
      }.toSeq
      finally s.close()
    }
    // the preview must mirror the real vacuum's TAG + CLONE partition
    // exactly (the spec pins preview == actual): pinned retained files
    // are not reclaimable and never appear here
    val taggedEpochs = m0.refs.values.map(_._1).toSet
    val reclaimable = m0.removed.filterNot(r =>
      taggedEpochs.exists(t => epochOf(r.name) <= t && t < r.removedAt) ||
        (!isForeign(r.name) && cloneHeld.contains(
          dataPath(dir, r.name).toAbsolutePath.normalize)))
    val reclaimHistory = reclaimable.nonEmpty && reclaimable.forall { r =>
      val p = dataPath(dir, r.name)
      !Files.exists(p) || m0.epochTs.get(r.removedAt)
        .getOrElse(Files.getLastModifiedTime(p).toMillis) <= cutoff
    }
    stray ++ (if (!reclaimHistory) Nil else reclaimable.map { r =>
      r.name -> (if (isForeign(r.name)) "foreign-reference-dropped"
      else "retained-history")
    })
  }

  def vacuum(dir: String, graceMs: Long = 10 * 60 * 1000L): Int = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m0 = readManifest(mfp)
    val listed = m0.files.map(_._1).toSet
    // grace window: a concurrent batch commit moves task files to their
    // final .kv names BEFORE publishing the manifest, so a vacuum racing
    // that window would delete freshly-committed data the manifest is
    // about to reference. Files younger than the grace period are skipped
    // (the Delta/Iceberg retention-threshold contract); pass 0 only when
    // no writer can be live.
    val cutoff = System.currentTimeMillis() - graceMs
    val listedDeltas = m0.deltas.map(_.name).toSet
    val listedRemoved = m0.removed.map(_.name).toSet
    // files a live external SHALLOW CLONE still references (back-ref
    // registry) are never reclaimed — by the stray sweep OR the retained-
    // history fold below — even when this table's own manifests dropped
    // them (e.g. a TRUNCATE restarted history while a clone still serves
    // the old state)
    val cloneHeld = cloneReferenced(dir)
    val stray = Files.list(Paths.get(dir)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        ((n.endsWith(".kv") && !listed.contains(n) && !listedRemoved.contains(n)) ||
          (n.endsWith(".kvd") && !listedDeltas.contains(n)) ||
          // aged-out task attempts from crashed jobs: commits sweep only
          // their own writeId-scoped temps, so vacuum reclaims the rest
          n.endsWith(".tmp")) &&
          !cloneHeld.contains(p.toAbsolutePath.normalize) &&
          Files.getLastModifiedTime(p).toMillis <= cutoff
      }.toSeq
    stray.foreach(Files.deleteIfExists(_))
    // retired shard files left behind by an unshard reclaim here (the
    // sharded layout GCs its own generations on every publish)
    sweepStaleShardDir(dir)
    // RETAINED CoW HISTORY: vacuum is the retention boundary — reclaim the
    // superseded files and raise the time-travel fence to the rewrite
    // epoch, after which pre-DML asOfEpoch reads error like any vacuumed
    // range (the Delta/Iceberg VACUUM contract). A superseded file ages
    // from its SUPERSEDING COMMIT's recorded timestamp (the honest
    // "RETAIN n MINUTES of history" clock — file mtimes are a transport
    // detail and only the fallback for pre-timestamp manifests).
    // All-or-nothing under the same grace window so a half-reclaimed
    // window can never half-answer. TAG protection: a retained file whose
    // [own epoch, removedAt) window covers a tagged epoch is what that
    // tag's boundary state reconstructs from — it stays in `removed`
    // (and on disk) until the tag is dropped, the Iceberg
    // tag-pins-snapshot-against-expiry rule; only the unprotected rest
    // participates in the all-or-nothing window.
    val taggedEpochs = m0.refs.values.map(_._1).toSet
    def pinnedByTag(r: RemovedFile): Boolean =
      taggedEpochs.exists(t => epochOf(r.name) <= t && t < r.removedAt)
    // clone-held retained files are pinned exactly like tag-pinned ones:
    // they stay in `removed` (and on disk) until the clone is dropped —
    // the external-table analogue of the tag-pins-snapshot rule
    val (pinned, reclaimable) = m0.removed.partition(r =>
      pinnedByTag(r) || (!isForeign(r.name) &&
        cloneHeld.contains(dataPath(dir, r.name).toAbsolutePath.normalize)))
    val reclaimHistory = reclaimable.nonEmpty && reclaimable.forall { r =>
      val p = dataPath(dir, r.name)
      !Files.exists(p) || m0.epochTs.get(r.removedAt)
        .getOrElse(Files.getLastModifiedTime(p).toMillis) <= cutoff
    }
    if (reclaimHistory) {
      writeManifest(dir, m0.schema, m0.files,
        math.max(m0.compactedUpTo, m0.rewrittenUpTo),
        m0.stats, m0.blooms, m0.deltas, pinned, m0.rewrittenUpTo,
        priorHint = Some(m0))
      reclaimable.foreach(r => deleteOwned(dir, r.name))
    }
    // report only files actually DELETED: a clone's foreign references
    // are dropped from the manifest but never removed from the source
    stray.length +
      (if (reclaimHistory) reclaimable.count(r => !isForeign(r.name)) else 0)
  }

  /** REMOVE ORPHAN FILES (the Iceberg `remove_orphan_files` shape): delete
    * data/delta/attempt files that NO reachable manifest references —
    * crash leftovers from a failed move-then-publish — across the table
    * directory AND every live branch's subdirectory (vacuum's stray sweep
    * is per-directory; this is the whole-table janitor). The referenced
    * set is the union over ALL reachable manifests — the table's own and
    * each live branch head's — of live files, MOR deltas, and retained
    * (CoW-superseded) history, with ABSOLUTE fork/clone references
    * resolved to their target paths, so a parent file held only by a
    * branch fork is never an orphan. Only files strictly older than the
    * horizon qualify (mtime is the liveness proxy for in-flight writers —
    * the Iceberg default is 3 days for exactly this race); the manifest,
    * lock, and sidecar files are never candidates (suffix-scoped scan).
    * `dryRun` lists instead of deleting. Returns (path, action) rows. */
  def removeOrphans(dir: String, horizonMs: Long,
      dryRun: Boolean): Seq[(String, String)] = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    require(horizonMs >= 0L, s"graft_kv: horizon must be >= 0, got $horizonMs")
    val m0 = readManifest(mfp)
    // every reachable manifest: the table's own + each LIVE branch head's
    // (dropped branches removed their directories with them)
    val scopes: Seq[(String, Manifest)] = (dir -> m0) +:
      m0.refs.toSeq.collect { case (n, (_, "branch")) =>
        val bd = branchDirOf(dir, n)
        val bmp = manifestPath(bd)
        if (Files.exists(bmp)) Some(bd -> readManifest(bmp)) else None
      }.flatten
    // referenced = every name any reachable manifest can still serve,
    // resolved to an absolute path (fork/clone references are absolute
    // and may point into ANOTHER scope's directory — resolving them is
    // what makes "referenced only by a branch" safe)
    val referenced: Set[Path] = scopes.flatMap { case (sd, m) =>
      (m.files.map(_._1) ++ m.deltas.map(_.name) ++ m.removed.map(_.name))
        .map(n => dataPath(sd, n).toAbsolutePath.normalize)
    }.toSet
    // files a LIVE external SHALLOW CLONE still references (back-ref
    // registry): held, never deleted — and REPORTED, so an operator sees
    // what an external table pins before wondering why space stayed used
    val cloneHeld: Set[Path] = cloneReferenced(dir)
    val cutoff = System.currentTimeMillis() - horizonMs
    val acted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    scopes.foreach { case (sd, _) =>
      // take THIS scope's commit lock for its directory sweep (branch
      // commits lock the BRANCH dir, not the parent's): a branch writer
      // mid move-then-publish is otherwise protected only by the mtime
      // horizon, and Files.move preserves mtime — a delayed publish of a
      // file written before the horizon could be reclaimed just before
      // its manifest appears. Under the lock, re-read the scope's head
      // and re-check membership: anything published since the global
      // read joins the referenced set.
      withCommitLock(sd) {
        val fresh =
          if (sd == dir) Set.empty[Path] // own manifest read under our lock
          else {
            val bmp = manifestPath(sd)
            if (!Files.exists(bmp)) Set.empty[Path]
            else {
              val bm = readManifest(bmp)
              (bm.files.map(_._1) ++ bm.deltas.map(_.name) ++
                bm.removed.map(_.name))
                .map(n => dataPath(sd, n).toAbsolutePath.normalize).toSet
            }
          }
        val s = Files.list(Paths.get(sd))
        try s.iterator().asScala.foreach { p =>
          val n = p.getFileName.toString
          val candidate = n.endsWith(".kv") || n.endsWith(".kvd") ||
            n.endsWith(".tmp")
          val abs = p.toAbsolutePath.normalize
          if (candidate && !referenced.contains(abs) &&
              !fresh.contains(abs)) {
            if (cloneHeld.contains(abs))
              acted += p.toString -> "clone-referenced"
            else if (Files.getLastModifiedTime(p).toMillis <= cutoff) {
              if (!dryRun) Files.deleteIfExists(p)
              acted += p.toString -> (if (dryRun) "orphan" else "deleted")
            }
          }
        } finally s.close()
      }
    }
    acted.toSeq
  }

  /** Maintenance reshard (two-level manifest, SURVEY §7.45): rewrite the
    * manifest into `n` shards — pure metadata, no data file moves, one
    * atomic list publish under the commit lock like any commit. `n = 0`
    * restores the legacy single-JSON layout, refused past the split
    * threshold (that is the measured driver-OOM cliff the shards exist
    * to avoid). Normally tables split THEMSELVES at the threshold; this
    * is the explicit knob (`ALTER TABLE … SET TBLPROPERTIES
    * ('manifest.shards'='n')`) for opting in early or re-balancing. */
  def reshardManifest(dir: String, n: Int): Unit = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    require(n >= 0 && n <= 4096,
      s"graft_kv: manifest shard count out of range [0, 4096]: $n")
    val m = readManifest(mfp)
    require(n > 0 || m.files.size < shardSplitThreshold,
      s"graft_kv: cannot restore the single-JSON manifest with " +
        s"${m.files.size} live file entries (>= the $shardSplitThreshold " +
        "split threshold — the measured single-JSON scale cliff)")
    writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
      m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
      reshardTo = Some(n), priorHint = Some(m))
    if (n == 0) {
      // back on the legacy layout every shard file is unreferenced — but
      // a lock-free reader may still hold the SHARDED list it resolved a
      // moment ago (review catch: immediate deletion raced it with zero
      // grace). Stamp retirement NOW and leave the files; vacuum's shard
      // sweep reclaims them past the same grace window the sharded GC
      // grants, and removes the then-empty directory.
      val sd = shardDirPath(dir)
      if (Files.exists(sd)) {
        val now = java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis())
        val s = Files.list(sd)
        try s.iterator().asScala.foreach { p =>
          try Files.setLastModifiedTime(p, now): Unit
          catch { case _: java.io.IOException => }
        } finally s.close()
      }
    }
  }

  /** Reclaim retired shard files on a LEGACY-layout table (an unshard
    * leaves them behind under the reader grace window; sharded tables GC
    * their own) and drop the directory once empty. Called from vacuum. */
  private def sweepStaleShardDir(dir: String): Unit = {
    val sd = shardDirPath(dir)
    if (!Files.exists(sd)) return
    val mfp = manifestPath(dir)
    if (Files.exists(mfp) && readManifest(mfp).shardCount > 0) return
    val cutoff = System.currentTimeMillis() - ShardGcGraceMs
    val s = Files.list(sd)
    try s.iterator().asScala.foreach { p =>
      if (Files.getLastModifiedTime(p).toMillis <= cutoff)
        Files.deleteIfExists(p): Unit
    } finally s.close()
    val s2 = Files.list(sd)
    val empty = try !s2.iterator().hasNext finally s2.close()
    if (empty) Files.deleteIfExists(sd): Unit
  }

  /** CREATE TAG (Iceberg's named-ref shape): pin `epoch`'s boundary state
    * under `name` — VERSION AS OF '<name>' resolves through the manifest's
    * refs map, compaction clamps at the oldest tag, and vacuum keeps the
    * retained CoW files the tagged state reconstructs from. The epoch must
    * name an answerable committed boundary NOW (pinning vacuumed history
    * would promise a read that cannot be served). */
  def createRef(dir: String, name: String, epochRequested: Option[Long],
      kind: String = "tag"): Long = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"graft_kv: ref name must be alphanumeric/underscore, got '$name'")
    require(!m.refs.contains(name),
      s"graft_kv: ref '$name' already exists at $dir (DROP TAG it first)")
    val head = (m.files.map(f => epochOf(f._1)) ++
      m.deltas.map(d => epochOf(d.name)) ++ m.removed.map(_.removedAt) ++
      Seq(m.rewrittenUpTo, m.compactedUpTo)).max.max(0L)
    val epoch = epochRequested.getOrElse(head)
    requireAnswerableEpoch(m, epoch)
    writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
      m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
      refs = m.refs + (name -> (epoch, kind)), priorHint = Some(m))
    epoch
  }

  /** DROP TAG: unpin — the next vacuum may reclaim what only the tag
    * held, and compaction's clamp moves to the next-oldest ref. */
  def dropRef(dir: String, name: String): Unit = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    require(m.refs.contains(name),
      s"graft_kv: no ref named '$name' at $dir " +
        s"(existing: ${m.refs.keys.toSeq.sorted.mkString(", ")})")
    writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
      m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
      refs = m.refs - name, priorHint = Some(m))
  }

  /** The table's named refs, for SHOW TAGS. */
  def refsOf(dir: String): Seq[(String, Long, String)] = {
    val mfp = manifestPath(dir)
    if (!Files.exists(mfp)) Nil
    else readManifest(mfp).refs.toSeq
      .map { case (n, (e, k)) => (n, e, k) }.sortBy(_._1)
  }

  /** A ref's kind ("tag" | "branch"), or None if absent. */
  def refKind(dir: String, name: String): Option[String] = {
    val mfp = manifestPath(dir)
    if (!Files.exists(mfp)) None
    else readManifest(mfp).refs.get(name).map(_._2)
  }

  /** The managed home of a branch's own state: a subdirectory of the
    * table, invisible to the parent's maintenance (file listings are
    * non-recursive) and owned by the branch alone. */
  def branchDirOf(dir: String, name: String): String =
    Paths.get(dir, s"_branch_$name").toString

  /** CREATE BRANCH (the Iceberg writable-ref shape): a WRITABLE fork of
    * the table at an epoch boundary. Two pieces, both metadata-only:
    *  - a refs entry (kind "branch") in the PARENT manifest pins the fork
    *    epoch — compaction clamps STRICTLY BELOW it (a merge at the fork
    *    would rename files the branch references; a tag, which reads the
    *    merged boundary, tolerates that — a branch cannot), and vacuum
    *    keeps the retained files the fork state reconstructs from;
    *  - a SHALLOW CLONE of that boundary into `_branch_<name>/` under the
    *    table directory is the branch's own head: writes routed to the
    *    branch land there (its appends, CoW rewrites, OPTIMIZE — the full
    *    table machinery, because the branch IS a table), while the parent
    *    advances independently. Branching 100 TB is two manifest writes.
    * `VERSION AS OF '<name>'` reads the branch HEAD (not the fork
    * boundary); `INSERT INTO t.branch_<name>` writes it; FAST FORWARD
    * publishes it back. TRUNCATE on the parent remains the documented
    * shallow-clone caveat: it reclaims files any fork still references. */
  def createBranch(dir: String, name: String,
      asOf: Option[Long] = None): Long = {
    val epoch = createRef(dir, name, asOf, kind = "branch")
    try {
      val bd = branchDirOf(dir, name)
      // self-heal an orphaned branch directory (a TRUNCATE or crash can
      // drop the ref while leaving the clone): the ref was provably free
      // a moment ago, so anything at the branch path is garbage
      val bdp = Paths.get(bd)
      if (Files.exists(bdp)) {
        val w = Files.walk(bdp)
        try w.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally w.close()
      }
      shallowClone(dir, bd, Some(epoch))
      // record the parent's DATA-STATE signature at the fork: FAST
      // FORWARD's ancestry proof — robust to the branch later
      // self-localizing (OPTIMIZE folds foreign refs away, so the
      // reference set alone cannot witness the fork anymore)
      withCommitLock(bd) {
        val bm = readManifest(manifestPath(bd))
        writeManifest(bd, bm.schema, bm.files, bm.compactedUpTo, bm.stats,
          bm.blooms, bm.deltas, bm.removed, bm.rewrittenUpTo,
          refs = bm.refs + ("__fork__" ->
            (epoch, "base:" + stateSig(readManifest(manifestPath(dir))))),
          priorHint = Some(bm))
      }
    } catch { case e: Throwable => dropRef(dir, name); throw e }
    epoch
  }

  /** The parent-state fingerprint FAST FORWARD verifies: current files
    * (names + rows), live deltas, and both history boundaries. Retained-
    * history/ref/timestamp changes do not affect what a fork reads, but
    * boundary moves (vacuum raising the fence) count — conservatively. */
  private def stateSig(m: Manifest): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val body = (m.files.map { case (n, r) => s"$n:$r" }.sorted ++
      m.deltas.map(d => s"d:${d.name}:${d.inserts}:${d.deletes}").sorted ++
      Seq(s"c:${m.compactedUpTo}", s"r:${m.rewrittenUpTo}")).mkString("\n")
    md.digest(body.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** DROP BRANCH: unpin the fork and delete the branch's own state
    * (branch-LOCAL files only — foreign references into the parent are
    * just forgotten, the deleteOwned rule). */
  def dropBranch(dir: String, name: String): Unit = {
    require(refKind(dir, name).contains("branch"),
      s"graft_kv: '$name' is not a branch at $dir")
    dropRef(dir, name)
    val bd = Paths.get(branchDirOf(dir, name))
    if (Files.exists(bd)) {
      val s = Files.walk(bd)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally s.close()
    }
  }

  /** FAST FORWARD: publish the branch head as the parent's new current
    * state — the Iceberg fast-forward-publish workflow ("experiment on a
    * branch, then make it main"). Sound only when the parent has NOT
    * advanced past the fork (its head must be the branch's ancestor):
    * verified structurally — every parent-current file must be exactly
    * the branch's foreign reference set, and no parent delta may exist.
    * Branch-local files MOVE into the parent directory (renames, no
    * bytes), foreign references resolve back to local names, and one
    * manifest publish swaps the state; the branch is then dropped.
    * A branch with unfolded MOR deltas refuses (its .kvd records name
    * foreign paths positionally — OPTIMIZE the branch first, which also
    * self-localizes it). */
  def fastForward(dir: String, name: String): Long = withCommitLock(dir) {
    require(refKind(dir, name).contains("branch"),
      s"graft_kv: '$name' is not a branch at $dir")
    val m = readManifest(manifestPath(dir))
    val bd = branchDirOf(dir, name)
    val bmp = manifestPath(bd)
    require(Files.exists(bmp), s"graft_kv: branch '$name' has no manifest")
    val bm = readManifest(bmp)
    require(bm.deltas.isEmpty,
      s"graft_kv: branch '$name' has unfolded merge-on-read deltas — " +
        "OPTIMIZE the branch first")
    // ancestry check: the parent's CURRENT data state must still be the
    // state the branch forked from (no data commits on the parent since)
    // — verified against the fork-time signature the branch recorded, so
    // it survives the branch self-localizing (OPTIMIZE) or rewriting
    // forked files (CoW) on its own side
    require(bm.refs.get("__fork__").exists(_._2 == "base:" + stateSig(m)),
      s"graft_kv: cannot FAST FORWARD '$name' — the parent advanced past " +
        "the fork (or its maintenance moved a history boundary); merge " +
        "manually or re-branch")
    // the publish imports the branch's fold/rewrite boundaries — any
    // SURVIVING ref pinned below them would suddenly name history the
    // parent cannot serve (a tag's answerability contract): refuse and
    // let the user drop the ref or OPTIMIZE less aggressively
    val importedFence = math.max(bm.compactedUpTo, bm.rewrittenUpTo)
    (m.refs - name).foreach { case (rn, (re, _)) =>
      require(re >= importedFence || importedFence < 0L,
        s"graft_kv: FAST FORWARD '$name' would fold history that ref " +
          s"'$rn' (epoch $re) pins — drop it first, or re-branch without " +
          "compacting past it")
    }
    // branch-local names move into the parent dir; foreign refs into the
    // parent resolve back to local names, refs elsewhere stay absolute
    val prefix = Paths.get(dir).toAbsolutePath.toString + "/"
    def rekey(n: String): String =
      if (!isForeign(n)) n // branch-local: moves to parent under its name
      else if (n.startsWith(prefix) && !n.substring(prefix.length).contains("/"))
        n.substring(prefix.length)
      else n
    val moves = (bm.files.map(_._1) ++ bm.removed.map(_.name))
      .filterNot(isForeign)
    moves.foreach { n =>
      require(!Files.exists(Paths.get(dir, n)),
        s"graft_kv: FAST FORWARD name collision on '$n' — a parent file " +
          "already claims it")
    }
    moves.foreach { n =>
      Files.move(Paths.get(bd, n), Paths.get(dir, n))
    }
    val head = (bm.files.map(f => epochOf(f._1)) ++
      Seq(bm.rewrittenUpTo, bm.compactedUpTo)).max.max(0L)
    writeManifest(dir, bm.schema,
      bm.files.map { case (n, r) => (rekey(n), r) },
      math.max(m.compactedUpTo, bm.compactedUpTo),
      bm.stats.map { case (n, v) => rekey(n) -> v },
      bm.blooms.map { case (n, v) => rekey(n) -> v },
      Nil,
      // parent retained history stays (pre-fork states keep traveling);
      // branch-local retained files moved above and join it
      m.removed ++ bm.removed.map(r => r.copy(name = rekey(r.name))),
      math.max(m.rewrittenUpTo, bm.rewrittenUpTo),
      refs = m.refs - name,
      checks = bm.checks,
      partitionSpec = bm.partitionSpec,
      priorHint = Some(m))
    // the branch's own history is published; its directory is now empty
    // shell state — remove it (manifest + lock only; data files moved)
    val s2 = Files.walk(Paths.get(bd))
    try s2.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { Files.deleteIfExists(p); () })
    finally s2.close()
    head
  }

  /** CHERRY-PICK (the Iceberg `cherrypick_snapshot` shape): promote ONE
    * audited epoch's files from a live branch onto the parent as a FRESH
    * parent epoch — the WAP refinement a multi-batch ingest wants when
    * only one staged batch has passed audit. Unlike FAST FORWARD this
    * does NOT require the parent unchanged since the fork: a pure APPEND
    * epoch merges with any parent state (the disjoint-commit matrix's
    * append∥append rule). Everything that is NOT a pure append refuses —
    * a rewrite/delete epoch (removedAt == e) or a MOR-delta epoch
    * position-targets OTHER files whose parent-side state may have
    * diverged since the fork, exactly the phantom class the row-level
    * conflict gate refuses; Iceberg's cherrypick has the same
    * append/dynamic-overwrite-only rule. Schema, partition spec and
    * CHECK constraints must be UNDIVERGED between parent and branch —
    * promoted rows were validated under the branch's invariants, and a
    * parent that tightened them since the fork never audited these rows.
    * Files are COPIED under the fresh epoch's names (the branch keeps
    * serving its own epoch; on an object store this would be a manifest
    * re-reference of the same immutable objects). Returns the fresh
    * parent epoch. */
  def cherryPick(dir: String, branch: String, epoch: Long): Long =
    withCommitLock(dir) {
      require(refKind(dir, branch).contains("branch"),
        s"graft_kv: '$branch' is not a branch at $dir")
      val m = readManifest(manifestPath(dir))
      val bd = branchDirOf(dir, branch)
      val bmp = manifestPath(bd)
      require(Files.exists(bmp), s"graft_kv: branch '$branch' has no manifest")
      val bm = readManifest(bmp)
      // pure-append proof: no removal fence at this epoch (CoW rewrite,
      // metadata DELETE, OPTIMIZE all stamp removedAt), no MOR delta
      require(!bm.removed.exists(_.removedAt == epoch),
        s"graft_kv: branch epoch $epoch rewrites/removes files — only " +
          "pure APPEND epochs cherry-pick (its deletes position-target " +
          "state the parent may not share); FAST FORWARD the branch " +
          "instead")
      require(!bm.deltas.exists(d => epochOf(d.name) == epoch),
        s"graft_kv: branch epoch $epoch carries merge-on-read deltas — " +
          "only pure APPEND epochs cherry-pick; OPTIMIZE the branch and " +
          "FAST FORWARD instead")
      val picked = bm.files.filter { case (n, _) =>
        !isForeign(n) && epochOf(n) == epoch }
      require(picked.nonEmpty,
        s"graft_kv: branch '$branch' has no local files at epoch $epoch")
      // invariant parity: the promoted rows were written and audited
      // under the BRANCH's schema/spec/CHECKs — any divergence means the
      // parent never validated them
      require(m.schema.json == bm.schema.json,
        s"graft_kv: cannot cherry-pick — schema diverged between parent " +
          s"(${m.schema.simpleString}) and branch (${bm.schema.simpleString})")
      require(m.partitionSpec == bm.partitionSpec,
        "graft_kv: cannot cherry-pick — partition spec diverged between " +
          "parent and branch")
      require(m.checks == bm.checks,
        "graft_kv: cannot cherry-pick — CHECK constraints diverged " +
          "between parent and branch (the promoted rows were never " +
          "audited under the parent's)")
      // parent head must count MOR-delta epochs too (a head commit that
      // is a merge-on-read DELETE lives only in m.deltas) — otherwise
      // the picked files land UNDER the delta's epoch number and AS OF /
      // changefeed attribute them to that delta commit (mirror createRef)
      val newEpoch = (m.files.map(f => epochOf(f._1)) ++
        m.deltas.map(d => epochOf(d.name)) ++
        m.removed.map(_.removedAt) ++
        Seq(m.rewrittenUpTo, m.compactedUpTo)).max.max(0L) + 1L
      val renamed = picked.map { case (n, r) =>
        val nn = baseName(n).replaceFirst(s"^epoch-$epoch-",
          s"epoch-$newEpoch-")
        require(!Files.exists(Paths.get(dir, nn)),
          s"graft_kv: cherry-pick name collision on '$nn'")
        Files.copy(Paths.get(bd, n), Paths.get(dir, nn))
        (n, nn, r)
      }
      writeManifest(dir, m.schema,
        m.files ++ renamed.map { case (_, nn, r) => (nn, r) },
        m.compactedUpTo,
        m.stats ++ renamed.flatMap { case (n, nn, _) =>
          bm.stats.get(n).map(nn -> _) },
        m.blooms ++ renamed.flatMap { case (n, nn, _) =>
          bm.blooms.get(n).map(nn -> _) },
        m.deltas, m.removed, m.rewrittenUpTo, priorHint = Some(m))
      newEpoch
    }

  /** Resolve a named ref to its pinned epoch. */
  def resolveRef(dir: String, name: String): Long = {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    m.refs.get(name).map(_._1).getOrElse(throw new IllegalArgumentException(
      s"graft_kv: no ref named '$name' at $dir " +
        s"(existing: ${m.refs.keys.toSeq.sorted.mkString(", ")})"))
  }

  /** RESTORE (Delta's `RESTORE TABLE … TO VERSION AS OF` shape): roll the
    * table's VISIBLE state back to the boundary at `epoch`, as a NEW
    * commit — files appended after the boundary move to retained history
    * (removedAt = the restore epoch), so every pre-restore state still
    * time-travels exactly until vacuum reclaims it, and the restore is
    * itself a history entry with a commit timestamp. No data file is
    * copied, moved, or deleted: the manifest republish IS the restore.
    *
    * Refuses loudly when the semantics would be unsound: an unanswerable
    * boundary (vacuumed / compacted / beyond head); a boundary below a
    * RETAINED row-level rewrite (re-surfacing superseded files would need
    * per-file visibility intervals — VACUUM the history or restore at or
    * after the rewrite epoch); merge-on-read deltas after the boundary
    * (their position-deletes mutated pre-boundary rows — OPTIMIZE folds
    * them first). Live streaming writers fence at the restore epoch like
    * any retraction (rewrittenUpTo); readers are unaffected mid-flight
    * (single atomic visibility switch). Returns the restore commit's
    * epoch, or the current head unchanged when already at the boundary. */
  def restore(dir: String, epoch: Long): Long = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    requireAnswerableEpoch(m, epoch)
    require(m.rewrittenUpTo < 0L || epoch >= m.rewrittenUpTo,
      s"graft_kv: RESTORE to epoch $epoch crosses the retained row-level " +
        s"rewrite at epoch ${m.rewrittenUpTo} — superseded files cannot " +
        "re-surface as current (their interim invisibility would be " +
        "forgotten); VACUUM the history first or restore at or after " +
        "the rewrite epoch")
    require(!m.deltas.exists(d => epochOf(d.name) > epoch),
      s"graft_kv: RESTORE to epoch $epoch would undo merge-on-read DML " +
        "epochs — their position-deletes mutated earlier rows; OPTIMIZE " +
        "(fold the deltas) first, or restore at or after the newest delta")
    val head = (m.files.map(f => epochOf(f._1)) ++
      m.deltas.map(d => epochOf(d.name)) ++ m.removed.map(_.removedAt) ++
      Seq(m.rewrittenUpTo, m.compactedUpTo)).max.max(0L)
    val undo = m.files.filter(f => epochOf(f._1) > epoch)
    if (undo.isEmpty) head // already at (or logically at) the boundary
    else {
      val restoreEpoch = head + 1L
      writeManifest(dir, m.schema,
        m.files.filterNot(undo.contains), m.compactedUpTo,
        m.stats, m.blooms, m.deltas,
        m.removed ++ undo.map { case (n, r) => RemovedFile(n, r, restoreEpoch) },
        rewrittenUpTo = restoreEpoch, priorHint = Some(m))
      restoreEpoch
    }
  }

  /** SHALLOW CLONE (the Delta `CREATE TABLE … SHALLOW CLONE` shape): a
    * ZERO-COPY branch of the source's state at an epoch boundary. The
    * clone's manifest references the source's visible data files by
    * ABSOLUTE path — no byte is copied, so branching a 100 TB table is one
    * metadata write. From then on the tables diverge: the clone's appends
    * land in its own directory; CoW DML rewrites only the touched files
    * (locally); compaction and ZORDER fold foreign references into local
    * files (a clone self-localizes under maintenance); and NO maintenance
    * on the clone ever deletes a foreign file — vacuum/truncate/compact
    * drop the reference only ([[deleteOwned]]). Chained clones re-point at
    * the ORIGINAL owner, never at an intermediate clone.
    *
    * Epoch numbering is inherited from the referenced file names, so a
    * PURE-APPEND source's pre-boundary states stay time-travelable on the
    * clone for free (the prefix of referenced files IS that state). Ranges
    * the source folded or rewrote are NOT reconstructable from references
    * alone (the clone carries no retained history), so the clone's
    * `compactedUpTo` is raised to the source's rewrite fence — reads below
    * it refuse exactly like vacuumed history. Caveat shared with Delta:
    * VACUUM on the SOURCE can reclaim files a clone still references —
    * retention policy must outlive clones.
    *
    * Refuses: a target that already has a manifest; a source boundary
    * with live merge-on-read deltas (OPTIMIZE the source first — a delta
    * overlays other files' rows and cannot be referenced positionally). */
  def shallowClone(srcDir: String, tgtDir: String,
      asOf: Option[Long] = None): Long = withCommitLock(srcDir) {
    // the WHOLE clone creation holds the SOURCE's commit lock (review
    // catch: reading the boundary un-locked left a TOCTOU window where a
    // concurrent epoch-less overwrite's deleteOwnedUnheld saw no
    // registered clone yet and reclaimed the very files this clone was
    // about to reference). Every deleting path takes the same lock, so
    // boundary read + target publish + registration are atomic against
    // them. Lock order src -> tgt is safe: the target is a fresh
    // directory nothing else locks first.
    val smp = manifestPath(srcDir)
    require(Files.exists(smp), s"graft_kv: no manifest at $srcDir")
    val sm = readManifest(smp)
    asOf.foreach(requireAnswerableEpoch(sm, _))
    require(sm.visibleDeltasAt(asOf).isEmpty,
      s"graft_kv: SHALLOW CLONE of $srcDir with live merge-on-read deltas " +
        "at the boundary — OPTIMIZE (fold the deltas) first")
    val vis = sm.visibleFilesAt(asOf)
    val abs = vis.map { case (n, r) =>
      (if (isForeign(n)) n else Paths.get(srcDir, n).toString, r)
    }
    val rekey = vis.map(_._1).zip(abs.map(_._1)).toMap
    val boundary = asOf.getOrElse(
      (vis.map(f => epochOf(f._1)) ++
        Seq(sm.rewrittenUpTo, sm.compactedUpTo)).max.max(0L))
    Files.createDirectories(Paths.get(tgtDir))
    withCommitLock(tgtDir) {
      require(!Files.exists(manifestPath(tgtDir)),
        s"graft_kv: SHALLOW CLONE target $tgtDir already has a manifest")
      writeManifest(tgtDir, sm.schema, abs,
        math.max(sm.compactedUpTo, sm.rewrittenUpTo),
        sm.stats.collect { case (n, v) if rekey.contains(n) => rekey(n) -> v },
        sm.blooms.collect { case (n, v) if rekey.contains(n) => rekey(n) -> v },
        Nil, Nil, rewrittenUpTo = sm.rewrittenUpTo,
        // TABLE-level invariants ride the clone (the Delta stance:
        // constraints and layout are part of what you branched)
        checks = sm.checks, partitionSpec = sm.partitionSpec)
    }
    // BACK-REFERENCE REGISTRY (r19 verdict gap #3): the clone's manifest
    // lives in ANOTHER directory, so without this the source's orphan
    // sweep / vacuum cannot know its files are externally held — the
    // clone would only find out at read time (the refusal fences).
    // Register with EVERY distinct directory the clone's references
    // point into, not just the immediate source (review catch: a clone
    // OF A CLONE passes foreign references through unchanged, so its
    // files may live in a GRANDPARENT's directory — registering only
    // with the parent meant dropping the intermediate clone orphaned
    // this one's references). No deadlock: nothing lock-walks from a
    // referenced root toward this source (cloneReferenced reads clone
    // manifests lock-free by design).
    registerClone(srcDir, tgtDir)
    abs.map(_._1)
      .map(n => Paths.get(n).getParent.toAbsolutePath.normalize.toString)
      .distinct
      .filter(_ != Paths.get(srcDir).toAbsolutePath.normalize.toString)
      .foreach(root => registerClone(root, tgtDir))
    boundary
  }

  // ---- shallow-clone back-reference registry ---------------------------
  // `_graft_clones`: one absolute clone-target path per line, appended by
  // shallowClone under the source's commit lock. Consumers prune entries
  // whose target manifest no longer exists (a dropped clone un-registers
  // itself by ceasing to exist — no distributed delete protocol needed).
  // No .kv/.kvd suffix, so no sweep ever treats it as data.
  private[graft] def clonesPath(dir: String): Path =
    Paths.get(dir, "_graft_clones")
  private def registerClone(srcDir: String, tgtDir: String): Unit =
    withCommitLock(srcDir) {
      val p = clonesPath(srcDir)
      val abs = Paths.get(tgtDir).toAbsolutePath.normalize.toString
      val cur =
        if (Files.exists(p))
          Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
        else Nil
      if (!cur.contains(abs))
        Files.write(p, (cur :+ abs).mkString("\n").getBytes(
          StandardCharsets.UTF_8))
    }
  /** Live registered clones of `dir` (targets whose manifest still
    * exists); prunes dead entries under the lock as a side effect. */
  private[graft] def liveClonesOf(dir: String): Seq[String] =
    withCommitLock(dir) {
      val p = clonesPath(dir)
      if (!Files.exists(p)) Nil
      else {
        val all = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
          .toSeq.filter(_.nonEmpty)
        val live = all.filter(t => Files.exists(manifestPath(t)))
        if (live != all) {
          if (live.isEmpty) Files.deleteIfExists(p): Unit
          else Files.write(p, live.mkString("\n").getBytes(
            StandardCharsets.UTF_8)): Unit
        }
        live
      }
    }
  /** Every file under `dir` some live external clone's manifest still
    * references (foreign names resolved; clone manifests read without
    * the clone's lock — a clone mutating concurrently only ADDS local
    * files, its foreign references shrink monotonically, so a stale
    * read errs on the KEEP side). */
  private[sources] def cloneReferenced(dir: String): Set[Path] = {
    // zero-clone fast path (the overwhelmingly common case): one
    // lock-free exists() — this runs on every deleting commit, and a
    // table with no registry file cannot gain one mid-commit (the
    // registering shallowClone holds this table's commit lock, as does
    // every caller of this method)
    if (!Files.exists(clonesPath(dir))) return Set.empty
    val dirAbs = Paths.get(dir).toAbsolutePath.normalize
    liveClonesOf(dir).flatMap { t =>
      val m = readManifest(manifestPath(t))
      (m.files.map(_._1) ++ m.removed.map(_.name)).filter(isForeign)
        .map(n => Paths.get(n).toAbsolutePath.normalize)
        .filter(_.startsWith(dirAbs))
    }.toSet
  }

  /** OPTIMIZE … ZORDER BY: DISTRIBUTED multi-dimensional re-clustering of
    * the table's current visible rows — the Delta OPTIMIZE ZORDER shape.
    * Per column, every row gets a QUANTILE bucket 0..15 (boundaries from
    * one approx-percentile pass — the skew-proof range_partition_id
    * analogue, so a hot key cannot swallow the whole code space); the
    * bucket bits interleave into a Morton code; rows range-partition +
    * sort by it, and the NORMAL writer produces the replacement files
    * (min/max stats + blooms included) in a scratch directory. The publish
    * is one atomic manifest swap under the commit lock: pre-rewrite files
    * move to retained history (rewrittenUpTo = the new epoch), so
    * pre-OPTIMIZE states time-travel until vacuum, streams fence like any
    * CoW rewrite, and a commit that landed since planning refuses loudly.
    * The driver never touches rows — the quantile pass and the rewrite are
    * Spark jobs; only renames and the manifest publish run locally. Files
    * clustered this way make BOTH dimensions' per-file min/max tight, so a
    * box predicate on either column prunes at the manifest. */
  def zorderRewrite(spark: org.apache.spark.sql.SparkSession, dir: String,
      cols: Seq[String], buckets: Int = 0,
      // non-empty = PARTITION-SCOPED re-clustering (OPTIMIZE … WHERE …
      // ZORDER BY): only files whose recorded tuples PROVE the predicate
      // rewrite — quantile bounds, bucket count and row-conservation all
      // computed over the scoped region; every other partition's files
      // stay byte-identical. Data moved scales with the named
      // partitions, not the table.
      where: Seq[org.apache.spark.sql.sources.Filter] = Nil): Long = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "graft_kv: ZORDER BY needs at least one column")
    require(cols.length <= 8, "graft_kv: ZORDER BY supports up to 8 columns")
    // arrays have no order: quantile-bucketing a cell's accidental string
    // order would cluster nothing meaningful (SURVEY §7.46 refusal)
    locally {
      val mfp0 = manifestPath(dir)
      if (Files.exists(mfp0)) {
        val sch = readManifest(mfp0).schema
        cols.foreach(c => require(!sch.fields.exists(f =>
            f.name.equalsIgnoreCase(c) &&
            f.dataType.isInstanceOf[ArrayType]),
          s"graft_kv: ZORDER BY column '$c' is an ARRAY — arrays have " +
            "no order"))
      }
    }
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m0 = readManifest(mfp)
    require(m0.deltas.isEmpty,
      s"graft_kv: ZORDER on $dir with merge-on-read deltas present — run " +
        "plain OPTIMIZE (fold the deltas into their bases) first")
    require(where.isEmpty || m0.partitionSpec.nonEmpty,
      s"graft_kv: OPTIMIZE … WHERE … ZORDER at $dir needs a PARTITIONED " +
        "BY table (the predicate classifies files by their tuples)")
    // WHERE: rewrite exactly the files the predicate PROVES (allMatch
    // over each file's OWN recorded tuple — the compact-where classifier;
    // untagged files never prove, so pre-partitioning history and
    // clone-foreign references are never swept into a scoped rewrite)
    val scoped: Seq[(String, Long)] =
      if (where.isEmpty) m0.files
      else {
        val cache = scala.collection.mutable.HashMap
          .empty[String, Option[GraftPartition.PTransform]]
        m0.files.filter { case (n, _) =>
          val parts = GraftPartition.filePartsOf(
            m0.stats.getOrElse(n, Map.empty))
          val spec = GraftPartition.fileSpecOf(parts, m0.schema, cache)
          parts.nonEmpty &&
            where.forall(GraftPartition.allMatch(spec, parts, _))
        }
      }
    if (scoped.isEmpty) return -1L // nothing in scope: nothing to cluster
    cols.foreach { c =>
      val f = m0.schema.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"graft_kv: ZORDER column '$c' is not in the table schema " +
            s"(${m0.schema.fieldNames.mkString(", ")})"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"graft_kv: ZORDER column '$c' must be numeric for quantile " +
          s"bucketing, is ${f.dataType.simpleString}")
    }
    val plannedVersion = m0.version
    val newEpoch = (m0.files.map(f => epochOf(f._1)) ++
      m0.removed.map(_.removedAt) ++
      Seq(m0.rewrittenUpTo, m0.compactedUpTo)).max.max(0L) + 1L
    val df0 = spark.read.format("graft.sources.GraftKvSink")
      .option("path", dir)
    val df =
      (if (where.isEmpty) df0
       else df0.option("onlyFiles", scoped.map(_._1).mkString(","))).load()
    // ONE distributed pass computes all columns' 15 quantile boundaries
    val pcts = typedLit((1 until 16).map(_ / 16.0))
    val bounds = df.select(cols.map(c =>
      percentile_approx(col(c).cast("double"), pcts, lit(10000)).as(c)): _*)
      .first()
    val z = cols.zipWithIndex.map { case (c, i) =>
      val bs: Seq[Double] =
        if (bounds.isNullAt(i)) Seq.empty else bounds.getSeq[Double](i)
      // bucket = #boundaries strictly below the value (0..15); NULL -> 0
      val bucket = bs.foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(c).cast("double") > lit(b), 1).otherwise(0)
      }
      (0 until 4).foldLeft(lit(0L)) { (acc, bit) =>
        acc.bitwiseOR(shiftleft(
          shiftright(bucket.cast("long"), bit).bitwiseAND(1L),
          bit * cols.length + i))
      }
    }.reduce(_ bitwiseOR _)
    val n = if (buckets > 0) buckets else math.max(1, scoped.length)
    val scratch = Files.createTempDirectory("graft_zorder").toString
    // COLUMN MAPPING: the final publish keeps m0.schema's pids and
    // droppedPids, so the scratch files MUST come out in the table's
    // physical layout (holes at retired positions, columns at their
    // pids) — an identity-layout scratch write would make every
    // pid-resolved read of the rewritten files land out of range and
    // silently return NULL. Seeding the scratch manifest with the
    // table's schema + retired positions makes the writer's
    // writeLayout produce exactly the parent layout.
    val mappingActive = m0.droppedPids.nonEmpty ||
      m0.schema.fields.zipWithIndex.exists { case (f, i) => pidOf(f, i) != i }
    if (mappingActive)
      writeManifest(scratch, m0.schema, Nil, droppedPids = m0.droppedPids,
        priorHint = None)
    // r21: materialize the z-augmented rows ONCE. repartitionByRange's
    // RangePartitioner sketch is a full recompute of its child (scan +
    // decode + Morton compute) just to draw samples, and the shuffle then
    // recomputes the child again — the table's rows were decoded twice
    // past the quantile pass. Persisting the projection makes the sketch
    // pass the one real decode (it fills the cache) and the exchange a
    // cache read; at 100 TB the MEMORY_AND_DISK spill is a local
    // columnar round-trip in place of a full re-decode of the scoped
    // region — the same bytes at worst, decoded once at best. Unpersisted
    // in the finally with the scratch dir.
    val zdf = df.withColumn("__graft_z", z)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = zdf
        .repartitionByRange(n, col("__graft_z"))
        .sortWithinPartitions(col("__graft_z"))
        .drop("__graft_z")
        .write.format("graft.sources.GraftKvSink").option("path", scratch)
        .option("epoch", newEpoch.toString)
      // a PARTITIONED table keeps its tuple layout through the rewrite:
      // the fanout writer re-splits each z-range task per tuple (files
      // stay single-tuple AND z-contiguous), while fanoutOnly suppresses
      // the clustered-distribution requirement that would reshuffle the
      // morton order away
      (if (m0.partitionSpec.nonEmpty)
        w.option("partitionedBy", m0.partitionSpec.mkString(","))
          .option("fanoutOnly", "true")
      else w)
        .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
      withCommitLock(dir) {
        val m = readManifest(mfp)
        require(m.version == plannedVersion,
          s"graft_kv: concurrent commit during ZORDER rewrite of $dir " +
            s"(version ${m.version}, planned $plannedVersion) — rerun OPTIMIZE")
        val tm = readManifest(manifestPath(scratch))
        // a rewrite must conserve the SCOPED rows exactly — refuse over
        // silently losing (unscoped: scoped == all visible files)
        require(tm.files.map(_._2).sum == scoped.map(_._2).sum,
          s"graft_kv: ZORDER rewrite row count ${tm.files.map(_._2).sum} != " +
            s"scoped ${scoped.map(_._2).sum} at $dir — aborted, no commit")
        tm.files.foreach { case (nm, _) =>
          Files.move(Paths.get(scratch, nm), Paths.get(dir, nm)) }
        // retained files scan unpruned until vacuum (manifest stats nest
        // under live file entries — the same trade the CoW replace makes).
        // Scoped: out-of-scope files carry over untouched, stats intact.
        val scopedNames = scoped.map(_._1).toSet
        val keepF = m.files.filterNot(f => scopedNames.contains(f._1))
        // the time-travel/stream fence advances only as far as the files
        // actually rewritten: unscoped = the new epoch (every visible file
        // moved); scoped = the max epoch among the SCOPED files, mirroring
        // compact's scoped newUpTo rule — out-of-scope partitions are
        // byte-identical, so fencing the whole table would needlessly kill
        // table-wide time travel after re-clustering one partition
        val fence =
          if (where.isEmpty) newEpoch
          else math.max(scoped.map(f => epochOf(f._1)).max, m.rewrittenUpTo)
        writeManifest(dir, m.schema, keepF ++ tm.files, m.compactedUpTo,
          m.stats ++ tm.stats, m.blooms ++ tm.blooms, Nil,
          m.removed ++ scoped.map { case (nm, r) =>
            RemovedFile(nm, r, newEpoch) },
          rewrittenUpTo = fence, priorHint = Some(m))
      }
    } finally {
      zdf.unpersist(blocking = false)
      // ALWAYS reclaim the scratch copy — a refused commit (concurrent
      // writer, row-count mismatch) must not strand a full table rewrite
      try {
        val s = Files.list(Paths.get(scratch))
        try s.iterator().asScala.foreach(Files.deleteIfExists)
        finally s.close()
        Files.deleteIfExists(Paths.get(scratch))
      } catch { case _: java.io.IOException => () }
    }
    newEpoch
  }

  /** Read-only introspection: the manifest's optimistic-concurrency
    * version (increments on every publish; 0 = first). Cached by the
    * manifest file's (mtime, size) — the INDEX REWRITE RULE calls this on
    * every optimizer pass over a kv scan with a registered index, and a
    * full JSON parse per plan would scale with the per-file stats maps; a
    * stat() does not. Publishes replace the file atomically, so a
    * changed version always changes the (mtime, size) key. */
  private val versionCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Long)]()
  def manifestVersion(dir: String): Long = {
    val p = manifestPath(dir)
    // every publish renames a FRESH temp file over the manifest, so the
    // inode identity (fileKey) changes per publish — mtime alone is too
    // coarse (same-millisecond publishes) and size alone can repeat
    val attrs = Files.readAttributes(p,
      classOf[java.nio.file.attribute.BasicFileAttributes])
    val key = s"${attrs.fileKey()}|${attrs.lastModifiedTime().toMillis}|" +
      s"${attrs.size()}"
    val cached = versionCache.get(dir)
    if (cached != null && cached._1 == key) cached._2
    else {
      val v = readManifest(p).version
      versionCache.put(dir, (key, v))
      v
    }
  }

  /** Planner for O(delta) secondary-index refresh — ONE manifest read
    * returning (version, head epoch, head's commit ts, delta-appendable
    * file names). The names are `Some(files of epochs committed after
    * (sinceEpoch, sinceTs))` exactly when the since-then history is PURE
    * APPENDS of epoch-stamped files — the only shape where indexing just
    * the new files is sound. `None` (caller must rebuild fully) when:
    * the recorded (epoch, ts) pair no longer matches (truncate restarted
    * the history/clock), any newly-committed epoch is not strictly newer
    * than sinceEpoch (out-of-order explicit publish), a new epoch carries
    * merge-on-read deltas or a CoW rewrite (they MUTATE rows the index
    * already has), or the table has non-epoch-stamped data files (plain
    * appends there reuse epoch 0 invisibly). Compaction alone stays
    * delta-safe: it moves rows between files without changing them.
    *
    * A table bootstrapped WITHOUT epoch stamps (plain SQL INSERT
    * OVERWRITE / CTAS under the default options) stays epoch-less, so
    * its refreshes are always full rebuilds — declare `epochs 'true'`
    * on the table to stamp every batch write from the first commit
    * (making batch writes epoch-stamped BY DEFAULT would flip the
    * documented one-shot-snapshot streaming semantics of existing
    * epoch-less tables, so it is opt-in). */
  def appendedSince(dir: String, sinceEpoch: Long, sinceTs: Long)
      : (Long, Long, Long, Option[Seq[String]]) = {
    val m = readManifest(manifestPath(dir))
    val ets = m.epochTs
    val head = ets.keys.maxOption.getOrElse(-1L)
    val headTs = ets.get(head).getOrElse(-1L)
    def full = (m.version, head, headTs, None)
    if (sinceEpoch < 0L || !ets.get(sinceEpoch).contains(sinceTs)) return full
    if (!m.files.forall(f => baseName(f._1).startsWith("epoch-"))) return full
    val newEpochs = ets.collect { case (e, ts) if ts > sinceTs => e }.toSet
    val sound = newEpochs.forall(_ > sinceEpoch) &&
      !m.deltas.exists(d => newEpochs.contains(epochOf(d.name))) &&
      !m.removed.exists(r => newEpochs.contains(r.removedAt)) &&
      !newEpochs.contains(m.rewrittenUpTo)
    if (!sound) full
    else (m.version, head, headTs,
      Some(m.files.collect {
        case (n, _) if newEpochs.contains(epochOf(n)) => n
      }))
  }

  /** `TIMESTAMP AS OF` resolution: the max epoch `e` such that EVERY
    * recorded epoch at or below `e` was committed at or before `tsMillis`
    * (for the usual in-order history this is simply the last commit
    * before the timestamp — Iceberg's snapshot-at-timestamp rule; a
    * future timestamp resolves to the head; one before the earliest
    * commit refuses loudly). The all-of-the-prefix condition matters for
    * OUT-OF-ORDER explicit-epoch publishes: boundary reads are
    * epoch-prefix, so if epoch 2 was committed AFTER epoch 6, the state
    * "as of" epoch-6's commit time is not an epoch boundary at all —
    * resolving to 6 would anachronistically include epoch-2 rows that
    * did not exist then. Refuse rather than lie. Answerability below the
    * retention fence is then checked by the epoch read path itself. */
  def resolveTimestamp(dir: String, tsMillis: Long): Long = {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val ets = readManifest(mfp).epochTs
    require(ets.nonEmpty,
      s"graft_kv: $dir has no recorded commit timestamps " +
        "(pre-timestamp manifest); use VERSION AS OF <epoch>")
    require(tsMillis >= ets.values.min,
      s"graft_kv: TIMESTAMP AS OF ${java.time.Instant.ofEpochMilli(tsMillis)} " +
        s"is before the earliest recorded commit " +
        s"(${java.time.Instant.ofEpochMilli(ets.values.min)}) at $dir")
    // running max of commit ts in epoch order: epoch e qualifies iff the
    // whole prefix up to e is committed by tsMillis
    var prefixMax = 0L
    val answerable = ets.toSeq.sortBy(_._1).takeWhile { case (_, ts) =>
      prefixMax = math.max(prefixMax, ts); prefixMax <= tsMillis
    }
    require(answerable.nonEmpty,
      s"graft_kv: the state at " +
        s"${java.time.Instant.ofEpochMilli(tsMillis)} is not an epoch " +
        s"boundary at $dir (epochs were committed out of order around it); " +
        "use VERSION AS OF <epoch>")
    answerable.last._1
  }

  /** Read-only introspection (tests and judged-query assertions): the
    * manifest's current (data file names, delta file names). */
  def listedFiles(dir: String): (Seq[String], Seq[String]) = {
    val m = readManifest(manifestPath(dir))
    (m.files.map(_._1), m.deltas.map(_.name))
  }

  /** Read-only introspection: names of CoW-superseded files retained for
    * time travel (emptied by vacuum / history-reclaiming truncate). */
  def retainedFiles(dir: String): Seq[String] =
    readManifest(manifestPath(dir)).removed.map(_.name)

  /** DESCRIBE DETAIL: a one-row metadata snapshot of the current state —
    * (numFiles, visibleRows, sizeBytes, numDeltaFiles, numRetainedFiles,
    * manifestVersion, constraintNames). Rows account for merge-on-read
    * deltas the way every other metadata answer here does. */
  def detail(dir: String)
      : (Long, Long, Long, Long, Long, Long, Seq[String]) = {
    // a created-but-never-written table has no manifest yet: an all-zero
    // snapshot (version -1 = no commits), matching history()'s empty log
    if (!Files.exists(manifestPath(dir)))
      return (0L, 0L, 0L, 0L, 0L, -1L, Nil)
    val m = readManifest(manifestPath(dir))
    val bytes = m.files.map { case (n, _) =>
      val p = dataPath(dir, n)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum
    val rows = math.max(0L, m.files.map(_._2).sum +
      m.deltas.map(d => d.inserts - d.deletes).sum)
    (m.files.length.toLong, rows, bytes, m.deltas.length.toLong,
      m.removed.length.toLong, m.version, m.checks.keys.toSeq.sorted)
  }

  /** Read-only introspection (layout assertions): per-visible-file
    * (min, max) stats for `col`, stringly as the manifest stores them;
    * files without stats for the column are omitted. */
  def fileStats(dir: String, col: String): Seq[(String, String)] = {
    val m = readManifest(manifestPath(dir))
    m.files.flatMap { case (n, _) => m.stats.get(n).flatMap(_.get(col)) }
  }

  /** DESCRIBE HISTORY: the table's commit log DERIVED from the manifest —
    * one row per epoch, classified by what that epoch published: `append`
    * (data files), `dml-delta` (a merge-on-read delta: its insert/delete
    * record counts), `rewrite` (a copy-on-write replace: replacement rows
    * added, superseded rows deleted — the deleted count degrades to 0
    * after vacuum reclaims the retained files), `compact` (the merged
    * boundary file). Each row carries the epoch's COMMIT TIMESTAMP (null
    * for epochs stamped before timestamps existed) — what makes
    * `TIMESTAMP AS OF` discoverable. Pure metadata — no data file is
    * opened; the Delta DESCRIBE HISTORY discoverability surface for
    * epoch time travel. */
  def history(dir: String)
      : Seq[(Long, String, Long, Long, java.sql.Timestamp)] = {
    val mf = manifestPath(dir)
    if (!Files.exists(mf)) return Seq.empty
    val m = readManifest(mf)
    // a CoW-superseded file still witnesses its ORIGINAL commit (name
    // keeps the epoch prefix) — count it there, so an append epoch
    // reports what the commit added, not what later rewrites left visible
    // (the reconstruction degrades once vacuum reclaims those files)
    val appends = (m.files ++ m.removed.map(r => (r.name, r.rows)))
      .groupBy(f => epochOf(f._1))
      .view.mapValues(_.map(_._2).sum).toMap
    val removedBy = m.removed.groupBy(_.removedAt)
      .view.mapValues(_.map(_.rows).sum).toMap
    val deltas = m.deltas.groupBy(d => epochOf(d.name))
      .view.mapValues(ds => (ds.map(_.inserts).sum, ds.map(_.deletes).sum))
      .toMap
    val epochs = (appends.keys ++ removedBy.keys ++ deltas.keys ++
      Seq(m.rewrittenUpTo, m.compactedUpTo).filter(_ >= 0L))
      .toSeq.distinct.sorted
      // a fence-only epoch strictly inside compacted history has no
      // physical trace left (its files were merged away) — drop the
      // would-be all-zero ghost row; the boundary epoch itself stays
      .filter(e => appends.contains(e) || removedBy.contains(e) ||
        deltas.contains(e) || e >= m.compactedUpTo)
    epochs.map { e =>
      val (dIns, dDel) = deltas.getOrElse(e, (0L, 0L))
      val op =
        if (deltas.contains(e)) "dml-delta"
        else if (removedBy.contains(e) || e == m.rewrittenUpTo) "rewrite"
        else if (e == m.compactedUpTo) "compact"
        else "append"
      (e, op, appends.getOrElse(e, 0L) + dIns,
        removedBy.getOrElse(e, 0L) + dDel,
        m.epochTs.get(e).map(new java.sql.Timestamp(_)).orNull)
    }
  }

  /** The one asOfEpoch answerability fence, shared by the data scan and
    * the manifest-only aggregate scan: an epoch below compacted history is
    * unanswerable (its files were merged/vacuumed), and an epoch ABOVE
    * the newest committed epoch is not a version at all — answering it
    * with the current state would be a "pinned" read that silently moves
    * as epochs land (Delta/Iceberg raise VERSION_NOT_FOUND here). */
  private[sources] def requireAnswerableEpoch(m: Manifest, n: Long): Unit = {
    // a TAGGED epoch below the vacuum fence stays answerable: vacuum
    // keeps exactly the retained CoW files its reconstruction needs (see
    // vacuum's protected partition), while untagged neighbors lost
    // theirs and must keep erroring. Compaction never merges past a tag
    // (compact clamps), so a tag can never name physically-merged history.
    // TAGS ONLY: a BRANCH ref's state lives in the branch's own manifest
    // — the parent cannot reconstruct it, and a fast-forward publish can
    // legitimately import a fold boundary above a sibling fork.
    val tagged = m.refs.values.exists(r => r._1 == n && r._2 == "tag")
    require(tagged || m.compactedUpTo < 0L || n >= m.compactedUpTo,
      s"graft_kv: epoch $n predates compacted history " +
        s"(epochs <= ${m.compactedUpTo} were vacuumed)")
    // the newest committed epoch can live only in the fences: a DML that
    // emptied every affected file publishes no replacement (epoch 3 is
    // then just rewrittenUpTo=3), and vacuum folds it into compactedUpTo
    val head = (m.files.map(f => epochOf(f._1)) ++
      m.deltas.map(d => epochOf(d.name)) ++
      m.removed.map(_.removedAt) ++
      Seq(m.rewrittenUpTo, m.compactedUpTo)).max.max(0L)
    require(n <= head,
      s"graft_kv: epoch $n is beyond the newest committed epoch " +
        s"$head — version not found")
  }

  /** The schema a COMMIT publishes: the writer's schema merged with the
    * prior manifest's. A write must never narrow what history already
    * established — an INSERT of all-non-null values carries
    * nullable=false column types, but rows written BEFORE a column was
    * added read as null, so the evolved column must stay nullable or
    * Spark's codegen reads the null as 0/''. Fields merge by position
    * (names/types must agree on the common prefix — guaranteed by the
    * write path's schema checks); the longer side contributes its tail. */
  private[sources] def publishSchema(dir: String, writer: StructType): StructType = {
    val mf = manifestPath(dir)
    if (!Files.exists(mf)) return writer
    val pm = readManifest(mf)
    val prior = pm.schema
    val (longer, shorter) =
      if (prior.length >= writer.length) (prior, writer) else (writer, prior)
    val compatible = shorter.fields.zip(longer.fields).forall { case (a, b) =>
      a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType }
    // adopting the writer schema here would silently re-interpret (or
    // drop) committed columns — refuse; only an OVERWRITE redefines
    require(compatible,
      s"graft_kv: append schema ${writer.simpleString} is incompatible " +
        s"with the table's ${prior.simpleString}; use overwrite to " +
        "redefine the table, or ALTER TABLE ADD COLUMN to evolve it")
    // columns APPENDED by a wider write claim fresh physical positions
    // past every live and retired one when column mapping is active —
    // the same rule evolveSchema and writeLayout apply, so the published
    // schema's pids name exactly where this write's tasks put the values
    // (publishing them pid-less would make readers use the schema index,
    // which after a DROP points at a different physical column)
    val active = pm.droppedPids.nonEmpty || prior.fields.zipWithIndex
      .exists { case (f, i) => pidOf(f, i) != i }
    var nextPid = physWidth(prior, pm.droppedPids)
    StructType(longer.fields.zipWithIndex.map { case (f, i) =>
      val widened =
        if (i < shorter.length)
          f.copy(nullable = f.nullable || shorter.fields(i).nullable)
        else f
      // the PRIOR schema carries table-bound column metadata (DEFAULT /
      // GENERATED ALWAYS AS); a writer's query schema never does — keep
      // the prior's, or the first append would silently strip defaults
      if (i < prior.length &&
          prior.fields(i).metadata != org.apache.spark.sql.types.Metadata.empty)
        widened.copy(metadata = prior.fields(i).metadata)
      else if (i >= prior.length) {
        // appended columns are NULLABLE regardless of the writer's own
        // schema: every pre-widening row null-fills them, and a
        // non-nullable declaration would codegen those nulls as 0/''
        val n = widened.copy(nullable = true)
        if (active) { val p = nextPid; nextPid += 1; withPid(n, p) } else n
      } else widened
    })
  }

  /** SCHEMA EVOLUTION (ALTER TABLE … ADD COLUMN): republish the manifest
    * under the widened schema — pure metadata, no file rewritten. The new
    * schema must extend the current one by appending columns (rows are
    * positional TSV, so existing columns cannot move); readers null-fill
    * the appended columns for rows written under any earlier schema, the
    * parquet/Iceberg add-column contract. Stats, blooms, deltas, retained
    * history and both fences carry over verbatim — old files simply have
    * no stats for the new columns, which every pruning/pushdown path
    * already treats as "unknown, keep". */
  /** Freeze the physical mapping: every field carries an explicit pid
    * from here on (idempotent — already-stamped fields keep theirs). The
    * first RENAME/DROP activates column mapping this way; until then
    * pids are implicit (= schema index) and nothing changes on disk. */
  /** Rewrite every expression-bearing metadata entry on a field
    * (DEFAULTs and GENERATION_EXPRESSION) through `rw` — the rename
    * machinery's one hook for SQL text living in field metadata. */
  private[sources] def rewriteExprMeta(f: StructField,
      rw: String => String): StructField = {
    val keys = Seq("CURRENT_DEFAULT", "EXISTS_DEFAULT",
      "GENERATION_EXPRESSION")
    val present = keys.filter(f.metadata.contains)
    if (present.isEmpty) f
    else {
      val mb = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata)
      present.foreach(k => mb.putString(k, rw(f.metadata.getString(k))))
      f.copy(metadata = mb.build())
    }
  }

  private def stampPids(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) =>
      withPid(f, pidOf(f, i)) })

  /** RENAME COLUMN as ONE metadata publish (the Iceberg field-id /
    * Delta column-mapping shape, physical positions as the ids): the
    * field keeps its position — no data file is touched, files keep
    * reading by position — while every name-keyed metadata entry re-keys
    * in the same manifest write: per-file stats, blooms and sketch keys
    * (hll:/cnt:/len:), partition-spec strings and per-file tuple keys
    * whose transform sources the column, CHECK-constraint SQL and other
    * columns' DEFAULT SQL (via `rewriteSql`, the catalog's
    * parse-and-substitute — the textual equivalent of binding by id).
    * The histogram sidecar is dropped, not re-keyed: it is a CBO
    * estimate with its own staleness rule, and absent histograms degrade
    * to "report nothing". Returns the new authoritative schema. */
  private[sources] def renameColumn(dir: String, from: String, to: String,
      rewriteSql: String => String): StructType = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    val fi = m.schema.fieldNames.indexWhere(_.equalsIgnoreCase(from))
    require(fi >= 0, s"graft_kv: no column '$from' to rename " +
      s"(${m.schema.fieldNames.mkString(", ")})")
    require(!m.schema.fieldNames.exists(_.equalsIgnoreCase(to)),
      s"graft_kv: cannot rename '$from' to '$to' — the name is taken")
    val stamped = stampPids(m.schema)
    val next = StructType(stamped.fields.zipWithIndex.map { case (f, i) =>
      // another column's DEFAULT or GENERATION_EXPRESSION may reference
      // the renamed one — rewrite every expression-bearing metadata entry
      rewriteExprMeta(if (i == fi) f.copy(name = to) else f, rewriteSql)
    })
    def rekey(k: String): String =
      if (k.equalsIgnoreCase(from)) to
      else Seq(HllKey, CntKey, LenKey).find(p =>
          k.equalsIgnoreCase(p + from)).map(_ + to)
        .orElse {
          if (!k.startsWith(GraftPartition.PartKey)) None
          else GraftPartition.renameKey(
            k.stripPrefix(GraftPartition.PartKey), m.schema, from, to)
            .map(GraftPartition.PartKey + _)
        }.getOrElse(k)
    val stats2 = m.stats.map { case (n, cols) =>
      n -> cols.map { case (k, v) => rekey(k) -> v } }
    val blooms2 = m.blooms.map { case (n, cols) =>
      n -> cols.map { case (k, v) => rekey(k) -> v } }
    val spec2 = m.partitionSpec.map(k =>
      GraftPartition.renameKey(k, m.schema, from, to).getOrElse(k))
    val checks2 = m.checks.map { case (n, sql) => n -> rewriteSql(sql) }
    Files.deleteIfExists(colHistPath(dir))
    writeManifest(dir, next, m.files, m.compactedUpTo, stats2, blooms2,
      m.deltas, m.removed, m.rewrittenUpTo, checks = checks2,
      partitionSpec = spec2, priorHint = Some(m))
    next
  }

  /** DROP COLUMN as ONE metadata publish: the field leaves the schema,
    * its physical position retires into `droppedPids` — writers keep
    * emitting the null marker there (one global positional layout) and
    * ADD COLUMN never reuses it (reuse would resurface the dropped
    * column's committed values under the new name). Committed data is
    * reclaimed only by full-rewrite maintenance. The column's stats /
    * bloom / sketch entries drop with it; recorded partition-tuple keys
    * of EVOLVED-AWAY specs that sourced it stay behind — they parse to
    * nothing against the new schema, and an unparsed transform never
    * prunes (the standing soundness rule). The caller refuses drops the
    * metadata cannot survive (current partition source, CHECK/DEFAULT/
    * layout references). Returns the new authoritative schema. */
  private[sources] def dropColumn(dir: String, name: String): StructType =
    withCommitLock(dir) {
      val mfp = manifestPath(dir)
      require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
      val m = readManifest(mfp)
      val fi = m.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
      require(fi >= 0, s"graft_kv: no column '$name' to drop " +
        s"(${m.schema.fieldNames.mkString(", ")})")
      require(m.schema.length > 1,
        s"graft_kv: cannot drop '$name' — it is the only column")
      // defense in depth (the catalog refuses earlier with a fuller
      // message): a CURRENT partition source must not be dropped — every
      // new write still classifies rows by it
      m.partitionSpec.foreach { k =>
        require(!GraftPartition.parseOne(k, m.schema).source
            .equalsIgnoreCase(name),
          s"graft_kv: cannot drop '$name' — partition transform '$k' is " +
            "laid out by it (ALTER ... SET PARTITIONED BY first)")
      }
      val stamped = stampPids(m.schema)
      val pid = pidOf(stamped(fi), fi)
      val next = StructType(
        stamped.fields.zipWithIndex.filter(_._2 != fi).map(_._1))
      // recorded tuple keys whose transform SOURCES the dropped column
      // (evolved-away specs) must go too: dropped NAMES are not recorded,
      // so a later ADD COLUMN could reintroduce the name and the stale
      // tuples would then classify/prune against the WRONG column's
      // values. Absent tuples never prune — sound, just less pruning.
      val deadPart = scala.collection.mutable.HashMap.empty[String, Boolean]
      def sourcesDropped(k: String): Boolean =
        k.startsWith(GraftPartition.PartKey) &&
          deadPart.getOrElseUpdate(k.toLowerCase, scala.util.Try(
            GraftPartition.parseOne(k.stripPrefix(GraftPartition.PartKey),
              m.schema).source.equalsIgnoreCase(name)).getOrElse(false))
      def keep(k: String): Boolean =
        !(k.equalsIgnoreCase(name) || Seq(HllKey, CntKey, LenKey).exists(
          p => k.equalsIgnoreCase(p + name)) || sourcesDropped(k))
      val stats2 = m.stats.map { case (n, cols) => n -> cols.filter {
        case (k, _) => keep(k) } }
      val blooms2 = m.blooms.map { case (n, cols) => n -> cols.filter {
        case (k, _) => keep(k) } }
      Files.deleteIfExists(colHistPath(dir))
      writeManifest(dir, next, m.files, m.compactedUpTo, stats2, blooms2,
        m.deltas, m.removed, m.rewrittenUpTo,
        droppedPids = (m.droppedPids :+ pid).distinct.sorted,
        priorHint = Some(m))
      next
    }

  /** The type-promotion matrix (the Iceberg `ALTER COLUMN … TYPE` shape,
    * widen-only): INT -> BIGINT. Everything else refuses — committed wide
    * values would overflow a narrowing parse, and lossy promotions
    * (BIGINT -> DOUBLE) would silently change committed values. */
  private[graft] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (IntegerType, LongType) => true
      // DECIMAL precision widening at the SAME scale (Iceberg's rule):
      // stored images are plain strings at the declared scale, so a
      // precision raise re-parses every committed image verbatim; a scale
      // change would re-interpret them — refuse
      case (a: DecimalType, b: DecimalType) =>
        b.precision > a.precision && b.scale == a.scale
      // FLOAT -> DOUBLE is REFUSED, deliberately: the canonical-image
      // argument that makes INT -> BIGINT safe FAILS here. A float's
      // image is its SHORTEST decimal that round-trips via parseFloat
      // (e.g. 0.1f -> "0.1"); re-parsing that image as a double yields
      // the double nearest the printed DECIMAL (0.1d =
      // 0.1000000000000000055…), which is a DIFFERENT real number than
      // the committed float widened to double ((double)0.1f =
      // 0.100000001490116…). Every committed value would silently shift
      // by up to half a float-ulp — a value re-interpretation, exactly
      // what the widening contract forbids. (Iceberg CAN allow
      // float->double because its values are binary IEEE, widened
      // bit-exactly; a text format cannot.) Rewrite the column via
      // CTAS/MERGE if the shift is acceptable — that makes the
      // re-interpretation an explicit, audited write.
      case (FloatType, DoubleType) => false
      case _                       => false
    }

  /** ALTER COLUMN … TYPE as ONE metadata publish — type promotion.
    * Data files are TEXT (TSV): every committed INT image parses as
    * BIGINT verbatim, so no file is touched and NOTHING name-keyed needs
    * re-canonicalizing — the canonical string image of an int IS its
    * image as a long, the stats ordering (`le`) compares both via
    * toLong, blooms hash putLong(v.toLong) identically for either type,
    * and every partition transform (identity/bucket/truncate/temporal)
    * operates on the canonical string image, so even a BUCKET-sourced
    * widen keeps recorded tuples and pruning exact — the reason Iceberg
    * must refuse bucket sources (type-specific hash functions) does not
    * structurally arise in this format. The histogram sidecar drops (a
    * CBO estimate with its own staleness rule; absent = report nothing).
    * Old files decode under the CURRENT schema type — the reader parses
    * per projected type, so pre-widen rows surface as the wide type with
    * their exact committed values. Returns the new authoritative
    * schema. */
  private[sources] def widenColumn(dir: String, name: String,
      to: DataType): StructType = withCommitLock(dir) {
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val m = readManifest(mfp)
    val fi = m.schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
    require(fi >= 0, s"graft_kv: no column '$name' to widen " +
      s"(${m.schema.fieldNames.mkString(", ")})")
    val from = m.schema(fi).dataType
    require(widens(from, to),
      s"graft_kv: cannot ALTER COLUMN '$name' TYPE ${to.simpleString} " +
        s"from ${from.simpleString} — only widening promotions " +
        "(INT -> BIGINT, DECIMAL precision at fixed scale) are " +
        "supported; narrowing would overflow committed values, and " +
        "FLOAT -> DOUBLE would re-interpret them (a float's " +
        "shortest-decimal image re-parsed as double is a different " +
        "real than the float widened to double)")
    val next = StructType(m.schema.fields.zipWithIndex.map { case (f, i) =>
      if (i == fi) f.copy(dataType = to) else f })
    Files.deleteIfExists(colHistPath(dir))
    writeManifest(dir, next, m.files, m.compactedUpTo, m.stats, m.blooms,
      m.deltas, m.removed, m.rewrittenUpTo, priorHint = Some(m))
    next
  }

  private[graft] def evolveSchema(dir: String, next: StructType): Unit = withCommitLock(dir) {
    val mf = manifestPath(dir)
    if (!Files.exists(mf)) return // first write will publish `next` itself
    val m = readManifest(mf)
    val cur = m.schema
    require(next.length >= cur.length &&
      cur.fields.zip(next.fields).forall { case (a, b) =>
        a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType },
      s"graft_kv: schema evolution must append columns; cannot go from " +
        s"${cur.simpleString} to ${next.simpleString}")
    // with column mapping active, appended columns claim FRESH physical
    // positions past every live and retired one — a retired position is
    // never reused (old files hold the dropped column's values there);
    // existing fields keep the manifest's own pid (their identity)
    val active = m.droppedPids.nonEmpty || cur.fields.zipWithIndex.exists {
      case (f, i) => pidOf(f, i) != i }
    val merged =
      if (!active) next
      else {
        var w = physWidth(cur, m.droppedPids)
        StructType(next.fields.zipWithIndex.map { case (f, i) =>
          if (i < cur.length) withPid(f, pidOf(cur(i), i))
          else { val p = w; w += 1; withPid(f, p) }
        })
      }
    writeManifest(dir, merged, m.files, m.compactedUpTo, m.stats, m.blooms,
      m.deltas, m.removed, m.rewrittenUpTo, priorHint = Some(m))
  }

  /** Persist CHECK constraints into the table's own metadata (the Delta-
    * protocol stance: constraints bind to the TABLE, so a writer that
    * never saw the catalog entry — the path route, another session —
    * still enforces them via getTable/the streaming write). No manifest
    * yet (CREATE before first write): bootstrap one with the schema and
    * zero files, so the constraint exists before any row can. */
  private[sources] def setChecks(dir: String, schema: StructType,
      cs: Map[String, String]): Unit = withCommitLock(dir) {
    // `__` prefixes are reserved for internal derived checks (`__gen__`
    // generated columns, `__replace_where__` overwrite guards); a user
    // CHECK claiming one could flip writerGuard's skip-vs-refuse rule or
    // be silently shadowed for one write
    cs.keys.find(_.startsWith("__")).foreach(n => throw new
      IllegalArgumentException(s"graft_kv: CHECK constraint name '$n' uses " +
        "the reserved internal prefix '__'"))
    val mf = manifestPath(dir)
    if (Files.exists(mf)) {
      val m = readManifest(mf)
      if (m.checks != cs)
        writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
          m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
          checks = cs, priorHint = Some(m))
    } else if (cs.nonEmpty) {
      Files.createDirectories(Paths.get(dir))
      writeManifest(dir, schema, Seq.empty, checks = cs)
    }
  }

  /** Persist the partition spec in the manifest (bootstrap one if none
    * exists — the setChecks shape) so every writer route splits files by
    * tuple and every reader prunes by it. Redeclaring a DIFFERENT spec
    * over committed data refuses: existing files were laid out under the
    * old spec and silently mixing layouts would corrupt pruning EXACTNESS
    * expectations (absent tuples stay sound, but a CREATE is a
    * declaration, not an evolution — evolution is append-time: new files
    * tag under the current spec, old files keep their entries). */
  private[graft] def setPartitionSpec(dir: String, schema: StructType,
      spec: Seq[String]): Unit = withCommitLock(dir) {
    GraftPartition.parse(spec, schema) // validate against the schema
    val mf = manifestPath(dir)
    if (Files.exists(mf)) {
      val m = readManifest(mf)
      if (m.partitionSpec != spec) {
        require(m.partitionSpec.isEmpty || m.files.isEmpty,
          s"graft_kv: cannot change partitioning of $dir from " +
            s"[${m.partitionSpec.mkString(", ")}] to [${spec.mkString(", ")}] " +
            "over committed data")
        writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
          m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
          partitionSpec = spec, priorHint = Some(m))
      }
    } else if (spec.nonEmpty) {
      Files.createDirectories(Paths.get(dir))
      writeManifest(dir, schema, Seq.empty, partitionSpec = spec)
    }
  }

  /** Partition EVOLUTION (the Iceberg spec-evolution shape): replace the
    * declared spec outright. Sound by construction: committed files keep
    * their own `part:` entries and the scan prunes each file against the
    * transforms IT recorded, so old-layout files keep pruning on the old
    * spec while new writes split under the new one — no rewrite, no
    * migration. Only the explicit ALTER takes this path; a re-CREATE
    * redeclaring a different spec still refuses (setPartitionSpec). */
  private[graft] def evolvePartitionSpec(dir: String, schema: StructType,
      spec: Seq[String]): Unit = withCommitLock(dir) {
    GraftPartition.parse(spec, schema) // validate against the schema
    val mf = manifestPath(dir)
    require(Files.exists(mf), s"graft_kv: no manifest at $dir")
    val m = readManifest(mf)
    if (m.partitionSpec != spec)
      writeManifest(dir, m.schema, m.files, m.compactedUpTo, m.stats,
        m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
        partitionSpec = spec, priorHint = Some(m))
  }

  /** GENERATED ALWAYS AS columns, expressed as derived CHECK constraints:
    * the column's stored value must null-safe-equal its generation
    * expression (`g <=> (expr)`), enforced through the SAME machinery as
    * user CHECKs — plan-spliced in extension sessions, per-row writer
    * Predicate everywhere else — so no write shape (batch, streaming,
    * CoW, MOR, extensionless session) can publish an inconsistent value.
    * The expression text rides the Spark-standard GENERATION_EXPRESSION
    * field-metadata key, persisted in the manifest schema like every
    * other table-bound invariant. Spark leaves generated-column
    * enforcement entirely to the connector (the capability only unlocks
    * the CREATE syntax); the Delta posture is compute-or-verify — this
    * connector verifies, so an INSERT must supply the (matching) value. */
  private[graft] def generatedChecks(schema: StructType): Map[String, String] =
    schema.fields.collect {
      case f if f.metadata.contains("GENERATION_EXPRESSION") =>
        s"__gen__${f.name}" ->
          s"`${f.name}` <=> (${f.metadata.getString("GENERATION_EXPRESSION")})"
    }.toMap

  /** Persist column-level metadata (DEFAULT values, GENERATED ALWAYS AS
    * expressions — carried in StructField metadata by Spark's own v2
    * column conversion) into the MANIFEST schema, so the table-bound
    * semantics survive the catalog entry: once data exists the manifest
    * is the authoritative schema (loadTable prefers it), and a later
    * write's publishSchema merge keeps prior field metadata. No manifest
    * yet: bootstrap one with the schema and zero files, the setChecks
    * shape. An existing manifest whose column names/types differ is left
    * untouched (CREATE does not redefine committed data). */
  private[sources] def setColumnMeta(dir: String, schema: StructType): Unit = withCommitLock(dir) {
    val mf = manifestPath(dir)
    if (Files.exists(mf)) {
      val m = readManifest(mf)
      val sameShape = m.schema.length == schema.length &&
        m.schema.fields.zip(schema.fields).forall { case (a, b) =>
          a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType }
      if (sameShape) {
        // MERGE, never replace: the manifest's nullability reflects rows
        // already committed (a re-CREATE declaring NOT NULL over data
        // holding NULLs would make codegen read them as 0/''), and a
        // prior GENERATION_EXPRESSION is a standing invariant that a
        // re-CREATE omitting it must not silently drop. New metadata
        // wins per field when present; prior survives otherwise.
        val merged = StructType(m.schema.fields.zip(schema.fields).map {
          case (prior, next) =>
            val mb = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(prior.metadata).withMetadata(next.metadata)
            prior.copy(
              nullable = prior.nullable || next.nullable,
              metadata = mb.build())
        })
        if (m.schema.json != merged.json)
          writeManifest(dir, merged, m.files, m.compactedUpTo, m.stats,
            m.blooms, m.deltas, m.removed, m.rewrittenUpTo,
            priorHint = Some(m))
      }
    } else {
      Files.createDirectories(Paths.get(dir))
      writeManifest(dir, schema, Seq.empty)
    }
  }

  /** The CDC read schema: data columns plus the change kind and the epoch
    * that committed it (Delta CDF's `_change_type`/`_commit_version`
    * shape). */
  private[sources] def withCdcColumns(base: StructType): StructType =
    StructType(base.fields :+
      StructField("_change_type", StringType, nullable = false) :+
      StructField("_commit_epoch", LongType, nullable = false))

  /** CHANGEFEED planning: the FILE-LEVEL diff between the states at
    * `from` and `to` — (files to read at the from-state, files to read at
    * the to-state). A file visible at both boundaries with no delta
    * overlay change contributes NOTHING and is never opened: a 1-file DML
    * on a 10k-file table diffs one file pair, not two table scans — the
    * property that makes a changefeed usable at 100 TB. Sides include:
    * CoW-removed files (from), their replacements and plain appends (to),
    * and for merge-on-read windows the delta files' insert records (to)
    * plus every base file a window delta references (BOTH sides — its
    * row set changed under the overlay). Row-level semantics are then one
    * EXCEPT-ALL each way over only these files. */
  def changedFiles(dir: String, from: Long, to: Long): (Seq[String], Seq[String]) = {
    require(to >= from, s"graft_kv: changefeed range [$from, $to] is inverted")
    val m = readManifest(manifestPath(dir))
    require(m.compactedUpTo < 0L || from >= m.compactedUpTo,
      s"graft_kv: changefeed from=$from predates compacted history " +
        s"(epochs <= ${m.compactedUpTo} were vacuumed)")
    def visibleAt(e: Long): Set[String] =
      m.visibleFilesAt(Some(e)).map(_._1).toSet
    val fromF = visibleAt(from)
    val toF = visibleAt(to)
    val windowDeltas = m.deltas.filter(d =>
      epochOf(d.name) > from && epochOf(d.name) <= to)
    // base files a window delta position-deletes from: their live row set
    // changed, so both sides read them (driver-side scan of tiny deltas)
    val refs: Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      windowDeltas.foreach(d => foreachDelete(dir, d.name)((f, _) => out += f))
      out.toSet
    }
    // a referenced "file" may itself be an earlier delta's insert file —
    // readable at a boundary iff that delta is visible there
    def readableAt(e: Long): Set[String] =
      visibleAt(e) ++ m.visibleDeltasAt(Some(e)).map(_.name)
    val onlyFrom = (fromF -- toF) ++ (refs & readableAt(from))
    val onlyTo = (toF -- fromF) ++ (refs & readableAt(to)) ++
      windowDeltas.filter(_.inserts > 0L).map(_.name)
    (onlyFrom.toSeq.sorted, onlyTo.toSeq.sorted)
  }

  /** Fold epochs (and merge-on-read deltas) at or below `upToRequested`
    * into compacted base files. With `where` non-empty, the fold is
    * PARTITION-SCOPED (the Delta `OPTIMIZE … WHERE` shape): only files
    * whose recorded partition tuples PROVE the predicate merge, grouped
    * per tuple, each group's target stamped with ITS OWN max epoch —
    * data moved scales with the named partitions, not the table, which
    * is the only maintenance economics that works at 100 TB (compact
    * yesterday's thousand small streaming files without touching the
    * other petabyte). Under a WHERE: deltas never fold (they carry no
    * tuples — the dangling-reference check still protects them),
    * retained history is left for vacuum, single-file groups are
    * skipped (rewriting a lone file buys nothing), and the retention
    * fence advances only to the merged files' own max epoch. */
  def compact(dir: String, upToRequested: Long,
      where: Seq[org.apache.spark.sql.sources.Filter] = Nil): Int = withCommitLock(dir) {
    require(upToRequested >= 0L,
      s"graft_kv: compact upTo must be >= 0, got $upToRequested")
    val mfp = manifestPath(dir)
    require(Files.exists(mfp), s"graft_kv: no manifest at $dir")
    val mf = readManifest(mfp)
    require(where.isEmpty || mf.partitionSpec.nonEmpty,
      s"graft_kv: OPTIMIZE … WHERE at $dir needs a PARTITIONED BY table " +
        "(the predicate classifies files by their partition tuples)")
    // CLAMP to the newest published epoch: a boundary beyond it would mark
    // FUTURE epochs as already-published, and a live stream's next commit
    // would silently discard its own files as replay duplicates
    val maxEpoch = (mf.files.map(f => epochOf(f._1)) ++
      mf.deltas.map(d => epochOf(d.name))).maxOption.getOrElse(-1L)
    if (maxEpoch < 0L) return 0 // empty table: nothing to compact or fence
    // TAGS clamp the boundary: merging STRICTLY past a tagged epoch would
    // destroy the exact state the tag pins (a merge AT the tag is fine —
    // the compacted file IS that boundary state). The Iceberg rule: a
    // pinned snapshot's files never expire while the ref lives.
    val minTag = mf.refs.values.collect { case (e, "tag") => e }
      .minOption.getOrElse(Long.MaxValue)
    // a BRANCH references the fork boundary's files BY NAME (shallow
    // clone) — merging AT the fork would rename them out from under it,
    // so branches clamp strictly below (tags, which read the merged
    // boundary state, tolerate a merge at their epoch)
    val minBranch = mf.refs.values.collect { case (e, "branch") => e - 1L }
      .minOption.getOrElse(Long.MaxValue)
    val upTo = math.min(math.min(upToRequested, maxEpoch),
      math.min(minTag, minBranch))
    val (old0, keep0) = mf.files.partition(f => epochOf(f._1) <= upTo)
    // WHERE: keep everything the predicate does not PROVE (allMatch over
    // the file's own tuples — untagged files never prove, so clone-
    // foreign/pre-partitioning history is never swept into a scoped
    // fold), and skip single-file tuple groups outright
    val (old, keep) =
      if (where.isEmpty) (old0, keep0)
      else {
        val cache = scala.collection.mutable.HashMap
          .empty[String, Option[GraftPartition.PTransform]]
        def tupleOf(n: String): Map[String, String] =
          GraftPartition.filePartsOf(mf.stats.getOrElse(n, Map.empty))
        val matched = old0.filter { case (n, _) =>
          val parts = tupleOf(n)
          val spec = GraftPartition.fileSpecOf(parts, mf.schema, cache)
          parts.nonEmpty && where.forall(GraftPartition.allMatch(spec, parts, _))
        }
        val merge = matched.groupBy(f => tupleOf(f._1)).values
          .filter(_.size >= 2).flatten.toSeq
        val mergeNames = merge.map(_._1).toSet
        (merge, keep0 ++ old0.filterNot(f => mergeNames.contains(f._1)))
      }
    // merge-on-read deltas at or below the boundary FOLD into the
    // compacted file (deletes applied, inserts appended) — compaction is
    // the delta write shape's designated folding point. A scoped WHERE
    // never folds deltas (no tuples to classify them by).
    val (dOld, dKeep) =
      if (where.isEmpty) mf.deltas.partition(d => epochOf(d.name) <= upTo)
      else (Nil, mf.deltas)
    val newUpTo =
      if (where.isEmpty) math.max(upTo, mf.compactedUpTo)
      else math.max(old.map(f => epochOf(f._1)).maxOption.getOrElse(-1L),
        mf.compactedUpTo)
    // a surviving delta referencing anything being merged away — an old
    // DATA file, or (the subtle one) an old DELTA whose insert records it
    // position-deletes — would leave its targets dangling: the folded
    // file has new positions, so the delete would silently miss and the
    // deleted row RESURFACE (while the manifest COUNT still subtracts
    // it). A compaction boundary BETWEEN two deltas can split a referrer
    // from its target; verify and direct the caller to a boundary that
    // keeps them together.
    if (dKeep.nonEmpty && (old.nonEmpty || dOld.nonEmpty)) {
      val merging = old.map(_._1).toSet ++ dOld.map(_.name)
      dKeep.foreach { d =>
        foreachDelete(dir, d.name) { (target, _) =>
          require(!merging.contains(target),
            s"graft_kv: compact upTo=$upTo would fold '$target', which the " +
              s"later delta ${d.name} position-deletes from — " +
              (if (where.nonEmpty)
                "run plain OPTIMIZE (fold the deltas) before the scoped fold"
              else "raise upTo past that delta"))
        }
      }
    }
    // retained CoW history whose whole visibility window [epoch, removedAt)
    // sits inside the compacted range serves no reconstructable state —
    // reclaim it; a window straddling the boundary stays. A scoped WHERE
    // leaves retained history alone (vacuum's job).
    val (rOld, rKeep) =
      if (where.isEmpty) mf.removed.partition(_.removedAt <= upTo)
      else (Nil, mf.removed)
    if (old.size <= 1 && dOld.isEmpty && rOld.isEmpty) {
      // nothing to merge; still record the retention boundary
      if (newUpTo != mf.compactedUpTo)
        writeManifest(dir, mf.schema, mf.files, newUpTo, mf.stats, mf.blooms,
          mf.deltas, mf.removed, mf.rewrittenUpTo, priorHint = Some(mf))
      return 0
    }
    if (old.isEmpty && dOld.isEmpty) {
      // only expired retained history to reclaim: no data merge needed
      writeManifest(dir, mf.schema, mf.files, newUpTo, mf.stats, mf.blooms,
        mf.deltas, rKeep, mf.rewrittenUpTo, priorHint = Some(mf))
      deleteOwnedUnheld(dir, rOld.map(_.name))
      return rOld.length
    }
    // PARTITIONED tables compact per tuple GROUP (one target per
    // partition value), preserving the one-tuple-per-file invariant the
    // scan-side pruner relies on. Files without tuple entries
    // (pre-partitioning history, clone-foreign references) form their own
    // untagged group. When MOR deltas fold, everything merges into ONE
    // untagged target as before: delta inserts carry no tuple and
    // re-deriving one per row would re-encode the data — the target
    // simply never partition-prunes (absent metadata = read it, sound),
    // and the NEXT partitioned write resumes tagged layout.
    val grouped: Seq[(String, Seq[(String, Long)])] =
      if (mf.partitionSpec.isEmpty || dOld.nonEmpty) Seq("" -> old)
      else if (where.nonEmpty)
        // scoped folds group by the file's FULL recorded tuple — the same
        // grouping that selected the size>=2 groups above. Grouping by
        // CURRENT spec keys here instead would, after partition
        // evolution, collapse matched files lacking a current-spec entry
        // into one untagged group whose target name no longer depends on
        // the tuple: two scoped runs over disjoint old-spec partitions
        // would then hash to the SAME target name at the same epoch, and
        // the second run's REPLACE_EXISTING move would overwrite the
        // first's still-live target (data loss) — and distinct old
        // tuples would silently merge within a single run, losing their
        // pruning metadata. The recorded tuple is evolution-proof.
        old.groupBy { case (n, _) =>
          GraftPartition.filePartsOf(mf.stats.getOrElse(n, Map.empty))
            .toSeq.sortBy(_._1).map { case (k, v) => k + "\u0001" + v }
            .mkString("\u0000")
        }.toSeq.sortBy(_._1)
      else old.groupBy { case (n, _) =>
        val st = mf.stats.getOrElse(n, Map.empty)
        val vs = mf.partitionSpec.map(k =>
          st.get(GraftPartition.PartKey + k).map(_._1))
        if (vs.exists(_.isEmpty)) "" // untagged group
        else vs.flatten.mkString("\u0000")
      }.toSeq.sortBy(_._1)
    val groups: Seq[(String, Seq[(String, Long)])] =
      if (where.nonEmpty)
        // scoped folds name targets by a TUPLE hash, not a run-relative
        // index: two WHERE runs over different partitions at the same
        // epoch must never write the same name (an index would clobber a
        // live earlier target); a re-fold of the SAME tuple includes the
        // earlier target in its group, so same-name replacement is the
        // consistent re-merge, exactly like classic compaction
        grouped.map { case (k, fs) =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(k.getBytes(StandardCharsets.UTF_8))
          (s"-p${md.take(6).map(b => f"$b%02x").mkString}", fs)
        }
      else if (grouped.length <= 1) grouped.map { case (_, fs) => ("", fs) }
      else grouped.zipWithIndex.map { case ((_, fs), i) => (s"-g$i", fs) }
    val targets = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Map[String, (String, String)], Map[String, String])]
    for ((suffix, gOld) <- groups) {
    // scoped folds stamp each target with ITS group's own max epoch (the
    // retention fence only advances that far); classic folds stamp the
    // global boundary as before
    val gEpoch =
      if (where.isEmpty) upTo else gOld.map(f => epochOf(f._1)).max
    val target = f"epoch-$gEpoch-compacted$suffix.kv"
    val tmp = Paths.get(dir, target + ".tmp")
    var targetRows = 0L
    if (dOld.isEmpty) {
      // no deltas in range: driver-side streaming byte concat, no re-encode
      val out = Files.newOutputStream(tmp)
      try gOld.map(_._1).sorted.foreach { n =>
        Files.copy(dataPath(dir, n), out)
      } finally out.close()
      targetRows = gOld.map(_._2).sum
    } else {
      // fold: per-file position-deletes from the folded deltas, then the
      // surviving base lines in file order, then the surviving inserts
      val delByFile = new java.util.HashMap[String, java.util.HashSet[Long]]()
      dOld.foreach { d =>
        foreachDelete(dir, d.name) { (f, pos) =>
          var set = delByFile.get(f)
          if (set == null) { set = new java.util.HashSet[Long](); delByFile.put(f, set) }
          set.add(pos): Unit
        }
      }
      val w = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
      try {
        def foldLines(name: String, insertPayloads: Boolean): Unit = {
          val dels = delByFile.get(name)
          val st = Files.lines(dataPath(dir, name))
          try {
            val it = st.iterator()
            var pos = -1L
            while (it.hasNext) {
              val l = it.next()
              pos += 1L
              // a U record folds as its post-image row (the pre-image was
              // position-deleted from its own target file)
              val live = (dels == null || !dels.contains(pos)) &&
                (!insertPayloads || l.startsWith("I\t") || l.startsWith("U\t"))
              if (live) {
                w.write(if (insertPayloads) GraftKvSink.deltaPayload(l) else l)
                w.write('\n')
                targetRows += 1L
              }
            }
          } finally st.close()
        }
        gOld.map(_._1).sorted.foreach(foldLines(_, insertPayloads = false))
        dOld.map(_.name).sorted.foreach(foldLines(_, insertPayloads = true))
      } finally w.close()
    }
    Files.move(tmp, Paths.get(dir, target), StandardCopyOption.REPLACE_EXISTING)
    // merged stats: a column survives only if every merged file knows it
    // (an unknown input makes the union range unknowable). Folded deltas
    // drop stats/blooms entirely: inserts carry values outside the merged
    // ranges, and absent stats never prune — the sound default.
    val oldStats =
      if (dOld.nonEmpty) Nil else gOld.map(f => mf.stats.getOrElse(f._1, Map.empty))
    val mergedCols = oldStats.map(_.keySet.map(_.toLowerCase))
      .reduceOption(_ intersect _).getOrElse(Set.empty)
    val targetStats = mergedCols.flatMap { c =>
      mf.schema.fields.find(_.name.equalsIgnoreCase(c)).map { field =>
        val ranges = oldStats.map(_.find(_._1.equalsIgnoreCase(c)).get._2)
        val mn = ranges.map(_._1).reduce((a, b) => if (le(field.dataType, a, b)) a else b)
        val mx = ranges.map(_._2).reduce((a, b) => if (le(field.dataType, a, b)) b else a)
        c -> (mn, mx)
      }
    }.toMap ++ {
      // partition tuple entries carry to the group target when every
      // merged file agrees (true by grouping; the untagged group, delta
      // folds, and mixed pre-partitioning inputs simply carry nothing)
      mergedCols.filter(_.startsWith(GraftPartition.PartKey)).flatMap { k =>
        val vs = oldStats.map(_.find(_._1.equalsIgnoreCase(k)).get._2).distinct
        if (vs.length == 1) Some(k -> vs.head) else None
      }.toMap
    }
    // merged blooms: same all-or-nothing rule, OR-merged bit-for-bit
    // (identical create parameters across writers make them compatible);
    // the total row count must stay within the cap or fpp degrades
    val oldBlooms =
      if (dOld.nonEmpty) Nil else gOld.map(f => mf.blooms.getOrElse(f._1, Map.empty))
    val bloomCols =
      if (gOld.map(_._2).sum > BloomRowCap) Set.empty[String]
      else oldBlooms.map(_.keySet.map(_.toLowerCase))
        .reduceOption(_ intersect _).getOrElse(Set.empty)
        .filterNot(isSketchKey) // sketch keys merge below, uncapped
    val targetBlooms = bloomCols.map { c =>
      val merged = oldBlooms.map { bl =>
        org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(java.util.Base64.getDecoder
            .decode(bl.find(_._1.equalsIgnoreCase(c)).get._2)))
      }.reduce((a, b) => a.mergeInPlace(b))
      val bos = new java.io.ByteArrayOutputStream()
      merged.writeTo(bos)
      c -> java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }.toMap ++ {
      // sketch keys merge uncapped (quality is size-independent): HLLs by
      // register-wise max union, cnt:/len: counters by SUM; same
      // all-or-nothing rule per column as every other merged stat
      val sketchCols = oldBlooms.map(_.keySet.map(_.toLowerCase)
          .filter(isSketchKey))
        .reduceOption(_ intersect _).getOrElse(Set.empty)
      sketchCols.map { c =>
        val parts = oldBlooms.map(_.find(_._1.equalsIgnoreCase(c)).get._2)
        c -> (if (c.startsWith(HllKey))
          java.util.Base64.getEncoder.encodeToString(hllMergeB64(parts))
        else parts.map(_.toLong).sum.toString)
      }.toMap
    }
    targets += ((target, targetRows, targetStats, targetBlooms))
    } // per-group loop
    val targetNames = targets.map(_._1).toSet
    // single visibility switch: after this write, readers see only the
    // compacted files; the superseded inputs become unreferenced garbage
    writeManifest(dir, mf.schema,
      targets.toSeq.map(t => (t._1, t._2)) ++ keep, newUpTo,
      mf.stats -- old.map(_._1) ++
        targets.collect { case (t, _, st, _) if st.nonEmpty => t -> st },
      mf.blooms -- old.map(_._1) ++
        targets.collect { case (t, _, _, bl) if bl.nonEmpty => t -> bl },
      dKeep, rKeep, mf.rewrittenUpTo, priorHint = Some(mf))
    deleteOwnedUnheld(dir,
      old.collect { case (n, _) if !targetNames.contains(n) => n } ++
        dOld.map(_.name) ++ rOld.map(_.name))
    // merged-file count reports only files actually deleted (a clone's
    // foreign references fold into the local target but stay in place)
    old.count(f => !targetNames.contains(f._1) && !isForeign(f._1)) +
      dOld.length + rOld.count(r => !isForeign(r.name))
  }
}

final class GraftKvTable(dir: String, tableSchema: StructType,
    mor: Boolean = false,
    // SQL time travel (`SELECT … FROM graft.ns.t VERSION AS OF n`): the
    // catalog loads a version-pinned instance whose every scan reads the
    // epoch-n boundary state; such a table is read-only by construction
    pinnedEpoch: Option[Long] = None,
    // `epochs 'true'` table option: EVERY batch write is epoch-stamped
    // from the first commit on (overwrite restarts at 0, appends take
    // max+1). Gives plain-SQL tables the full epoch machinery — per-epoch
    // streaming replay, VERSION AS OF boundaries, and O(delta) index/MV
    // refresh — which epoch-less tables (the default, whose streams are
    // one-shot snapshots by documented design) never get.
    stampEpochs: Boolean = false,
    // CHECK constraints (`check.<name>` table properties, the Delta
    // `delta.constraints.*` shape): boolean SQL expressions every row a
    // BATCH WRITE commits must satisfy (NULL passes, standard CHECK
    // semantics). Enforced by plans.CheckConstraintRule, which wraps the
    // write's query in a raise-on-violation filter at analysis time —
    // rows are checked where they are computed, no extra pass. A THUNK so
    // the path route can defer its manifest parse to write planning —
    // pure reads never pay for constraint resolution.
    checkConstraintsF: () => Map[String, String] = () => Map.empty,
    // `sortBy 'c1,c2'` table option: every batch/streaming WRITE requests
    // Distributions.ordered + a matching per-partition sort via the DSv2
    // RequiresDistributionAndOrdering contract, so a PLAIN `INSERT INTO`
    // produces range-clustered files with pairwise-disjoint min/max stats —
    // the layout the scan-side stats pruning pays off on (a point probe
    // opens one file of N). The user never repartitions by hand; Spark
    // plans the range exchange + sort inside the write's own query.
    sortCols: Seq[String] = Nil,
    // `sortBuckets 'n'`: pin the ordered distribution's partition count
    // (DSv2 requiredNumPartitions) — 0 lets Spark/AQE size the exchange.
    // At fixture scale AQE coalesces small writes to one file, which
    // defeats a clustering demo; at 100 TB leave it 0 and let AQE size.
    sortBuckets: Int = 0,
    // declared partitioning (canonical transform strings) — a THUNK like
    // checkConstraintsF: the path route defers its manifest parse to
    // first use; the catalog route passes the stored spec directly
    partitionSpecF: () => Seq[String] = () => Nil)
  extends Table with SupportsWrite with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations
  with org.apache.spark.sql.connector.catalog.SupportsDeleteV2
  with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {

  // read-only identity for the planner (IndexRewriteRule matches kv scans
  // by data path and must never redirect a version-pinned read)
  private[graft] def path: String = dir
  private[graft] def pinned: Option[Long] = pinnedEpoch

  /** `_file` / `_pos` metadata columns (the Iceberg `_metadata.file_name` /
    * `_metadata.row_index` analogues): which manifest-listed file holds the
    * row, and the row's line ordinal within it. Queryable directly;
    * `_file` is REQUIRED by the copy-on-write operation (requesting a
    * metadata attribute routes ReplaceData through the projecting write
    * task, which hands the DataWriter clean data rows), and the pair is
    * the merge-on-read operation's ROW ID (position deletes). */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_file"
        override def dataType(): DataType = StringType
        override def isNullable: Boolean = false
        override def comment(): String = "name of the data file holding the row"
      },
      new org.apache.spark.sql.connector.catalog.MetadataColumn {
        override def name(): String = "_pos"
        override def dataType(): DataType = LongType
        override def isNullable: Boolean = false
        override def comment(): String = "line ordinal of the row in its file"
      })
  /** The same table pinned to epoch `epoch`'s boundary state (read-only). */
  /** The table's CHECK constraints, resolved once on first (write-side)
    * use — reads never force the thunk. GENERATED ALWAYS AS columns fold
    * in as derived `gen_<col>` equality checks (see generatedChecks), so
    * every enforcement point — plan splice, batch/streaming/MOR writer
    * guards — covers them with zero extra machinery. */
  private[graft] lazy val checkConstraints: Map[String, String] =
    checkConstraintsF() ++ GraftKvSink.generatedChecks(tableSchema)
  /** The table's declared partitioning, resolved once on first use. */
  private[graft] lazy val partitionSpec: Seq[String] = partitionSpecF()
  def atVersion(epoch: Long): GraftKvTable =
    new GraftKvTable(dir, tableSchema, mor, Some(epoch), stampEpochs,
      checkConstraintsF, sortCols, sortBuckets, partitionSpecF)
  /** PARTITIONED BY, reported back through Spark's own metadata surface
    * (DESCRIBE TABLE's partitioning section reads this). */
  override def partitioning(): Array[Transform] =
    GraftPartition.toTransforms(partitionSpec, tableSchema)
  override def name(): String =
    s"graft_kv($dir${pinnedEpoch.map(n => s" version=$n").getOrElse("")})"
  override def schema(): StructType = tableSchema
  /** `SHOW TBLPROPERTIES graft.ns.t` surfaces the table's behavioral
    * options and constraint set through Spark's own command. */
  override def properties(): util.Map[String, String] = {
    val m = new java.util.LinkedHashMap[String, String]()
    m.put("path", dir)
    if (mor) m.put("mor", "true")
    if (stampEpochs) m.put("epochs", "true")
    if (sortCols.nonEmpty) m.put("sortby", sortCols.mkString(","))
    if (sortBuckets > 0) m.put("sortbuckets", sortBuckets.toString)
    if (partitionSpec.nonEmpty)
      m.put("partitionedby", partitionSpec.mkString(","))
    checkConstraints.toSeq.sortBy(_._1).foreach { case (k, v) =>
      m.put(s"check.$k", v) }
    m
  }
  override def capabilities(): util.Set[TableCapability] =
    if (pinnedEpoch.isDefined) Set(TableCapability.BATCH_READ).asJava
    else Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ,
      // INSERT OVERWRITE: predicate form (replaceWhere — commit-time
      // file classification by partition tuple) and dynamic form
      // (replace exactly the partitions the incoming data lands in)
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      // unlocks Spark's own MERGE schema evolution: with this capability
      // AND the explicit per-statement `MERGE WITH SCHEMA EVOLUTION INTO`
      // spelling, the analyzer's ResolveMergeIntoSchemaEvolution computes
      // AddColumn changes from the source's extra columns and routes them
      // through the catalog's alterTable — the same manifest evolveSchema
      // path ALTER TABLE ADD COLUMN takes, so history null-fills and the
      // merge's own write lands full-width. A PLAIN merge never evolves
      // (extra source columns are ignored by star intersection), so no
      // table silently widens — statement-level opt-in, the Iceberg rule.
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  /** NATIVE row-level DML (`DELETE FROM` / `UPDATE` / `MERGE INTO` in
    * plain Spark SQL): Spark's own rewrite rules
    * (RewriteDeleteFromTable/RewriteUpdateTable/RewriteMergeIntoTable)
    * plan the full clause semantics — conditional MATCHED clauses,
    * NOT MATCHED BY SOURCE, cardinality checks — and hand this connector
    * a GROUP-BASED replace whose groups are FILES: the operation's scan
    * prunes to the files that can hold matching rows (manifest stats +
    * blooms — the same pruning every read uses), the rewritten query
    * carries those files' surviving + modified rows, and the commit swaps
    * exactly that file set in the manifest behind the usual single
    * visibility switch. Untouched files are never rewritten — the
    * copy-on-write shape Delta/Iceberg use, driven here by the manifest's
    * own region-style metadata. */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    require(pinnedEpoch.isEmpty,
      s"graft_kv: ${info.command} on a VERSION AS OF read is not allowed")
    if (mor) () => new GraftKvDeltaOperation(dir, info, () => checkConstraints)
    else () => new org.apache.spark.sql.connector.write.RowLevelOperation {
      // the scan built during planning defines the replace groups; the
      // write reads them lazily at commit (planning order: scan first)
      @volatile private var groupScan: GraftKvScan = _
      override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command =
        info.command
      override def description(): String = s"graft_kv ${info.command} $dir"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
        // a COPY-ON-WRITE replace swaps whole files; delta files overlay
        // OTHER files' rows, so replacing one like-for-like would lose or
        // duplicate overlaid rows — fold them into the base first
        val mfP = GraftKvSink.manifestPath(dir)
        if (Files.exists(mfP))
          require(GraftKvSink.readManifest(mfP).deltas.isEmpty,
            s"graft_kv: copy-on-write DML on $dir with merge-on-read delta " +
              "files present — compact first, or set mor=true on the table")
        new GraftKvScanBuilder(dir, None, onBuild = s => groupScan = s)
      }
      // requesting _file routes ReplaceData through the projecting write
      // task (plain group-based writes would otherwise hand the writer
      // rows still carrying the __row_operation marker column)
      override def requiredMetadataAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
        Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder =
        new GraftKvWriteBuilder(dir, winfo.schema(),
          replaceFiles = Some(() =>
            Option(groupScan).map(_.visibleFiles).getOrElse(Seq.empty)),
          snapshot = () => Option(groupScan).map(_.plannedManifest),
          readFilters = () =>
            Option(groupScan).map(_.pushedFilterSeq).getOrElse(Nil),
          // keep the table's clustering invariant through CoW rewrites:
          // replacement files come out range-clustered like any insert
          sortCols = sortCols, sortBuckets = sortBuckets,
          // UPDATE can mint violating post-images; surviving rows already
          // satisfy the invariant, so the re-check is free of surprises
          checks = checkConstraints,
          // CoW replacements re-split by tuple — rewrites never decay
          // the partition layout
          partSpecF = () => partitionSpec)
    }
  }

  /** Metadata-only DELETE, two shapes. Unconditional (`DELETE FROM t`,
    * whose always-true condition the optimizer folds away from the
    * group-based path): truncate the manifest directly. PARTITION-ALIGNED
    * (`DELETE FROM t WHERE status = 'F'` on a table partitioned by
    * status): every current file proves wholly-deleted or wholly-kept by
    * its recorded tuple, so the delete is ONE manifest publish dropping
    * exactly the matching partitions' files — no row is read or
    * rewritten, the decisive difference at 100 TB. Anything
    * unclassifiable declines and Spark falls back to the row-level
    * rewrite, which handles every predicate correctly. */
  private def classifyDeleteFiles(
      filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Seq[(String, Long)]] = {
    val mf = GraftKvSink.manifestPath(dir)
    if (!Files.exists(mf)) return Some(Nil)
    val m = GraftKvSink.readManifest(mf)
    if (m.deltas.nonEmpty) return None // overlays: only the rewrite is exact
    val v1 = filters.map(GraftPartition.v2ToV1)
    if (v1.exists(_.isEmpty)) return None
    val fs = v1.flatten.toSeq
    val cache = scala.collection.mutable.HashMap
      .empty[String, Option[GraftPartition.PTransform]]
    val drop = Seq.newBuilder[(String, Long)]
    m.files.foreach { case (n, r) =>
      val st = m.stats.getOrElse(n, Map.empty)
      val parts = GraftPartition.filePartsOf(st)
      val spec = GraftPartition.fileSpecOf(parts, m.schema, cache)
      val all = fs.forall(GraftPartition.allMatch(spec, parts, _))
      val none = fs.exists(f => !GraftPartition.mayMatch(spec, parts, f) ||
        !GraftKvSink.mayMatch(m.schema, st, f))
      if (all) drop += ((n, r))
      else if (!none) return None // mixed file: row-level rewrite decides
    }
    Some(drop.result())
  }
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Boolean =
    filters.isEmpty || filters.forall(_.name() == "ALWAYS_TRUE") ||
      classifyDeleteFiles(filters).isDefined
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    require(pinnedEpoch.isEmpty,
      "graft_kv: DELETE on a VERSION AS OF read is not allowed")
    val mf = GraftKvSink.manifestPath(dir)
    if (!Files.exists(mf)) return
    if (filters.isEmpty || filters.forall(_.name() == "ALWAYS_TRUE")) {
      GraftKvSink.withCommitLock(dir) {
        // publish the empty manifest FIRST (the single visibility switch),
        // THEN reclaim the files: a crash in between leaves harmless
        // garbage for vacuum, never a manifest pointing at deleted files
        val m = GraftKvSink.readManifest(mf)
        GraftKvSink.writeManifest(dir, tableSchema, Seq.empty,
          priorHint = Some(m))
        GraftKvSink.deleteOwnedUnheld(dir,
          m.files.map(_._1) ++ m.deltas.map(_.name) ++ m.removed.map(_.name))
      }
      return
    }
    GraftKvSink.withCommitLock(dir) {
      // RE-classify under the lock (a commit may have landed since
      // canDeleteWhere) — a state that no longer classifies refuses
      // loudly rather than half-deleting
      val drop = classifyDeleteFiles(filters).getOrElse(
        throw new IllegalStateException(
          s"graft_kv: concurrent commit at $dir made the partition-" +
            "aligned DELETE unclassifiable — rerun the statement"))
      if (drop.isEmpty) return
      val m = GraftKvSink.readManifest(mf)
      val dropNames = drop.map(_._1).toSet
      // epoch tables keep the dropped files as RETAINED history (the CoW
      // rule: boundary states before the delete reconstruct until
      // vacuum); epoch-less tables reclaim immediately
      val keepHistory =
        drop.exists(d => GraftKvSink.baseName(d._1).startsWith("epoch-"))
      val delEpoch = (m.files.map(f => GraftKvSink.epochOf(f._1)) ++
        m.removed.map(_.removedAt) ++
        Seq(m.rewrittenUpTo, m.compactedUpTo)).max.max(0L) + 1L
      GraftKvSink.writeManifest(dir, m.schema,
        m.files.filterNot(f => dropNames.contains(f._1)), m.compactedUpTo,
        m.stats -- dropNames, m.blooms -- dropNames, m.deltas,
        if (keepHistory)
          m.removed ++ drop.map { case (n, r) =>
            GraftKvSink.RemovedFile(n, r, delEpoch) }
        else m.removed,
        if (keepHistory) math.max(m.rewrittenUpTo, delEpoch)
        else m.rewrittenUpTo,
        priorHint = Some(m))
      if (!keepHistory)
        GraftKvSink.deleteOwnedUnheld(dir, dropNames.toSeq)
    }
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedEpoch.isEmpty,
      "graft_kv: writes to a VERSION AS OF read are not allowed")
    sortCols.foreach { c =>
      require(tableSchema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"graft_kv: sortBy column '$c' is not in the table schema " +
          s"(${tableSchema.fieldNames.mkString(", ")})")
      // arrays have no order — a sort key over them would impose the
      // cell encoding's accidental string order (SURVEY §7.46 refusal)
      require(!tableSchema.fields.exists(f => f.name.equalsIgnoreCase(c) &&
          f.dataType.isInstanceOf[ArrayType]),
        s"graft_kv: sortBy column '$c' is an ARRAY — arrays have no " +
          "sort order")
    }
    require(sortBuckets >= 0,
      s"graft_kv: sortBuckets must be >= 0, got $sortBuckets")
    new GraftKvWriteBuilder(dir, info.schema(),
      Option(info.options.get("epoch")).map(_.toLong),
      stampEpochs = stampEpochs, queryId = info.queryId(),
      sortCols = sortCols, sortBuckets = sortBuckets,
      checks = checkConstraints, partSpecF = () => partitionSpec,
      fanoutOnly = Option(info.options.get("fanoutOnly")).exists(_.toBoolean))
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // time travel over streaming-written data: `.option("asOfEpoch", n)`
    // reads only files published by epochs <= n — the manifest IS the
    // version history, so no data is copied (the HBase-version/timestamp
    // read analogue; version_compact models the latest-cell-wins side).
    // `.option("maxEpochsPerTrigger", n)` rate-limits a streaming read to
    // n epochs per micro-batch (the Kafka maxOffsetsPerTrigger analogue).
    // `.option("onlyFiles", "a.kv,b.kvd")` restricts the scan to the named
    // files/delta-insert records (still under the boundary's full delta
    // masking) — the changefeed's file-targeted read
    val optAsOf = Option(options.get("asOfEpoch")).map(_.toLong)
    // a version-pinned table (SQL VERSION AS OF) fixes the boundary; a
    // conflicting reader option would silently read a different state
    (pinnedEpoch, optAsOf) match {
      case (Some(p), Some(o)) => require(p == o,
        s"graft_kv: asOfEpoch=$o conflicts with VERSION AS OF $p")
      case _ => ()
    }
    val asOf = pinnedEpoch.orElse(optAsOf)
    val maxEpochs = Option(options.get("maxEpochsPerTrigger")).map(_.toLong)
    val onlyFiles = Option(options.get("onlyFiles"))
      .map(_.split(",").map(_.trim).toSet)
    // `.option("readChangeFeed", "true")` on a STREAMING read: micro-batches
    // carry per-row change records (_change_type, _commit_epoch) instead of
    // snapshot state — see GraftKvMicroBatchStream's CDC planning
    val cdc = Option(options.get("readChangeFeed")).exists(_.toBoolean)
    if (cdc) require(asOf.isEmpty,
      "graft_kv: readChangeFeed and asOfEpoch/VERSION AS OF are exclusive " +
        "(a changefeed is a range of epochs, not a boundary state)")
    // `.option("startingEpoch", n)` on a STREAMING read: begin at epoch n
    // instead of the initial snapshot (Delta CDF's startingVersion / the
    // Kafka startingOffsets shape). Also what lets a CDC stream start on
    // a copy-on-write table AFTER its last rewrite: epochs from n on have
    // exact change records even though older history does not.
    val startEpochOpt = Option(options.get("startingEpoch")).map(_.toLong)
    // `.option("startingTimestamp", t)` — the wall-clock spelling of a
    // stream's starting point (Delta's startingTimestamp): resolves to the
    // first epoch committed strictly AFTER the boundary at t (before the
    // earliest commit = the whole history), then follows the exact
    // startingEpoch path, gates included.
    val startTs = Option(options.get("startingTimestamp"))
      .map(GraftKvSink.parseTsMillis)
    startTs.foreach { _ => require(startEpochOpt.isEmpty,
      "graft_kv: startingTimestamp and startingEpoch are mutually " +
        "exclusive — pick one spelling of the starting point") }
    val startEpoch = startEpochOpt.orElse(startTs.map { t =>
      val mfp0 = GraftKvSink.manifestPath(dir)
      require(Files.exists(mfp0), s"graft_kv: no manifest at $dir")
      val ets = GraftKvSink.readManifest(mfp0).epochTs
      require(ets.nonEmpty,
        s"graft_kv: $dir has no recorded commit timestamps " +
          "(pre-timestamp manifest); use startingEpoch")
      if (t < ets.values.min) 0L
      else GraftKvSink.resolveTimestamp(dir, t) + 1L
    })
    // `.option("fromEpoch", n)` on a BATCH read: only rows appended by
    // epochs >= n (optionally bounded above by asOfEpoch) — the Delta
    // `startingVersion` batch-incremental shape: a periodic batch job
    // reads "what arrived since my last high-water mark" without
    // replaying the whole table or keeping a stream alive. Only sound
    // over a PURE-APPEND range, so compaction, a CoW rewrite, or
    // merge-on-read deltas at or above the boundary refuse loudly (an
    // incremental consumer of mutated history needs readChangeFeed).
    // Epoch-less batch files count as epoch 0, matching every other
    // epoch-keyed surface here.
    val fromEpochOpt = Option(options.get("fromEpoch")).map(_.toLong)
    // `.option("fromTimestamp", t)` — the wall-clock spelling of the same
    // high-water mark (epoch-millis or an ISO-8601 instant): resolves to
    // the first epoch committed strictly AFTER the boundary the TIMESTAMP
    // AS OF rule answers at t (a time before the earliest commit means
    // "everything"), then follows the exact fromEpoch path and gates.
    val fromTs = Option(options.get("fromTimestamp"))
      .map(GraftKvSink.parseTsMillis)
    fromTs.foreach { _ => require(fromEpochOpt.isEmpty,
      "graft_kv: fromTimestamp and fromEpoch are mutually exclusive — " +
        "pick one spelling of the high-water mark") }
    val fromEpoch = fromEpochOpt.orElse(fromTs.map { t =>
      val mfp0 = GraftKvSink.manifestPath(dir)
      require(Files.exists(mfp0), s"graft_kv: no manifest at $dir")
      val ets = GraftKvSink.readManifest(mfp0).epochTs
      require(ets.nonEmpty,
        s"graft_kv: $dir has no recorded commit timestamps " +
          "(pre-timestamp manifest); use fromEpoch")
      if (t < ets.values.min) 0L
      else GraftKvSink.resolveTimestamp(dir, t) + 1L
    })
    fromEpoch.foreach { n =>
      require(n >= 0L, s"graft_kv: fromEpoch=$n — epochs are >= 0")
      require(!cdc && startEpoch.isEmpty,
        "graft_kv: fromEpoch is a batch option — streams use " +
          "startingEpoch/readChangeFeed")
      asOf.foreach(a => require(a >= n,
        s"graft_kv: fromEpoch=$n is above the asOfEpoch=$a upper bound"))
    }
    startEpoch.foreach { n =>
      require(n >= 0L, s"graft_kv: startingEpoch=$n — epochs are >= 0")
      require(asOf.isEmpty,
        "graft_kv: startingEpoch and asOfEpoch/VERSION AS OF are exclusive")
      // validate against the manifest NOW, with option-shaped errors: a
      // beyond-head start would stream nothing forever (initialOffset
      // past latestOffset), and a start inside compacted/rewritten
      // history would only fail at the first trigger with a misleading
      // stale-checkpoint message
      val mfP = GraftKvSink.manifestPath(dir)
      if (Files.exists(mfP)) {
        val m = GraftKvSink.readManifest(mfP)
        // an EXPLICIT epoch must name a committed boundary; a CLOCK start
        // resolves to head+1 when t is at/after the last commit — the
        // natural "from now" stream, which legitimately WAITS for future
        // epochs instead of refusing
        if (startTs.isEmpty) GraftKvSink.requireAnswerableEpoch(m, n)
        require(m.compactedUpTo < 0L || n > m.compactedUpTo,
          s"graft_kv: startingEpoch=$n is inside compacted history " +
            s"(epochs <= ${m.compactedUpTo} were merged — their " +
            "fine-grained boundaries no longer exist)")
        require(m.rewrittenUpTo < 0L || n > m.rewrittenUpTo,
          s"graft_kv: startingEpoch=$n is at or below the row-level " +
            s"rewrite at epoch ${m.rewrittenUpTo} — start past it " +
            "(rewrites have no per-epoch replay)")
      }
    }
    new GraftKvScanBuilder(dir, asOf, maxEpochs, onlyFiles = onlyFiles,
      changeFeed = cdc, startEpoch = startEpoch, fromEpoch = fromEpoch)
  }
}

/** MERGE-ON-READ row-level operation (`SupportsDelta`): Spark's own rewrite
  * rules plan `WriteDelta` instead of `ReplaceData`, handing this connector
  * per-row DELETE / UPDATE / INSERT actions keyed by the (`_file`, `_pos`)
  * ROW ID — the Iceberg position-delta shape, and the HBase-native write
  * shape (cells are deltas; compaction merges). A 1-row MERGE writes one
  * tiny `.kvd` delta file instead of rewriting a whole data file; reads
  * apply visible deltas (position-deletes mask base rows, insert records
  * surface as their own partitions), and [[GraftKvSink.compact]] folds
  * deltas back into base files. Because nothing is rewritten, MOR DML
  * never fences time travel: an `asOfEpoch` below the delta's epoch reads
  * the exact pre-DML state. */
final class GraftKvDeltaOperation(dir: String,
    info: org.apache.spark.sql.connector.write.RowLevelOperationInfo,
    checksF: () => Map[String, String] = () => Map.empty)
  extends org.apache.spark.sql.connector.write.SupportsDelta {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command =
    info.command
  override def description(): String = s"graft_kv mor ${info.command} $dir"
  // the scan built during planning defines the state the position-deletes
  // were computed against; the write's conflict gate compares versions
  // against IT (a factory-time re-read would hide commits landing in the
  // planning-to-execution gap)
  @volatile private var groupScan: GraftKvScan = _
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftKvScanBuilder(dir, None, onBuild = s => groupScan = s)
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column("_file"), Expressions.column("_pos"))
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty
  override def newWriteBuilder(winfo: LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriteBuilder =
    new org.apache.spark.sql.connector.write.DeltaWriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.DeltaWrite =
        new org.apache.spark.sql.connector.write.DeltaWrite {
          override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite =
            new GraftKvDeltaBatchWrite(dir, winfo.schema(),
              () => Option(groupScan).map(_.plannedManifest), checksF(),
              readFilters =
                () => Option(groupScan).map(_.pushedFilterSeq).getOrElse(Nil))
        }
    }
}

/** Batch half of the delta write: same per-task temp-file discipline as the
  * data write; the driver-side commit stamps every surviving action file
  * with ONE fresh epoch (greater than every published file/delta epoch)
  * and appends them to the manifest's `deltas` list behind the usual
  * atomic publish. Base files are never touched. */
final class GraftKvDeltaBatchWrite(dir: String, rowSchema: StructType,
    snapshot: () => Option[GraftKvSink.Manifest] = null,
    // CHECK constraints at the writer (same recipe as the batch/streaming
    // data writers): MOR UPDATE/INSERT post-images must satisfy the table
    // invariant even from a session without the injected plan rules;
    // position-deletes carry no row and are never checked
    checks: Map[String, String] = Map.empty,
    // the operation's pushed READ filters — the conflict gate's evidence
    // that a concurrent delta's targets are outside this DML's region
    readFilters: () => Seq[org.apache.spark.sql.sources.Filter] = () => Nil)
  extends org.apache.spark.sql.connector.write.DeltaBatchWrite {

  // same writeId temp scoping as the data write: a concurrent job's
  // in-flight delta temps must survive this commit's sweep
  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  // optimistic snapshot, same contract as GraftKvBatchWrite: position-
  // deletes were computed against THIS state, so a concurrent commit that
  // moved rows (or deleted them first) invalidates the positions
  @volatile private var planned: Option[GraftKvSink.Manifest] = None

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DeltaWriterFactory = {
    Files.createDirectories(Paths.get(dir))
    val mfP0 = GraftKvSink.manifestPath(dir)
    planned =
      Option(snapshot).flatMap(_.apply()).orElse(
        if (Files.exists(mfP0)) Some(GraftKvSink.readManifest(mfP0)) else None)
    val schemaJson = rowSchema.json
    val d = dir
    val wid = writeId
    val guard: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
      graft.plans.CheckConstraints.writerGuard(
        org.apache.spark.sql.SparkSession.active, rowSchema, checks)
    val layoutL = GraftKvSink.writeLayout(rowSchema, planned)
    new org.apache.spark.sql.connector.write.DeltaWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long)
          : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] = {
        val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val inner = new GraftKvDeltaWriter(d, sch,
          f"delta-part-$partitionId%05d-$taskId.$wid.tmp",
          f"delta-part-$partitionId%05d-$taskId.kvd", layoutL)
        guard match {
          case None => inner
          case Some(g) =>
            new org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
              private val p =
                org.apache.spark.sql.catalyst.expressions.Predicate.create(g)
              p.initialize(partitionId)
              override def delete(meta: InternalRow, id: InternalRow): Unit =
                inner.delete(meta, id)
              override def insert(row: InternalRow): Unit = {
                p.eval(row); inner.insert(row)
              }
              override def update(meta: InternalRow, id: InternalRow,
                  row: InternalRow): Unit = {
                p.eval(row); inner.update(meta, id, row)
              }
              override def write(row: InternalRow): Unit = insert(row)
              override def commit(): WriterCommitMessage = inner.commit()
              override def abort(): Unit = inner.abort()
              override def close(): Unit = inner.close()
            }
        }
      }
    }
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect { case m: GraftKvDeltaCommit => m }
      .filter { m =>
        if (m.inserts == 0L && m.deletes == 0L)
          Files.deleteIfExists(Paths.get(dir, m.tmpName))
        m.inserts > 0L || m.deletes > 0L
      }
    if (committed.nonEmpty) GraftKvSink.withCommitLock(dir) {
      val mfP = GraftKvSink.manifestPath(dir)
      require(Files.exists(mfP),
        s"graft_kv: row-level delta write against $dir with no manifest")
      val m = GraftKvSink.readManifest(mfP)
      // CONFLICT GATE (version advanced past the plan-time snapshot):
      // this write's position-deletes name (file, pos) pairs computed
      // against the snapshot. Refuse when a snapshot file/delta is gone
      // (truncate, CoW rewrite, compaction re-positions every row).
      // Concurrent ADDITIONS resolve at partition/file granularity, the
      // same rule as the CoW gate (the isolation level must not depend
      // on the table's mor option): an added data file or a pure-delete
      // delta whose targets are all PROVABLY outside this DML's read
      // region merges (positions stable, no phantom possible); an
      // addition inside the region — or a delta carrying inserts, which
      // have no stats to exclude — refuses. Delta Lake's concurrent
      // row-level rule, delta-flavored.
      val snapVer = planned.map(_.version).getOrElse(-1L)
      if (m.version != snapVer) {
        def refuse(why: String): Nothing = throw new IllegalStateException(
          s"graft_kv: concurrent commit detected at $dir — this row-level " +
            s"DML was planned against manifest version $snapVer but the " +
            s"table is now at version ${m.version} and $why; rerun the DML " +
            "against the current state")
        val curFiles = m.files.map(_._1).toSet
        val curDeltas = m.deltas.map(_.name).toSet
        val snapOk = planned.exists { p =>
          p.files.map(_._1).forall(curFiles.contains) &&
            p.deltas.map(_.name).forall(curDeltas.contains) &&
            m.compactedUpTo == p.compactedUpTo &&
            m.rewrittenUpTo == p.rewrittenUpTo
        }
        if (!snapOk) refuse("files this DML read were rewritten or removed")
        val snapDeltas = planned.map(_.deltas.map(_.name).toSet)
          .getOrElse(Set.empty)
        // a concurrent delta MERGES when it is provably DISJOINT from this
        // DML's read region: a pure position-delete (inserts carry no
        // stats and can never be excluded) whose every target file
        // contradicts one of this DML's pushed read filters — such a file
        // was pruned from this DML's scan, so neither the position sets
        // nor the phantom rule can overlap. Two MOR DMLs maintaining
        // different partitions of the same table no longer queue.
        val newDeltas = m.deltas.filter(d => !snapDeltas.contains(d.name))
        // concurrently-ADDED data files count too (the CoW gate's rule —
        // the isolation level must not depend on the table's mor option):
        // an append into this DML's read region is a phantom, refuse
        // unless every added file is provably outside it
        val addedData = m.files.map(_._1).toSet --
          planned.map(_.files.map(_._1).toSet).getOrElse(Set.empty)
        if (newDeltas.nonEmpty || addedData.nonEmpty) {
          val rfs = readFilters()
          val cache = scala.collection.mutable.HashMap
            .empty[String, Option[GraftPartition.PTransform]]
          def outsideRegion(n: String): Boolean =
            GraftKvSink.fileProvablyOutside(m, n, rfs, cache)
          val disjoint = rfs.nonEmpty &&
            addedData.forall(outsideRegion) && newDeltas.forall { d =>
            d.inserts == 0L && {
              // driver-side read of the (tiny) concurrent delta file for
              // its target names — the only way to know what it touched
              val targets = scala.collection.mutable.Set.empty[String]
              GraftKvSink.foreachDelete(dir, d.name)((f, _) => targets += f)
              targets.forall(outsideRegion)
            }
          }
          if (!disjoint)
            refuse("another commit landed in between and its changes " +
              "cannot be proven outside this DML's read region (a plain " +
              "append or pure delete of provably-disjoint partitions merges)")
        }
      }
      // the delta's epoch orders it AFTER every state it references —
      // INCLUDING retained-history boundaries: a metadata DELETE publishes
      // removedAt/rewrittenUpTo with no live file at that epoch, and a
      // delta reusing it would make that boundary state ambiguous (the
      // same allocation rule the batch commit follows)
      val epoch = (m.files.map(f => GraftKvSink.epochOf(f._1)) ++
        m.deltas.map(d => GraftKvSink.epochOf(d.name)) ++
        m.removed.map(_.removedAt) ++
        Seq(m.rewrittenUpTo, m.compactedUpTo).filter(_ >= 0L))
        .maxOption.getOrElse(0L) + 1L
      val published = committed.map { c =>
        val fin = s"epoch-$epoch-${c.finalName}"
        Files.move(Paths.get(dir, c.tmpName), Paths.get(dir, fin),
          StandardCopyOption.REPLACE_EXISTING)
        GraftKvSink.DeltaFile(fin, c.inserts, c.deletes)
      }
      GraftKvSink.writeManifest(dir, m.schema, m.files, m.compactedUpTo,
        m.stats, m.blooms, m.deltas ++ published, m.removed, m.rewrittenUpTo,
        priorHint = Some(m))
    }
    // sweep stray attempts (task retries / speculation) — AFTER the
    // committed renames, or the sweep would eat this commit's own files;
    // writeId-scoped so a concurrent DML's in-flight temps survive
    Files.list(Paths.get(dir)).iterator().asScala
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("delta-part-") && n.endsWith(s".$writeId.tmp")
      }.foreach(Files.delete)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.collect { case m: GraftKvDeltaCommit => m }
      .foreach(m => Files.deleteIfExists(Paths.get(dir, m.tmpName)))
}

final case class GraftKvDeltaCommit(tmpName: String, finalName: String,
    inserts: Long, deletes: Long) extends WriterCommitMessage

/** Per-task delta writer: `D\t<file>\t<pos>` position-deletes and
  * `I\t<encoded row>` inserts, in action order. UPDATE is a delete of the
  * old position plus an insert of the new image — positions are immutable,
  * so there is no in-place form. The row-ID rows arrive in [[rowId]] order
  * (`_file`, `_pos`). */
final class GraftKvDeltaWriter(dir: String, schema: StructType,
    private val tmpName: String, private val finalName: String,
    byPid: Array[Int] = null)
  extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
  private val out = Files.newBufferedWriter(Paths.get(dir, tmpName),
    StandardCharsets.UTF_8)
  private var inserts = 0L
  private var deletes = 0L
  private val observed = new Array[String](schema.length)
  // reused per-record buffers (same r21 pattern as GraftKvWriter): the
  // old path built a fresh StringBuilder + String per action record
  private val sb = new StringBuilder(256)
  private var lineChars = new Array[Char](256)
  private def flushLine(): Unit = {
    val n = sb.length
    if (lineChars.length < n)
      lineChars = new Array[Char](math.max(n, lineChars.length * 2))
    sb.underlying.getChars(0, n, lineChars, 0)
    out.write(lineChars, 0, n)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    sb.setLength(0)
    sb.append("D\t").append(id.getUTF8String(0).toString).append('\t')
      .append(id.getLong(1)).append('\n')
    flushLine()
    deletes += 1L
  }

  override def insert(row: InternalRow): Unit = {
    sb.setLength(0)
    sb.append("I\t")
    GraftKvSink.encodeRow(schema, row, sb, observed, byPid)
    flushLine()
    inserts += 1L
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // ONE `U` record: pre-image position + post-image row. Reads treat it
    // as delete(pos) ∪ insert(row); CDC reads classify it as
    // update_preimage/update_postimage (Delta CDF's four-valued
    // _change_type) — which a split delete+insert pair cannot express.
    sb.setLength(0)
    sb.append("U\t").append(id.getUTF8String(0).toString).append('\t')
      .append(id.getLong(1)).append('\t')
    GraftKvSink.encodeRow(schema, row, sb, observed, byPid)
    flushLine()
    // counts keep delete+insert arithmetic: manifest COUNT math unchanged
    inserts += 1L
    deletes += 1L
  }

  override def write(row: InternalRow): Unit = insert(row)

  override def commit(): WriterCommitMessage = {
    out.close()
    GraftKvDeltaCommit(tmpName, finalName, inserts, deletes)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(Paths.get(dir, tmpName))
  }

  override def close(): Unit = ()
}

/** Scan builder with FILE-PRUNING pushdown: filters are accepted for
  * manifest-stats pruning but reported back as fully residual (min/max
  * ranges can only exclude whole files, never rows), so Spark re-applies
  * every predicate after the scan — pruning is a pure I/O win with zero
  * correctness surface, exactly parquet row-group skipping's contract. */
final class GraftKvScanBuilder(dir: String, asOf: Option[Long],
    maxEpochs: Option[Long] = None,
    onBuild: GraftKvScan => Unit = _ => (),
    onlyFiles: Option[Set[String]] = None,
    changeFeed: Boolean = false,
    startEpoch: Option[Long] = None,
    fromEpoch: Option[Long] = None)
  extends ScanBuilder
  with org.apache.spark.sql.connector.read.SupportsPushDownFilters
  with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
  with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  private var fs: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var projection: Option[StructType] = None
  private var pushedAggs: Seq[(String, StructField)] = Nil
  private var aggManifest: GraftKvSink.Manifest = _
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    fs = filters
    filters // all residual: stats exclude files, they never evaluate rows
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    Array.empty
  // column pruning: the reader parses ONLY the requested fields out of
  // each line (a two-column projection over a wide table converts two
  // values per row, not all of them)
  override def pruneColumns(requiredSchema: StructType): Unit =
    projection = Some(requiredSchema)
  // COUNT(*) answered from the manifest's per-file row counts, ungrouped
  // MIN/MAX answered from its per-file per-column stats ranges (HBase
  // region-metadata reads): zero data files opened. Only the unfiltered,
  // ungrouped forms are eligible (our filters are all residual, so Spark
  // never offers aggregates over a filtered scan anyway — the fs.isEmpty
  // check is defense in depth), and MIN/MAX additionally require EVERY
  // visible file to carry stats for the column — a stats-less file
  // (all-null, NaN-poisoned, or pre-stats manifest) makes the true
  // extremum unknowable from metadata.
  override def supportCompletePushDown(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = false
  override def pushAggregation(
      a: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (fs.nonEmpty || a.groupByExpressions.nonEmpty ||
      onlyFiles.isDefined || changeFeed || startEpoch.isDefined ||
      fromEpoch.isDefined) return false
    if (a.aggregateExpressions.isEmpty) return false
    val mfP = GraftKvSink.manifestPath(dir)
    if (!Files.exists(mfP)) return false
    val mf = GraftKvSink.readManifest(mfP)
    val visible = mf.visibleFilesAt(asOf)
    // merge-on-read deltas: COUNT stays answerable from metadata (each
    // position-delete masks exactly one live row, exactly once — the
    // row-level scan only ever emits live positions, and a position once
    // deleted never resurfaces to be deleted again — so count = base −
    // deletes + inserts); MIN/MAX are NOT (a delete may mask the extremum,
    // and inserts carry no stats) and decline to the data path.
    val vDeltas = mf.visibleDeltasAt(asOf)
    def nameOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    def statField(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = for {
      c <- nameOf(e)
      if vDeltas.isEmpty
      field <- mf.schema.fields.find(_.name.equalsIgnoreCase(c))
      if visible.forall { case (n, _) =>
        mf.stats.getOrElse(n, Map.empty).keys.exists(_.equalsIgnoreCase(c)) ||
          // a file with a zero non-null counter provably contributes
          // nothing to MIN/MAX (an all-null partition's file records no
          // range) — skip it instead of declining the whole pushdown
          mf.blooms.getOrElse(n, Map.empty)
            .find(_._1.equalsIgnoreCase(GraftKvSink.CntKey + c))
            .exists(_._2 == "0") }
    } yield field
    val specs = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count", StructField("count", LongType)))
      case m: Min => statField(m.column).map(f => ("min", f))
      case m: Max => statField(m.column).map(f => ("max", f))
      case _      => None
    }
    if (specs.forall(_.isDefined)) {
      pushedAggs = specs.flatten
      aggManifest = mf // the scan answers from the manifest it validated
      true
    } else false
  }
  override def build(): Scan =
    if (pushedAggs.nonEmpty)
      new GraftKvAggScan(dir, asOf, pushedAggs, aggManifest)
    else {
      val s = new GraftKvScan(dir, asOf, fs.toSeq, projection, maxEpochs,
        onlyFiles, changeFeed, startEpoch, fromEpoch)
      onBuild(s)
      s
    }
}

/** Manifest-only aggregate scan: one partition, one partial row holding the
  * visible files' row-count total and/or the merged min/max of their stats
  * ranges — the data files are never opened. An empty visible set yields
  * count 0 and NULL extrema, which Spark's final aggregate passes through
  * with standard semantics. */
final class GraftKvAggScan(dir: String, asOfEpoch: Option[Long],
    specs: Seq[(String, StructField)],
    manifest: GraftKvSink.Manifest)
  extends Scan with Batch {
  asOfEpoch.foreach(GraftKvSink.requireAnswerableEpoch(manifest, _))
  private val visible = manifest.visibleFilesAt(asOfEpoch)
  // visible merge-on-read deltas adjust COUNT only (min/max were already
  // declined at pushdown when any delta is visible)
  private val deltaAdj = manifest.visibleDeltasAt(asOfEpoch)
    .map(d => d.inserts - d.deletes).sum
  // driver-side evaluation against the (tiny) manifest; values ship to the
  // single partition as plain JVM types, typed by the schema json
  private def merged(kind: String, f: StructField): Any = {
    val ranges = visible.flatMap { case (n, _) =>
      manifest.stats.getOrElse(n, Map.empty)
        .find(_._1.equalsIgnoreCase(f.name)).map(_._2)
    }
    if (ranges.isEmpty) null
    else {
      def less(a: String, b: String): Boolean = f.dataType match {
        case IntegerType | LongType |
             TimestampType | TimestampNTZType | DateType => a.toLong < b.toLong
        case DoubleType               => a.toDouble < b.toDouble
        case FloatType                => a.toFloat < b.toFloat
        case _: DecimalType =>
          new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b)) < 0
        case _ => UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0
      }
      val s =
        if (kind == "min") ranges.map(_._1).reduce((a, b) => if (less(a, b)) a else b)
        else ranges.map(_._2).reduce((a, b) => if (less(a, b)) b else a)
      f.dataType match {
        case IntegerType   => s.toInt
        case LongType      => s.toLong
        case TimestampType | TimestampNTZType => s.toLong // internal micros
        case DateType      => s.toInt // internal epoch days
        case DoubleType    => s.toDouble
        case FloatType     => s.toFloat
        case BooleanType   => s.toBoolean
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal(
            new java.math.BigDecimal(s), d.precision, d.scale)
        case _             => s
      }
    }
  }
  private val values: Seq[Any] = specs.map {
    case ("count", _) => visible.map(_._2).sum + deltaAdj
    case (kind, f)    => merged(kind, f)
  }
  override def readSchema(): StructType = StructType(specs.zipWithIndex.map {
    case (("count", _), i) => StructField(s"count_star_$i", LongType, nullable = false)
    case ((kind, f), i)    => StructField(s"${kind}_${f.name}_$i", f.dataType)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_kv $dir PushedAggregation: [${specs.map {
      case ("count", _) => "count_star"
      case (kind, f)    => s"$kind(${f.name})"
    }.mkString(", ")}] (manifest row counts/stats)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftKvAggPartition(values))
  override def createReaderFactory(): PartitionReaderFactory = {
    val schemaJson = readSchema().json
    (p: InputPartition) => {
      val ap = p.asInstanceOf[GraftKvAggPartition]
      val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow =
          InternalRow.fromSeq(ap.values.zip(sch.fields.toSeq).map {
            case (null, _)                            => null
            case (v: String, f) if f.dataType == StringType =>
              UTF8String.fromString(v)
            case (v, _)                               => v
          })
        override def close(): Unit = ()
      }
    }
  }
}

final case class GraftKvAggPartition(values: Seq[Any])
  extends InputPartition

/** `explicitEpoch` (write option "epoch"): stamp this BATCH write's files
  * with a chosen changelog position — the bulk-load-into-a-changelog
  * analogue. Each stamped write publishes as one epoch the MicroBatchStream
  * delivers as one micro-batch, so a batch job can feed a live stream
  * executor-side (no driver round trip). Ignored by streaming writes,
  * whose epoch ids come from the engine. */
/** `replaceFiles`: GROUP-replace mode for row-level operations — at commit,
  * exactly the named files (the groups the row-level scan read) leave the
  * manifest and the new files join it, one atomic visibility switch; files
  * outside the group set are untouched. Evaluated AT COMMIT time because
  * the row-level scan is built during query planning, after the write
  * builder exists. */
final class GraftKvWriteBuilder(dir: String, schema: StructType,
    explicitEpoch: Option[Long] = None,
    replaceFiles: Option[() => Seq[String]] = None,
    snapshot: () => Option[GraftKvSink.Manifest] = null,
    stampEpochs: Boolean = false,
    queryId: String = "",
    sortCols: Seq[String] = Nil,
    sortBuckets: Int = 0,
    checks: Map[String, String] = Map.empty,
    // partition spec thunk (the checkConstraintsF pattern): resolved at
    // build() so pure table loads never parse the manifest for it
    partSpecF: () => Seq[String] = () => Nil,
    // maintenance writes (ZORDER) pre-shape their own distribution: keep
    // the per-tuple fanout split but add NO distribution requirement on
    // top (which would reshuffle the carefully built clustering away)
    fanoutOnly: Boolean = false,
    // a row-level operation's pushed READ filters — the conflict gate's
    // disjointness evidence (see GraftKvBatchWrite.checkConflicts)
    readFilters: () => Seq[org.apache.spark.sql.sources.Filter] = () => Nil)
  extends WriteBuilder with SupportsTruncate
  with org.apache.spark.sql.connector.write.SupportsOverwrite
  with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite {
  private var replace = false
  // INSERT OVERWRITE surfaces (the Delta replaceWhere / Hive dynamic-
  // partition-overwrite shapes): a filter list replaces exactly the files
  // it classifies (commit-time, partition-aligned proofs); dynamic mode
  // replaces exactly the partitions the incoming data lands in
  private var overwriteBy: Option[Seq[org.apache.spark.sql.sources.Filter]] = None
  private var dynamicOv = false
  override def truncate(): WriteBuilder = { replace = true; this }
  override def overwrite(
      filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
    if (filters.isEmpty ||
        filters.forall(_ == org.apache.spark.sql.sources.AlwaysTrue))
      replace = true // unconditional overwrite IS the truncating write
    else overwriteBy = Some(filters.toSeq)
    this
  }
  override def overwriteDynamicPartitions(): WriteBuilder = {
    dynamicOv = true; this
  }
  override def build(): Write = {
    val pspec = partSpecF()
    if (pspec.nonEmpty) // early, clear error for a schema omitting sources
      GraftPartition.parse(pspec, schema)
    if ((sortCols.isEmpty && pspec.isEmpty) || fanoutOnly) new Write {
      override def toBatch: BatchWrite =
        new GraftKvBatchWrite(dir, schema, replace, explicitEpoch, replaceFiles,
          snapshot, stampEpochs, checks, pspec,
          overwriteFilters = overwriteBy, dynamicOverwrite = dynamicOv,
          readFilters = readFilters)
      override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new GraftKvStreamingWrite(dir, schema, queryId, checks, pspec)
    }
    // `sortBy` tables: ask Spark to range-partition + sort the write's own
    // query (RequiresDistributionAndOrdering) — the declarative form of the
    // bulk-load "sorted HFile" layout: each task then writes one file whose
    // min/max stats are disjoint from every other's, so the scan-side stats
    // pruning turns point/range reads into one-file opens. Spark plans the
    // exchange inside the write (AQE-sized unless sortBuckets pins it); the
    // connector never touches rows.
    //
    // PARTITIONED tables instead cluster the write on the partition SOURCE
    // columns (identity transforms — no function catalog needed, and a
    // finer clustering than any derived transform), so each task sees few
    // tuples and the fanout writer opens few files: at 1000 executors the
    // file count tracks the partition count, not tasks x tuples.
    else new Write
        with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
      import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
      private val orders: Array[SortOrder] = sortCols.map(c =>
        Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
      override def requiredDistribution()
          : org.apache.spark.sql.connector.distributions.Distribution =
        if (pspec.nonEmpty)
          org.apache.spark.sql.connector.distributions.Distributions.clustered(
            GraftPartition.parse(pspec, schema).map(_.source).distinct
              .map(c => Expressions.identity(c)
                : org.apache.spark.sql.connector.expressions.Expression)
              .toArray)
        else
          org.apache.spark.sql.connector.distributions.Distributions.ordered(orders)
      override def requiredOrdering(): Array[SortOrder] = orders
      override def requiredNumPartitions(): Int = sortBuckets
      override def toBatch: BatchWrite =
        new GraftKvBatchWrite(dir, schema, replace, explicitEpoch, replaceFiles,
          snapshot, stampEpochs, checks, pspec,
          overwriteFilters = overwriteBy, dynamicOverwrite = dynamicOv,
          readFilters = readFilters)
      override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new GraftKvStreamingWrite(dir, schema, queryId, checks, pspec)
    }
  }
}

/** Micro-batch streaming sink: same per-task temp-file + manifest-publish
  * protocol as the batch write, one commit per EPOCH, made IDEMPOTENT by
  * carrying the epoch id in every file name — a recovered query re-runs its
  * last epoch, and a re-commit of an epoch the manifest already lists just
  * discards the duplicate attempt files. That name-keyed dedup is the
  * standard exactly-once recipe for file-manifest streaming sinks. */
final class GraftKvStreamingWrite(dir: String, schema: StructType,
    queryId: String = "",
    checks: Map[String, String] = Map.empty,
    partSpec: Seq[String] = Nil)
  extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    Files.createDirectories(Paths.get(dir))
    val schemaJson = schema.json
    val d = dir
    val spec = partSpec
    // CHECK constraints on a STREAMING write: no V2WriteCommand exists at
    // analysis time to wrap, so the guard is resolved + bound BY ORDINAL
    // here on the driver and evaluated per row in each task — a violation
    // fails the micro-batch before its epoch commits
    val guard: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
      graft.plans.CheckConstraints.writerGuard(
        org.apache.spark.sql.SparkSession.active, schema, checks)
    val layoutS = {
      val mp = GraftKvSink.manifestPath(dir)
      GraftKvSink.writeLayout(schema,
        if (Files.exists(mp)) Some(GraftKvSink.readManifest(mp)) else None)
    }
    new org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
      override def createWriter(partitionId: Int, taskId: Long,
          epochId: Long): DataWriter[InternalRow] = {
        val sch = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val byPid = layoutS
        val inner: DataWriter[InternalRow] =
          if (spec.nonEmpty)
            new GraftKvPartitionedWriter(d, sch,
              GraftPartition.parse(spec, sch),
              k => (f"epoch-$epochId-part-$partitionId%05d-$taskId-s$k.tmp",
                f"epoch-$epochId-part-$partitionId%05d-$taskId-s$k.kv"), byPid)
          else new GraftKvWriter(d, sch,
            f"epoch-$epochId-part-$partitionId%05d-$taskId.tmp",
            f"epoch-$epochId-part-$partitionId%05d-$taskId.kv", byPid)
        guard match {
          case None => inner
          case Some(g) => new DataWriter[InternalRow] {
            private val p =
              org.apache.spark.sql.catalyst.expressions.Predicate.create(g)
            p.initialize(partitionId)
            override def write(r: InternalRow): Unit = {
              p.eval(r); inner.write(r) // eval raises on violation
            }
            override def commit(): WriterCommitMessage = inner.commit()
            override def abort(): Unit = inner.abort()
            override def close(): Unit = inner.close()
          }
        }
      }
    }
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = GraftKvSink.withCommitLock(dir) {
    // same empty-file suppression as the batch path
    val committed0 = GraftKvCommit.flatten(messages)
      .filter { m =>
        if (m.rows == 0L) Files.deleteIfExists(Paths.get(dir, m.tmpName))
        m.rows > 0L
      }
    val mf = GraftKvSink.manifestPath(dir)
    val (prior, priorUpTo, priorStats, priorBlooms, priorDeltas,
        priorRemoved, priorRw, priorTxn, priorBase) =
      if (Files.exists(mf)) {
        val m = GraftKvSink.readManifest(mf)
        (m.files, m.compactedUpTo, m.stats, m.blooms, m.deltas,
          m.removed, m.rewrittenUpTo, m.txn, m.streamBase)
      } else (Seq.empty[(String, Long)], -1L,
        Map.empty[String, Map[String, (String, String)]],
        Map.empty[String, Map[String, String]],
        Seq.empty[GraftKvSink.DeltaFile],
        Seq.empty[GraftKvSink.RemovedFile], -1L,
        Map.empty[Long, String], Map.empty[String, Long])
    // EPOCH BASE: engine epoch ids are checkpoint-relative; published
    // epochs append AFTER existing history (batch stamps, a branch
    // fork's cloned files), else the first commits would collide with
    // existing names and vanish as "replay duplicates". The base is
    // frozen per query id at first commit (recovery replays must map to
    // the same names for the dedup below to hold). An ownerless writer
    // (no query id — direct harness use) keeps the legacy base-0
    // behavior untouched.
    def maxPublished: Long = (prior.map(f => GraftKvSink.epochOf(f._1)) ++
      priorDeltas.map(d => GraftKvSink.epochOf(d.name)) ++
      priorRemoved.map(r => GraftKvSink.epochOf(r.name)) ++
      // a metadata-DELETE's commit epoch exists only as removedAt (no
      // file carries its number) — a rebase landing ON it would share
      // the slot and mix changefeed/AS OF attribution
      priorRemoved.map(_.removedAt) ++
      Seq(priorUpTo, priorRw)).maxOption.getOrElse(-1L)
    var base: Long =
      if (queryId.isEmpty) 0L
      else priorBase.getOrElse(queryId,
        // a manifest written BEFORE bases existed can still own this
        // epoch at the identity mapping (txn recorded, base not): a
        // recovery replay must keep base 0 there, or it would re-publish
        // already-committed rows under a fresh name — duplicates
        if (priorTxn.get(epochId).contains(queryId)) 0L
        else math.max(0L, maxPublished + 1L - epochId))
    // a slot is occupied by ANY commit kind at that epoch: a live base
    // file, a MOR delta (.kvd), a retained/removed file stamped with the
    // epoch, or a metadata-DELETE whose only trace is removedAt — missing
    // any of these would let the stream publish base files under a
    // foreign commit's epoch number (two commits sharing one epoch mixes
    // changefeed attribution and VERSION AS OF boundaries)
    def occupied(e: Long): Boolean = {
      val pfx = s"epoch-$e-"
      prior.exists(f => GraftKvSink.baseName(f._1).startsWith(pfx)) ||
      priorDeltas.exists(d => GraftKvSink.baseName(d.name).startsWith(pfx)) ||
      priorRemoved.exists(r =>
        GraftKvSink.baseName(r.name).startsWith(pfx) || r.removedAt == e)
    }
    // a FOREIGN occupant at our next slot (a batch write stamped an
    // epoch inside the stream's range, or another stream shares the
    // directory): REBASE forward rather than losing the batch or dying.
    // Sound under recovery: the engine only replays epochs the
    // checkpoint has not committed, and every replayed epoch maps
    // through the LATEST recorded base — the same name it published
    // under, so the dedup below still catches true duplicates.
    if (queryId.nonEmpty && occupied(base + epochId) &&
        !priorTxn.get(base + epochId).contains(queryId)) {
      base = math.max(0L, maxPublished + 1L - epochId)
    }
    val published = base + epochId
    val committed =
      if (base == 0L) committed0
      else committed0.map(m => m.copy(finalName = m.finalName.replaceFirst(
        s"^epoch-$epochId-", s"epoch-$published-")))
    if (occupied(published)) {
      // already published under OUR mapping (or an ownerless writer's
      // epoch collision): a recovery replay — idempotent, drop the
      // duplicate attempt files
      committed.foreach(m => Files.deleteIfExists(Paths.get(dir, m.tmpName)))
    } else if (published <= math.max(priorUpTo, priorRw)) {
      // an epoch inside vacuumed/rewritten history whose files are NOT
      // listed is a FRESH-checkpoint stream writing to a compacted or
      // DML-rewritten table, not a replay (recovery only re-runs epochs
      // the checkpoint already committed, and the boundary epoch matches
      // the compacted file's prefix above). Silently deleting these files
      // would be data loss — fail loudly, mirroring the read fence; a
      // write below the rewrite epoch would additionally break asOfEpoch
      // monotonicity (a "pre-DML" state gaining post-DML rows).
      committed.foreach(m => Files.deleteIfExists(Paths.get(dir, m.tmpName)))
      throw new IllegalStateException(
        s"graft_kv: cannot commit epoch $published at or below the " +
          s"compaction/rewrite boundary ${math.max(priorUpTo, priorRw)} — " +
          "a stream with a fresh checkpoint must not write epochs already " +
          "fenced; resume the original checkpoint or write to a new directory")
    } else {
      committed.foreach { m =>
        Files.move(Paths.get(dir, m.tmpName), Paths.get(dir, m.finalName),
          StandardCopyOption.REPLACE_EXISTING)
      }
      // sweep only THIS epoch's stray attempts
      Files.list(Paths.get(dir)).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith(s"epoch-$epochId-") && n.endsWith(".tmp")
        }.foreach(Files.delete)
      GraftKvSink.writeManifest(dir, GraftKvSink.publishSchema(dir, schema),
        prior ++ committed.map(m => (m.finalName, m.rows)), priorUpTo,
        priorStats ++ committed.collect {
          case m if m.stats.nonEmpty => m.finalName -> m.stats
        },
        priorBlooms ++ committed.collect {
          case m if m.blooms.nonEmpty => m.finalName -> m.blooms
        },
        priorDeltas, priorRemoved, priorRw,
        // record which streaming query owns this epoch (the Delta
        // SetTransaction analogue) and the query's frozen epoch base —
        // a replay by the same query dedups above; the base makes the
        // replay map to the same published name
        txn = if (queryId.nonEmpty && committed.nonEmpty)
          priorTxn + (published -> queryId) else null,
        streamBase = if (queryId.nonEmpty)
          priorBase + (queryId -> base) else null,
        // a streaming-FIRST write to a fresh directory bootstraps the
        // manifest: record the declared spec exactly like the batch path,
        // or later option-less writers would silently stop splitting
        partitionSpec = if (partSpec.nonEmpty) partSpec else null)
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftKvCommit.flatten(messages)
      .foreach(m => Files.deleteIfExists(Paths.get(dir, m.tmpName)))
}

final case class GraftKvCommit(tmpName: String, finalName: String, rows: Long,
    stats: Map[String, (String, String)] = Map.empty,
    blooms: Map[String, String] = Map.empty)
  extends WriterCommitMessage

/** A partition-routing task's commit: one [[GraftKvCommit]] per partition
  * tuple the task saw. Commit sites flatten these beside plain commits. */
final case class GraftKvMultiCommit(parts: Seq[GraftKvCommit])
  extends WriterCommitMessage

object GraftKvCommit {
  /** The one flattening rule every commit site shares. */
  private[sources] def flatten(messages: Array[WriterCommitMessage]): Seq[GraftKvCommit] =
    messages.toSeq.flatMap {
      case m: GraftKvCommit      => Seq(m)
      case m: GraftKvMultiCommit => m.parts
      case _                     => Nil
    }
}

/** Partition-routing writer (the Iceberg fanout-writer shape): each row's
  * partition tuple — evaluated from the manifest's declared transforms —
  * selects (or opens) that tuple's own data file, so every committed file
  * holds exactly one tuple and the manifest records it as `part:` stats
  * entries, the scan-side pruner's exact feed. The write's own query is
  * clustered on the partition sources (RequiresDistributionAndOrdering),
  * so a task normally sees ONE tuple and the fanout map stays tiny; the
  * cap below is the runaway guard for hint-defeating shapes, not a sizing
  * parameter. */
final class GraftKvPartitionedWriter(dir: String, schema: StructType,
    spec: Seq[GraftPartition.PTransform],
    nameFor: Int => (String, String),
    byPid: Array[Int] = null)
  extends DataWriter[InternalRow] {
  private val srcIdx: Array[Int] = spec.map { t =>
    val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(t.source))
    require(i >= 0,
      s"graft_kv: this write's schema omits partition column '${t.source}' " +
        "— partitioned tables take full-width writes")
    i
  }.toArray
  private val open =
    new java.util.LinkedHashMap[String, (GraftKvWriter, Seq[String])]()
  override def write(row: InternalRow): Unit = {
    val tuple: Seq[String] = spec.indices.map { k =>
      val i = srcIdx(k)
      spec(k).apply(GraftKvSink.encodeValue(schema(i).dataType, row, i))
    }
    val key = tuple.mkString("\u0000")
    var w = open.get(key)
    if (w == null) {
      require(open.size < 1000,
        s"graft_kv: task exceeded 1000 open partition files at $dir — " +
          "cluster the write on the partition sources")
      val (tmp, fin) = nameFor(open.size)
      w = (new GraftKvWriter(dir, schema, tmp, fin, byPid), tuple)
      open.put(key, w)
    }
    w._1.write(row)
  }
  override def commit(): WriterCommitMessage = {
    import scala.jdk.CollectionConverters._
    GraftKvMultiCommit(open.values.asScala.toSeq.map { case (w, tuple) =>
      val c = w.commit().asInstanceOf[GraftKvCommit]
      c.copy(stats = c.stats ++ spec.zip(tuple).map { case (t, v) =>
        t.statsKey -> (v, v) })
    })
  }
  override def abort(): Unit = {
    import scala.jdk.CollectionConverters._
    open.values.asScala.foreach(_._1.abort())
  }
  override def close(): Unit = ()
}

final class GraftKvBatchWrite(dir: String, schema: StructType, replace: Boolean,
    explicitEpoch: Option[Long] = None,
    replaceFiles: Option[() => Seq[String]] = None,
    // row-level operations pass the SCAN's manifest: the conflict check
    // must compare against the state the replaced rows were derived from,
    // not a fresher factory-time read (see GraftKvScan.plannedManifest)
    snapshot: () => Option[GraftKvSink.Manifest] = null,
    // `epochs 'true'` tables: stamp every commit (see GraftKvTable)
    stampEpochs: Boolean = false,
    // CHECK constraints enforced AT THE WRITER (per row, pre-commit) in
    // addition to any plan-spliced guard: a batch write from a session
    // WITHOUT GraftExtensions never runs the injected rules, so the table's
    // persisted invariant must hold here — Delta enforces constraints in
    // the write transaction, not the planner, for exactly this reason.
    // Extension sessions keep their earlier (plan-time) error site; rows
    // they admit re-evaluate true here at negligible cost.
    checks: Map[String, String] = Map.empty,
    // partition spec (canonical transform strings): tasks route rows to
    // per-tuple files; the first publish to a fresh directory records the
    // spec in the manifest it bootstraps
    partSpec: Seq[String] = Nil,
    // INSERT OVERWRITE w/ predicate: replace exactly the files the
    // predicate classifies (all-match drop / none-match keep, else
    // refuse); incoming rows are guard-checked against the predicate
    overwriteFilters: Option[Seq[org.apache.spark.sql.sources.Filter]] = None,
    // dynamic partition overwrite: replace exactly the partitions the
    // committed files' tuples name
    dynamicOverwrite: Boolean = false,
    // the row-level operation's pushed READ filters (empty otherwise):
    // the conflict gate's evidence that a concurrently-added file is
    // provably outside this operation's read region
    readFilters: () => Seq[org.apache.spark.sql.sources.Filter] = () => Nil)
  extends BatchWrite {

  // This write's identity: scopes task temp-file names (and the commit-time
  // stray-attempt sweep) to THIS job, so a concurrent writer's in-flight
  // `.tmp` files are never swept by someone else's commit.
  private val writeId = java.util.UUID.randomUUID().toString.take(8)

  // Optimistic-concurrency read snapshot: the manifest as of PLAN time
  // (factory creation, driver-side, before any task runs). At commit, under
  // the table lock, the snapshot version is compared with the current one —
  // a mismatch means a concurrent commit landed while this job was writing,
  // and the conflict matrix below decides merge vs refuse.
  @volatile private var planned: Option[GraftKvSink.Manifest] = None
  @volatile private var plannedCaptured = false

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(Paths.get(dir))
    val mfP0 = GraftKvSink.manifestPath(dir)
    planned =
      Option(snapshot).flatMap(_.apply()).orElse(
        if (Files.exists(mfP0)) Some(GraftKvSink.readManifest(mfP0)) else None)
    plannedCaptured = true
    // validate the explicit stamp BEFORE any task writes: an epoch the
    // manifest already lists is not replayable by a batch job (batch
    // writes carry no attempt identity), and one inside compacted history
    // is fenced like any other write into vacuumed epochs
    // (re-validated at commit under the lock — a concurrent writer may
    // have published the same epoch since)
    explicitEpoch.foreach { e =>
      require(e >= 0L, s"graft_kv: epoch option must be >= 0, got $e")
      planned.foreach { m => if (!replace) validateExplicitEpoch(e, m) }
    }
    // same driver-bound per-row guard recipe as the streaming writer: the
    // Expression is resolved + bound by ordinal here, shipped to tasks,
    // and evaluated before each row lands — a violation fails the job
    // before the manifest publishes (no partial state becomes visible)
    // a replaceWhere write admits ONLY rows inside the replaced region —
    // anything else would silently survive outside the predicate while
    // claiming to have replaced it (the Delta replaceWhere contract);
    // enforced per row through the same bound-Predicate recipe as CHECKs
    val owChecks = overwriteFilters.map(fs => Map("__replace_where__" ->
      fs.map(f => s"(${GraftPartition.filterSql(f)})").mkString(" AND ")))
      .getOrElse(Map.empty)
    val guard: Option[org.apache.spark.sql.catalyst.expressions.Expression] =
      graft.plans.CheckConstraints.writerGuard(
        org.apache.spark.sql.SparkSession.active, schema, checks ++ owChecks)
    new GraftKvWriterFactory(dir, schema.json,
      explicitEpoch.map(e => s"epoch-$e-").getOrElse(""), writeId, guard,
      partSpec, GraftKvSink.writeLayout(schema, planned))
  }

  private def validateExplicitEpoch(e: Long, m: GraftKvSink.Manifest): Unit = {
    require(!m.files.exists(f => GraftKvSink.baseName(f._1).startsWith(s"epoch-$e-")),
      s"graft_kv: epoch $e is already published at $dir")
    require(e > m.compactedUpTo,
      s"graft_kv: epoch $e is inside compacted history " +
        s"(epochs <= ${m.compactedUpTo} were merged)")
    require(e > m.rewrittenUpTo,
      s"graft_kv: epoch $e is at or below the row-level rewrite " +
        s"boundary ${m.rewrittenUpTo} — a pre-DML state must not gain rows")
  }

  /** Delta/Iceberg-style conflict resolution at PARTITION/FILE
    * granularity, evaluated under the commit lock against the CURRENT
    * manifest when the version advanced past this write's plan-time
    * snapshot:
    *
    *   - append ∥ append: MERGE (this commit folds its files into the
    *     newer state it re-read under the lock); refuses only when files
    *     it saw at plan time disappeared (truncate/rewrite/compaction).
    *   - row-level rewrite ∥ provably-disjoint commit: MERGE — every file
    *     this rewrite replaces is still present, no delta/boundary moved,
    *     and every concurrently-ADDED file is provably outside this
    *     operation's read region (its recorded partition tuple, min/max
    *     stats, or bloom contradicts a pushed read filter — Delta's
    *     partition-level ConcurrentAppend rule). Two jobs maintaining
    *     DIFFERENT day partitions never conflict — the economics of
    *     concurrent maintenance on a 100-TB table.
    *   - row-level rewrite ∥ overlapping commit: REFUSE (the concurrent
    *     rows were never scanned — phantoms).
    *   - replaceWhere overwrite: same disjointness rule, region = the
    *     overwrite predicate; concurrently-REMOVED files must also prove
    *     outside the region (two disjoint replaceWhere jobs merge).
    *   - dynamic partition overwrite: a concurrently-added file whose
    *     tuple is among the partitions THIS overwrite replaces would be
    *     silently swallowed — refuse; disjoint tuples merge.
    *   - truncating overwrite planned stale: REFUSE always.
    */
  private def checkConflicts(cur: Option[GraftKvSink.Manifest],
      committedTuples: => Set[Seq[String]]): Unit = {
    if (!plannedCaptured) return // no tasks planned (empty write): lock alone suffices
    val snapVer = planned.map(_.version).getOrElse(-1L)
    val curVer = cur.map(_.version).getOrElse(-1L)
    if (curVer == snapVer) return // no concurrent commit
    def refuse(what: String, why: String): Nothing =
      throw new IllegalStateException(
        s"graft_kv: concurrent commit detected at $dir — this $what was " +
          s"planned against manifest version $snapVer but the table is " +
          s"now at version $curVer and $why; rerun against the current state")
    if (replace && replaceFiles.isEmpty)
      refuse("truncating overwrite", "a truncate replaces the whole state")
    val curFiles = cur.map(_.files.map(_._1).toSet).getOrElse(Set.empty)
    val curDeltas = cur.map(_.deltas.map(_.name).toSet).getOrElse(Set.empty)
    val pFiles = planned.map(_.files.map(_._1).toSet).getOrElse(Set.empty)
    val pDeltas = planned.map(_.deltas.map(_.name).toSet).getOrElse(Set.empty)
    // the refined arms compare compactedUpTo only: a concurrent metadata
    // DELETE or disjoint CoW advances rewrittenUpTo as a fencing boundary,
    // but everything that boundary guards for whole-file groups is already
    // caught by the file-set checks below (replaced files intact, added/
    // removed files provably outside the region); compaction renames
    // files, so it is caught twice over
    val compactedSame = (planned, cur) match {
      case (Some(p), Some(c)) => p.compactedUpTo == c.compactedUpTo
      case _ => planned.isEmpty
    }
    val added = curFiles -- pFiles
    val removed = pFiles -- curFiles
    // every named file PROVABLY holds no row satisfying the conjunction
    // `fs` (some conjunct contradicted by its tuple, stats or bloom) —
    // judged against the manifest `m` that records those files
    def provablyOutside(m: Option[GraftKvSink.Manifest], names: Set[String],
        fs: Seq[org.apache.spark.sql.sources.Filter]): Boolean =
      fs.nonEmpty && (names.isEmpty || m.exists { mm =>
        val cache = scala.collection.mutable.HashMap
          .empty[String, Option[GraftPartition.PTransform]]
        names.forall(GraftKvSink.fileProvablyOutside(mm, _, fs, cache))
      })
    if (replaceFiles.isDefined) {
      val repl = replaceFiles.get().toSet
      val rfs = readFilters()
      val ok = compactedSame &&
        curDeltas == pDeltas && // a concurrent MOR overlay may mask our rows
        repl.subsetOf(curFiles) && // nothing this rewrite replaces was touched
        (added.isEmpty || provablyOutside(cur, added, rfs)) &&
        // rows this operation READ must not have been concurrently
        // deleted either (Delta's ConcurrentDeleteRead rule) — files
        // removed outside the read region are fine
        (removed.isEmpty || provablyOutside(planned, removed, rfs))
      if (!ok) refuse("row-level rewrite",
        "the concurrent commit touched files or regions this operation " +
          "read or replaces (a provably-disjoint commit merges)")
      return
    }
    if (overwriteFilters.isDefined) {
      val fs = overwriteFilters.get
      val ok = compactedSame && curDeltas == pDeltas &&
        (added.isEmpty || provablyOutside(cur, added, fs)) &&
        (removed.isEmpty || provablyOutside(planned, removed, fs))
      if (!ok) refuse("partition overwrite",
        "the concurrent commit touched the replaced region (a commit " +
          "provably outside the overwrite predicate merges)")
      return
    }
    if (dynamicOverwrite) {
      val keys = cur.map(_.partitionSpec).getOrElse(Nil)
        .map(GraftPartition.PartKey + _)
      val mine = committedTuples
      val ok = compactedSame && curDeltas == pDeltas && removed.isEmpty &&
        keys.nonEmpty && cur.exists { c =>
          added.forall { n =>
            val st = c.stats.getOrElse(n, Map.empty)
            val tup = keys.map(k => st.get(k).map(_._1))
            tup.forall(_.isDefined) && !mine.contains(tup.flatten)
          }
        }
      if (!ok) refuse("dynamic partition overwrite",
        "the concurrent commit landed in a partition this overwrite " +
          "replaces (commits into other partitions merge)")
      return
    }
    // append∥append merges; anything that removed plan-time files refuses
    val ok = planned.forall { p =>
      p.files.map(_._1).forall(curFiles.contains) &&
        p.deltas.map(_.name).forall(curDeltas.contains) &&
        cur.exists(c => c.compactedUpTo == p.compactedUpTo &&
          c.rewrittenUpTo == p.rewrittenUpTo)
    }
    if (!ok) refuse("append",
      "the concurrent commit removed files this append planned against " +
        "(truncate/rewrite/compaction), so the states cannot merge")
    // an explicit epoch stamp must also be unclaimed in the CURRENT state
    // (two concurrent writers racing the same epoch: first wins, second
    // refuses here instead of silently double-publishing the epoch)
    explicitEpoch.foreach(e => cur.foreach(validateExplicitEpoch(e, _)))
  }

  /** Driver-side finalize: only files named by successful task attempts
    * become visible; stray temp files from failed/speculative attempts are
    * swept; the manifest publish is the single visibility switch. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = GraftKvSink.withCommitLock(dir) {
    // conflict gate FIRST (under the lock): refuse before moving any task
    // file if a concurrent commit made this write unmergeable
    // ONE manifest parse per commit (the per-file stats/bloom maps make
    // the parse the dominant driver-side cost on a many-file table) —
    // every consumer below reads this snapshot; the commit lock makes
    // that sound
    val mfCur = GraftKvSink.manifestPath(dir)
    val curM: Option[GraftKvSink.Manifest] =
      if (Files.exists(mfCur)) Some(GraftKvSink.readManifest(mfCur)) else None
    // empty task files are never published (an empty partition's writer
    // still opened one) — a 0-row file would carry no stats/blooms and
    // survive every pruning pass for nothing. Flattening before the gate
    // publishes nothing (temp files stay invisible); the gate's dynamic-
    // overwrite arm needs the committed tuples to judge disjointness.
    val committed0 = GraftKvCommit.flatten(messages)
      .filter { m =>
        if (m.rows == 0L) Files.deleteIfExists(Paths.get(dir, m.tmpName))
        m.rows > 0L
      }
    checkConflicts(curM, {
      val keys = curM.map(_.partitionSpec).getOrElse(Nil)
        .map(GraftPartition.PartKey + _)
      committed0.flatMap(c => {
        val tup = keys.map(k => c.stats.get(k).map(_._1))
        if (tup.nonEmpty && tup.forall(_.isDefined)) Some(tup.flatten)
        else None
      }).toSet
    })
    // If the table already carries epoch history (a streaming writer), a
    // batch APPEND must join that history: epoch-less files read as epoch
    // 0 in the micro-batch stream, so a reader checkpointed past 0 would
    // silently never see them. Stamp the new files with the next epoch —
    // they surface to live readers and participate in asOfEpoch reads.
    val nextEpoch =
      if (explicitEpoch.isDefined) None
      else if (replace || curM.isEmpty)
        // `epochs` tables stamp from the very first commit (and a
        // truncate restarts the numbering at 0 with the history)
        (if (stampEpochs) Some(0L) else None)
      else {
        val m0 = curM.get
        // delta epochs count too: an append stamped at-or-below a delta's
        // epoch would make asOfEpoch reads non-monotonic. RETAINED-history
        // boundaries count just as much: a metadata DELETE publishes its
        // removals at removedAt = e (and fences rewrittenUpTo = e) without
        // any live file carrying e — reusing e for the next commit would
        // make boundary-state e ambiguous (visibleFilesAt(e) silently
        // flips from "before this commit" to "after").
        val names = m0.files.map(_._1) ++ m0.deltas.map(_.name)
        val boundaries = m0.removed.map(_.removedAt) ++
          Seq(m0.rewrittenUpTo, m0.compactedUpTo).filter(_ >= 0L)
        if (names.exists(n => GraftKvSink.baseName(n).startsWith("epoch-")) ||
          boundaries.nonEmpty)
          Some((names.map(GraftKvSink.epochOf) ++ boundaries).max + 1L)
        else if (stampEpochs)
          // epoch-less files read as epoch 0, so the first stamped append
          // to such a history orders strictly after them
          Some(if (names.nonEmpty) 1L else 0L)
        else None
      }
    val committed = committed0.map { m =>
      nextEpoch match {
        case Some(e) => m.copy(finalName = s"epoch-$e-${m.finalName}")
        case None    => m
      }
    }
    committed.foreach { m =>
      Files.move(Paths.get(dir, m.tmpName), Paths.get(dir, m.finalName),
        StandardCopyOption.REPLACE_EXISTING)
    }
    // sweep uncommitted attempts (task retries / speculation) — ONLY this
    // write's (the writeId scope): a concurrent job's in-flight task files
    // must survive someone else's commit
    Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(s".$writeId.tmp"))
      .foreach(Files.delete)
    val mf = GraftKvSink.manifestPath(dir)
    // row-level GROUP replace: the scanned files leave the manifest, the
    // new files join it; untouched files keep their entries verbatim.
    // INSERT OVERWRITE computes its own replace set HERE, at commit under
    // the lock: a predicate overwrite classifies every current file by
    // its recorded partition tuple (wholly-replaced / wholly-kept — an
    // unclassifiable file refuses, the Hive partition-alignment rule);
    // dynamic mode replaces exactly the partitions the committed files'
    // tuples name. Both are metadata decisions — no data file is read.
    val replaced: Set[String] = replaceFiles.map(_().toSet).getOrElse {
      if ((overwriteFilters.isEmpty && !dynamicOverwrite) || curM.isEmpty)
        Set.empty
      else {
        val m = curM.get
        require(m.deltas.isEmpty,
          s"graft_kv: INSERT OVERWRITE at $dir with merge-on-read delta " +
            "files present — OPTIMIZE (fold the deltas) first")
        val tcache = scala.collection.mutable.HashMap
          .empty[String, Option[GraftPartition.PTransform]]
        def fileParts(n: String): Map[String, String] =
          GraftPartition.filePartsOf(m.stats.getOrElse(n, Map.empty))
        def fileSpec(parts: Map[String, String]): Seq[GraftPartition.PTransform] =
          GraftPartition.fileSpecOf(parts, m.schema, tcache)
        overwriteFilters match {
          case Some(fs) =>
            m.files.map(_._1).filter { n =>
              val parts = fileParts(n)
              val spec = fileSpec(parts)
              val all = fs.forall(GraftPartition.allMatch(spec, parts, _))
              val none = fs.exists(f =>
                !GraftPartition.mayMatch(spec, parts, f) ||
                  !GraftKvSink.mayMatch(m.schema,
                    m.stats.getOrElse(n, Map.empty), f))
              if (all) true
              else if (none) false
              else throw new IllegalArgumentException(
                s"graft_kv: INSERT OVERWRITE predicate does not align " +
                  s"with partition boundaries at $dir — file '$n' can be " +
                  "neither wholly replaced nor wholly kept; partition the " +
                  "table on the predicate columns, or use row-level DML")
            }.toSet
          case None => // dynamic partition overwrite
            require(m.partitionSpec.nonEmpty,
              s"graft_kv: dynamic partition overwrite at $dir needs a " +
                "PARTITIONED BY table (partitions are what it replaces)")
            val keys = m.partitionSpec.map(GraftPartition.PartKey + _)
            val newTuples: Set[Seq[String]] = committed.map { c =>
              keys.map(k => c.stats.get(k).map(_._1).getOrElse(
                throw new IllegalStateException(
                  s"graft_kv: incoming file '${c.finalName}' lacks a " +
                    "partition tuple — dynamic overwrite requires the " +
                    "fanout writer")))
            }.toSet
            m.files.map(_._1).filter { n =>
              val st = m.stats.getOrElse(n, Map.empty)
              val vs = keys.map(k => st.get(k).map(_._1))
              if (vs.contains(None)) throw new IllegalArgumentException(
                s"graft_kv: file '$n' predates the current partition " +
                  s"spec at $dir — its partitions are unknown to dynamic " +
                  "overwrite; OPTIMIZE (re-cluster) first or use an " +
                  "explicit predicate")
              else newTuples.contains(vs.flatten)
            }.toSet
        }
      }
    }
    // on an EPOCH-STAMPED table, a row-level replace keeps the superseded
    // files as RETAINED HISTORY (see Manifest.RemovedFile) — boundary
    // states before the rewrite reconstruct exactly until vacuum; an
    // epoch-less batch table has no boundaries to reconstruct, so its
    // replaced files are reclaimed immediately as before
    val keepHistory =
      replaced.exists(n => GraftKvSink.baseName(n).startsWith("epoch-")) &&
        nextEpoch.isDefined
    val (prior, priorUpTo, priorStats, priorBlooms, priorDeltas,
        priorRemoved, priorRw) =
      if ((replaceFiles.isDefined || overwriteFilters.isDefined ||
          dynamicOverwrite) && curM.isDefined) {
        val m = curM.get
        val newRemoved =
          if (keepHistory)
            m.removed ++ m.files.filter(f => replaced.contains(f._1))
              .map(f => GraftKvSink.RemovedFile(f._1, f._2, nextEpoch.get))
          else m.removed
        (m.files.filterNot(f => replaced.contains(f._1)),
          m.compactedUpTo,
          m.stats -- replaced, m.blooms -- replaced, m.deltas,
          newRemoved,
          if (keepHistory) math.max(m.rewrittenUpTo, nextEpoch.get)
          else m.rewrittenUpTo)
      } else if (!replace && curM.isDefined) {
        val m = curM.get
        (m.files, m.compactedUpTo, m.stats, m.blooms, m.deltas,
          m.removed, m.rewrittenUpTo)
      } else {
        // truncate: the table restarts with full (empty) history. The old
        // files (data, delta AND retained history) are deleted AFTER the
        // new manifest publishes — manifest-first is the one safe order
        // (a crash in between leaves reclaimable orphans, never a
        // manifest pointing at deleted files; same discipline as
        // deleteWhere). The deferred list is collected here.
        (Seq.empty[(String, Long)], -1L,
          Map.empty[String, Map[String, (String, String)]],
          Map.empty[String, Map[String, String]],
          Seq.empty[GraftKvSink.DeltaFile],
          Seq.empty[GraftKvSink.RemovedFile], -1L)
      }
    val truncateLeftovers: Seq[String] =
      if (replace && replaceFiles.isEmpty && curM.isDefined) {
        val m = curM.get
        m.files.map(_._1) ++ m.deltas.map(_.name) ++ m.removed.map(_.name)
      } else Nil
    // a truncate invalidates the histogram sidecar outright: the same row
    // COUNT could return with a different distribution, which the
    // count-ratio staleness guard cannot see
    if (replace && replaceFiles.isEmpty)
      Files.deleteIfExists(GraftKvSink.colHistPath(dir)): Unit
    // an overwrite redefines the schema outright; every other commit
    // merges with the manifest's (evolved nullability must not narrow)
    GraftKvSink.writeManifest(dir,
      if (replace && replaceFiles.isEmpty) schema
      else GraftKvSink.publishSchema(dir, schema),
      prior ++ committed.map(m => (m.finalName, m.rows)), priorUpTo,
      priorStats ++ committed.collect {
        case m if m.stats.nonEmpty => m.finalName -> m.stats
      },
      priorBlooms ++ committed.collect {
        case m if m.blooms.nonEmpty => m.finalName -> m.blooms
      },
      priorDeltas, priorRemoved, priorRw,
      freshHistory = replace && replaceFiles.isEmpty,
      partitionSpec = if (partSpec.nonEmpty) partSpec else null,
      priorHint = curM)
    // without retained history, replaced data files become garbage once
    // the manifest no longer lists them — except a name a new commit
    // re-published (task-id collision across sessions): that file now
    // HOLDS the new rows, keep it
    if (!keepHistory) {
      val committedNames = committed.map(_.finalName).toSet
      GraftKvSink.deleteOwnedUnheld(dir,
        (replaced -- committedNames).toSeq)
    }
    // truncate's old files, deleted only now that the new manifest is the
    // published state (same collision guard as above)
    if (truncateLeftovers.nonEmpty) {
      val committedNames = committed.map(_.finalName).toSet
      GraftKvSink.deleteOwnedUnheld(dir,
        truncateLeftovers.filterNot(committedNames).toSeq)
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftKvCommit.flatten(messages)
      .foreach(m => Files.deleteIfExists(Paths.get(dir, m.tmpName)))
}

final class GraftKvWriterFactory(dir: String, schemaJson: String,
    namePrefix: String = "", writeId: String = "w0",
    guard: Option[org.apache.spark.sql.catalyst.expressions.Expression] = None,
    partSpec: Seq[String] = Nil,
    // physical write layout (column mapping), captured at PLAN time from
    // the planned manifest ([[GraftKvSink.writeLayout]]): writers emit
    // the null marker at each retired hole so every file shares one
    // global positional layout. Plan-time capture is sound under any
    // concurrent DDL — positions never move or get reused, so a layout
    // from an older manifest writes values only at positions readers
    // either resolve identically or never read.
    byPid: Array[Int] = null)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val inner: DataWriter[InternalRow] =
      if (partSpec.nonEmpty)
        new GraftKvPartitionedWriter(dir, schema,
          GraftPartition.parse(partSpec, schema),
          k => (f"${namePrefix}part-$partitionId%05d-$taskId-s$k.$writeId.tmp",
            f"${namePrefix}part-$partitionId%05d-$taskId-s$k.kv"), byPid)
      else new GraftKvWriter(dir, schema,
        f"${namePrefix}part-$partitionId%05d-$taskId.$writeId.tmp",
        f"${namePrefix}part-$partitionId%05d-$taskId.kv", byPid)
    guard match {
      case None => inner
      case Some(g) => new DataWriter[InternalRow] {
        private val p =
          org.apache.spark.sql.catalyst.expressions.Predicate.create(g)
        p.initialize(partitionId)
        override def write(r: InternalRow): Unit = {
          p.eval(r); inner.write(r) // eval raises on violation
        }
        override def commit(): WriterCommitMessage = inner.commit()
        override def abort(): Unit = inner.abort()
        override def close(): Unit = inner.close()
      }
    }
  }
}

final class GraftKvWriter(dir: String, schema: StructType,
    private val tmpName: String, private val finalName: String,
    // physical->logical layout (column mapping); null = identity
    byPid: Array[Int] = null)
  extends DataWriter[InternalRow] {
  private val out = Files.newBufferedWriter(Paths.get(dir, tmpName),
    StandardCharsets.UTF_8)
  private var rows = 0L
  // per-column (min, max) over non-null values — the file's pruning range.
  // A NaN poisons ordering, so it invalidates that column's stats.
  private val statMin = new Array[String](schema.length)
  private val statMax = new Array[String](schema.length)
  private val statBad = new Array[Boolean](schema.length)
  // per-column bloom over non-null values (int/long/string only) — the
  // point-lookup pruner for value sets whose RANGES overlap across files
  private val blooms = schema.fields.map { f =>
    f.dataType match {
      case IntegerType | LongType | StringType |
           TimestampType | TimestampNTZType | DateType =>
        org.apache.spark.util.sketch.BloomFilter
          .create(GraftKvSink.BloomItems, GraftKvSink.BloomFpp)
      case _ => null
    }
  }
  // per-column HLL over non-null values (every type, no row cap — unlike
  // blooms, sketch quality is size-independent): the manifest's NDV feed
  private val hlls = schema.fields.map(_ => new Array[Byte](GraftKvSink.HllM))
  private val hllSeen = new Array[Boolean](schema.length)
  private val nonNull = new Array[Long](schema.length)
  private val strLen = new Array[Long](schema.length)

  // Per-row hot path (r20): the original observe() resolved a comparator
  // CLOSURE per field per row and re-parsed the canonical string back into
  // its numeric value for every min/max compare and bloom feed (two parses
  // per long column per row). Resolve a type tag once per column, compare
  // and bloom on the PRIMITIVE read straight from the row, and keep typed
  // extreme mirrors beside the committed string images so the string is
  // only touched when a new extreme is recorded. Committed stats are
  // byte-identical: the string image written into statMin/statMax is the
  // same observed(i) canonical image the old path compared with.
  private val tags: Array[Int] = schema.fields.map(_.dataType match {
    case IntegerType | DateType                      => 0 // int-backed order
    case LongType | TimestampType | TimestampNTZType => 1 // long-backed order
    case DoubleType                                  => 2
    case FloatType                                   => 3
    case _: DecimalType                              => 4
    case StringType                                  => 5
    case BooleanType                                 => 6
    case _: ArrayType                                => 7
    case _                                           => 8 // encodeRow rejects
  })
  private val decPrec = schema.fields.map(_.dataType match {
    case d: DecimalType => d.precision; case _ => 0
  })
  private val decScale = schema.fields.map(_.dataType match {
    case d: DecimalType => d.scale; case _ => 0
  })
  // typed mirrors of statMin/statMax (valid whenever the string is set)
  private val minL = new Array[Long](schema.length)
  private val maxL = new Array[Long](schema.length)
  private val minD = new Array[Double](schema.length)
  private val maxD = new Array[Double](schema.length)
  private val minBD = new Array[java.math.BigDecimal](schema.length)
  private val maxBD = new Array[java.math.BigDecimal](schema.length)
  private val minU8 = new Array[UTF8String](schema.length)
  private val maxU8 = new Array[UTF8String](schema.length)
  private val minB = new Array[Boolean](schema.length)
  private val maxB = new Array[Boolean](schema.length)

  private val observed = new Array[String](schema.length)
  private val sb = new StringBuilder(256) // reused across rows
  private var lineChars = new Array[Char](256) // reused line-flush buffer
  private val numBuf = new Array[Byte](20) // hllAddLong scratch (max long = 20 chars)
  override def write(row: InternalRow): Unit = {
    sb.setLength(0)
    GraftKvSink.encodeRow(schema, row, sb, observed, byPid)
    var i = 0
    while (i < schema.length) {
      // long-backed columns (tags 0/1) run the PRIMITIVE stats path: their
      // observed(i) is always null (encodeRow skips the string), null-ness
      // comes from the row, the HLL hashes digits from the reusable buffer
      // (bit-identical registers to the string feed), and the canonical
      // min/max images are built only when a new extreme is recorded.
      val tag = tags(i)
      if (tag <= 1) {
        if (!row.isNullAt(i)) {
          val l = if (tag == 0) row.getInt(i).toLong else row.getLong(i)
          GraftKvSink.hllAddLong(hlls(i), l, numBuf)
          hllSeen(i) = true
          nonNull(i) += 1L
          if (!statBad(i)) {
            if (statMin(i) == null) {
              val img = java.lang.Long.toString(l)
              statMin(i) = img; statMax(i) = img; minL(i) = l; maxL(i) = l
            } else {
              if (l < minL(i)) { minL(i) = l; statMin(i) = java.lang.Long.toString(l) }
              if (l > maxL(i)) { maxL(i) = l; statMax(i) = java.lang.Long.toString(l) }
            }
          }
          blooms(i).putLong(l)
        }
        i += 1
      } else {
      val v = observed(i)
      if (v != null) {
        val utf8Len = GraftKvSink.hllAdd(hlls(i), v)
        hllSeen(i) = true
        nonNull(i) += 1L
        val first = statMin(i) == null
        tags(i) match {
          case 2 | 3 =>
            // a NaN poisons ordering: invalidate the column's stats (the
            // pre-NaN extremes stay recorded but commit() drops them)
            if (!statBad(i)) {
              val dv = if (tags(i) == 2) row.getDouble(i)
                       else row.getFloat(i).toDouble
              if (dv != dv) statBad(i) = true
              else if (first) { statMin(i) = v; statMax(i) = v; minD(i) = dv; maxD(i) = dv }
              else {
                if (dv < minD(i)) { minD(i) = dv; statMin(i) = v }
                if (dv > maxD(i)) { maxD(i) = dv; statMax(i) = v }
              }
            }
          case 4 =>
            if (!statBad(i)) {
              val bd = row.getDecimal(i, decPrec(i), decScale(i)).toJavaBigDecimal
              if (first) { statMin(i) = v; statMax(i) = v; minBD(i) = bd; maxBD(i) = bd }
              else {
                if (bd.compareTo(minBD(i)) < 0) { minBD(i) = bd; statMin(i) = v }
                if (bd.compareTo(maxBD(i)) > 0) { maxBD(i) = bd; statMax(i) = v }
              }
            }
          case 5 =>
            // string order = UTF8String BINARY order, matching the
            // scan-side `le`; the mirror is an independent copy (the
            // row's buffer is reused by the next row)
            strLen(i) += utf8Len.toLong
            if (!statBad(i)) {
              val u8 = row.getUTF8String(i)
              if (first) {
                val copy = UTF8String.fromString(v)
                statMin(i) = v; statMax(i) = v; minU8(i) = copy; maxU8(i) = copy
              } else {
                if (u8.compareTo(minU8(i)) < 0) { minU8(i) = UTF8String.fromString(v); statMin(i) = v }
                if (u8.compareTo(maxU8(i)) > 0) { maxU8(i) = UTF8String.fromString(v); statMax(i) = v }
              }
            }
            blooms(i).putString(v)
          case 6 =>
            // "false" < "true" in UTF-8 binary order = boolean order
            if (!statBad(i)) {
              val b = row.getBoolean(i)
              if (first) { statMin(i) = v; statMax(i) = v; minB(i) = b; maxB(i) = b }
              else {
                if (!b && minB(i)) { minB(i) = false; statMin(i) = v }
                if (b && !maxB(i)) { maxB(i) = true; statMax(i) = v }
              }
            }
          case _ =>
            // arrays have no pruning order (Iceberg records none either):
            // no min/max, no bloom — absent stats never prune, the
            // standing soundness rule. len: rides the string-length slot
            // as TOTAL ELEMENT COUNT (avg-cardinality feed).
            strLen(i) += GraftKvSink.arrayCellLen(v)
        }
      }
      i += 1
      }
    }
    // reused char buffer: sb.toString copied the whole line into a fresh
    // String per row just to hand chars to the writer
    val n = sb.length
    if (lineChars.length < n)
      lineChars = new Array[Char](math.max(n, lineChars.length * 2))
    sb.underlying.getChars(0, n, lineChars, 0)
    out.write(lineChars, 0, n)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    val stats = schema.fields.indices.collect {
      case i if statMin(i) != null && !statBad(i) =>
        schema(i).name.toLowerCase -> (statMin(i), statMax(i))
    }.toMap
    // blooms only for files within the row cap (fpp holds) and with at
    // least one non-null value (an all-null column prunes via no-stats)
    val bloomB64 =
      if (rows > GraftKvSink.BloomRowCap) Map.empty[String, String]
      else schema.fields.indices.collect {
        case i if blooms(i) != null && statMin(i) != null =>
          val bos = new java.io.ByteArrayOutputStream()
          blooms(i).writeTo(bos)
          schema(i).name.toLowerCase ->
            java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      }.toMap
    // HLL NDV sketches ride the same per-file map under "hll:<col>" —
    // no row cap (an all-null column simply has no entry)
    val hllB64 = schema.fields.indices.collect {
      case i if hllSeen(i) =>
        GraftKvSink.HllKey + schema(i).name.toLowerCase ->
          java.util.Base64.getEncoder.encodeToString(hlls(i))
    }.toMap
    // non-null counts (every column — 0 means all-null, which IS the
    // null-count information) + total string bytes for avgLen
    val counters = schema.fields.indices.flatMap { i =>
      Seq(GraftKvSink.CntKey + schema(i).name.toLowerCase ->
        nonNull(i).toString) ++
        (if ((schema(i).dataType == StringType ||
            schema(i).dataType.isInstanceOf[ArrayType]) && nonNull(i) > 0L)
          Seq(GraftKvSink.LenKey + schema(i).name.toLowerCase ->
            strLen(i).toString)
        else Nil)
    }.toMap
    GraftKvCommit(tmpName, finalName, rows, stats, bloomB64 ++ hllB64 ++ counters)
  }

  override def abort(): Unit = {
    out.close()
    Files.deleteIfExists(Paths.get(dir, tmpName))
  }

  override def close(): Unit = ()
}

/** Manifest-driven scan: one input partition per published data file,
  * minus the files whose manifest stats contradict a pushed filter —
  * the connector's region-pruning analogue. */
final class GraftKvScan(dir: String, asOfEpoch: Option[Long] = None,
    filters: Seq[org.apache.spark.sql.sources.Filter] = Seq.empty,
    projection: Option[StructType] = None,
    maxEpochs: Option[Long] = None,
    onlyFiles: Option[Set[String]] = None,
    changeFeed: Boolean = false,
    startEpoch: Option[Long] = None,
    fromEpoch: Option[Long] = None)
  extends Scan with Batch
  with org.apache.spark.sql.connector.read.SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.connector.read.SupportsReportPartitioning {
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(fromEpoch.isEmpty,
      "graft_kv: fromEpoch is a batch option; streams use startingEpoch")
    // ship the RESOLVED read schema (pruned, CDC-extended) — the stream's
    // reader factory must emit exactly what this scan advertises
    new GraftKvMicroBatchStream(dir, Some(readSchema()), maxEpochs, changeFeed,
      startEpoch)
  }
  // Shard-pruned manifest read (two-level manifest, SURVEY §7.45): a
  // PLAIN filtered read may skip whole manifest shards whose summary
  // contradicts a pushed filter — identical result set (per-file pruning
  // would drop every file in them), parse cost ∝ surviving shards. A
  // row-level operation's scan (projection carries `_file`) reads the
  // FULL manifest: its plannedManifest feeds the commit-time conflict
  // gate, which must see every live file to prove disjointness. CDC /
  // onlyFiles reads also take the full path (their file sets are not
  // filter-derived). shardsParsed/-Total = (-1,-1) on a legacy table or
  // full read; surfaced in description() so plans are self-describing
  // (and the judged query pins the mechanism off the plan text).
  private val (manifest, shardsParsed, shardsTotal) = {
    // asOf excluded: requireAnswerableEpoch derives the head epoch from
    // the file set, and a pruned set could underestimate it — a
    // legitimate AS OF would then refuse. Time-travel reads take the
    // full parse (they are maintenance-shaped, not the hot path).
    val prunable = filters.nonEmpty && !changeFeed && onlyFiles.isEmpty &&
      asOfEpoch.isEmpty &&
      projection.forall(p => !p.fieldNames.contains("_file"))
    if (prunable)
      GraftKvSink.readManifestPruned(GraftKvSink.manifestPath(dir), filters)
    else
      (GraftKvSink.readManifest(GraftKvSink.manifestPath(dir)), -1, -1)
  }
  /** The manifest THIS scan planned against — a row-level operation's
    * write must run its optimistic-conflict check against the state its
    * rows were derived from (the scan's), not a fresher one read at
    * write-factory time: a commit landing in that gap would otherwise be
    * invisible to the gate and two concurrent DMLs could both publish. */
  private[sources] def plannedManifest: GraftKvSink.Manifest = manifest
  /** The pushed read filters — a row-level operation's write hands these
    * to the commit-time conflict gate: a concurrently-added file PROVABLY
    * outside this read region (by tuple/stats/bloom) cannot be a phantom,
    * so disjoint-partition DMLs merge instead of refusing. */
  private[sources] def pushedFilterSeq: Seq[org.apache.spark.sql.sources.Filter] =
    filters
  // vacuumed history and never-committed epochs are unanswerable — error,
  // never partial rows or a silently-moving "pinned" state
  asOfEpoch.foreach(GraftKvSink.requireAnswerableEpoch(manifest, _))
  // batch-incremental lower bound: `fromEpoch` demands a pure-append
  // range — the gate runs HERE, against the manifest this scan actually
  // planned, not the best-effort option check (a commit can land between
  // the two reads)
  fromEpoch.foreach { n =>
    require(manifest.compactedUpTo < n,
      s"graft_kv: fromEpoch=$n is inside compacted history (epochs <= " +
        s"${manifest.compactedUpTo} were merged — their per-epoch rows " +
        "no longer separate); record a fresher high-water mark")
    require(manifest.rewrittenUpTo < n,
      s"graft_kv: fromEpoch=$n is at or below the row-level rewrite at " +
        s"epoch ${manifest.rewrittenUpTo} — rows in that range were " +
        "mutated, not appended; use readChangeFeed for mutated history")
    require(!manifest.deltas.exists(d => GraftKvSink.epochOf(d.name) >= n),
      s"graft_kv: fromEpoch=$n overlaps merge-on-read DML epochs — the " +
        "range is not pure appends; use readChangeFeed (or OPTIMIZE, " +
        "then restart from the compaction boundary)")
  }
  // boundary-state visibility (one definition: Manifest.visibleFilesAt) —
  // includes CoW-superseded files whose retention window covers the epoch,
  // so every pre-DML boundary state reconstructs exactly until vacuum.
  // A fromEpoch lower bound then keeps only files appended at or after it
  // (pure-append range: no removed/resurrected file can reach here).
  private val epochVisible = manifest.visibleFilesAt(asOfEpoch)
    .filter { case (nm, _) =>
      fromEpoch.forall(n => GraftKvSink.epochOf(nm) >= n) }
  // merge-on-read deltas visible at this epoch: applied to every base file
  // they reference, and their insert records surface as own partitions. An
  // asOfEpoch below a delta's epoch reads the exact pre-DML state — MOR
  // DML never fences time travel. Under a fromEpoch lower bound no delta
  // participates at all: the gate above proved every delta predates the
  // bound, so their inserts are outside the range and their deletes only
  // target files the bound already excluded.
  private val visibleDeltas =
    if (fromEpoch.isDefined) Nil else manifest.visibleDeltasAt(asOfEpoch)
  // stats + bloom pruning: drop a file when ANY pushed filter is
  // unsatisfiable within its recorded ranges, or when a point/IN probe
  // misses its bloom; files without stats/blooms always survive. `visible`
  // is a var because RUNTIME group filtering (below) can narrow it again
  // after the group-discovery subquery executes.
  // partition-tuple pruning is per FILE, against whatever transforms the
  // file's own `part:` entries record — not against the table's CURRENT
  // spec. That makes it EXACT where min/max ranges are best-effort (a
  // file holds one tuple, so a contradicted tuple excludes it outright:
  // bucket residue classes, truncated ranges, all-null partitions), and
  // it makes partition EVOLUTION trivially sound and maximally useful:
  // files written under a superseded spec keep pruning on THEIR
  // transforms forever, files without entries are never pruned. The
  // parse cache is per distinct transform key (a handful), not per file.
  private val partTransformCache =
    scala.collection.mutable.HashMap.empty[String, Option[GraftPartition.PTransform]]
  private var visible = epochVisible.filter { case (name, _) =>
    val st = manifest.stats.getOrElse(name, Map.empty)
    lazy val bl = manifest.blooms.getOrElse(name, Map.empty)
    lazy val parts: Map[String, String] = GraftPartition.filePartsOf(st)
    lazy val fileSpec: Seq[GraftPartition.PTransform] =
      GraftPartition.fileSpecOf(parts, manifest.schema, partTransformCache)
    filters.forall(f => GraftKvSink.mayMatch(manifest.schema, st, f) &&
      GraftKvSink.bloomMayMatch(manifest.schema, bl, f) &&
      (parts.isEmpty || GraftPartition.mayMatch(fileSpec, parts, f)))
  }
  /** RUNTIME group filtering on the `_file` metadata column — what lets a
    * row-level MERGE (whose ON condition is a join, invisible to static
    * stats pruning) rewrite only the files that actually hold matched
    * rows: Spark's RowLevelOperationRuntimeGroupFiltering runs the
    * group-discovery subquery first and pushes `_file IN (names…)` here
    * before partitions are planned. Unknown predicate shapes are ignored
    * (keeping every file is always sound — extra files rewrite to their
    * own content). */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    // only when the scan OUTPUTS _file (row-level operation scans do — the
    // operation requires the metadata attribute): Spark's generic dynamic
    // pruning resolves filterAttributes against the scan output and
    // ERRORS on unresolvable names, so a plain scan must advertise none
    if (readSchema().fieldNames.contains("_file"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))
    else Array.empty
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty &&
          p.children().head.isInstanceOf[
            org.apache.spark.sql.connector.expressions.NamedReference] &&
          p.children().head.asInstanceOf[
            org.apache.spark.sql.connector.expressions.NamedReference]
            .fieldNames().sameElements(Array("_file"))) {
        val names = p.children().drop(1).collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value() != null =>
            l.value().toString
        }.toSet
        visible = visible.filter { case (n, _) => names.contains(n) }
      }
    }
  }
  override def readSchema(): StructType = projection.getOrElse(
    if (changeFeed) GraftKvSink.withCdcColumns(manifest.schema)
    else manifest.schema)
  override def toBatch: Batch = this
  override def description(): String = {
    // on a shard-pruned read, manifest.files holds only surviving
    // shards' entries — the honest denominator is the TABLE total, which
    // the shard list carries without parsing anything
    val totalFiles =
      if (shardsTotal >= 0 && manifest.shardInfo.nonEmpty)
        manifest.shardInfo.map(_.count).sum
      else manifest.files.length.toLong
    s"graft_kv $dir files=${visible.length}/$totalFiles" +
      s" cols=${readSchema().length}/${manifest.schema.length}" +
      (if (shardsTotal >= 0) s" shards=$shardsParsed/$shardsTotal" else "") +
      asOfEpoch.map(n => s" asOfEpoch=$n").getOrElse("") +
      fromEpoch.map(n => s" fromEpoch=$n").getOrElse("")
  }
  /** The pruned file set — the GROUP identity for row-level replaces. */
  def visibleFiles: Seq[String] = visible.map(_._1)
  /** STORAGE-PARTITIONED JOIN (the Iceberg/SPJ shape, unlocked by
    * spark.sql.sources.v2.bucketing.enabled): when every visible file
    * carries a full IDENTITY-transform tuple, the scan reports
    * KeyGroupedPartitioning over the partition sources and plans ONE
    * partition per tuple — two tables partitioned alike then join (and
    * aggregate on the keys) with NO shuffle on either side, the single
    * biggest exchange eliminator at 100 TB. Conservative gates: no
    * deltas at the boundary, no CDC/incremental frames, no row-level
    * `_file` scans (their runtime group filtering re-plans partitions).
    * IDENTITY and BUCKET transforms participate — bucket key-equality is
    * provable because the catalog exposes the routing function
    * ([[GraftBucketFunction]], canonical-named per column type), so two
    * co-bucketed fact tables join exchange-free even when the key is too
    * wide to partition by value; truncate/temporal transforms stand down
    * (equal floor buckets do not imply equal join keys). */
  private lazy val spjGroups
      : Option[(Seq[GraftPartition.PTransform], Seq[(InternalRow, Seq[String])])] = {
    // DOUBLY opt-in, the Iceberg preserve-data-grouping shape: tuple
    // grouping caps read parallelism at the partition count, and
    // v2.bucketing defaults ON in Spark 4 — so a source-side conf must
    // also say this scan should trade parallelism for eliminated
    // exchanges; default scans keep one task per file
    val active = org.apache.spark.sql.internal.SQLConf.get.getConf(
        org.apache.spark.sql.internal.SQLConf.V2_BUCKETING_ENABLED) &&
      org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.sql.graft.planning.preserveDataGrouping",
          "false").toBoolean &&
      !changeFeed && startEpoch.isEmpty && fromEpoch.isEmpty &&
      onlyFiles.isEmpty && manifest.partitionSpec.nonEmpty &&
      visibleDeltas.isEmpty && visible.nonEmpty &&
      !readSchema().fieldNames.exists(n => n == "_file" || n == "_pos")
    if (!active) None
    else {
      val specOpt =
        try Some(GraftPartition.parse(manifest.partitionSpec, manifest.schema))
        catch { case _: Exception => None }
      specOpt.filter(spec =>
        spec.forall(t => t.isInstanceOf[GraftPartition.PIdentity] ||
            t.isInstanceOf[GraftPartition.PBucket]) &&
          spec.forall(t => readSchema().fieldNames
            .exists(_.equalsIgnoreCase(t.source)))).flatMap { spec =>
        val tuples = visible.map { case (n, _) =>
          val st = manifest.stats.getOrElse(n, Map.empty)
          n -> spec.map(t => st.get(t.statsKey).map(_._1))
        }
        if (tuples.exists(_._2.exists(_.isEmpty))) None // untagged file
        else {
          val groups = tuples.map { case (n, vs) => (vs.flatten, n) }
            .groupBy(_._1).toSeq
            .sortBy(_._1.mkString("\u0000"))
            .map { case (vals, fs) =>
              val row = org.apache.spark.sql.catalyst.InternalRow.fromSeq(
                spec.zip(vals).map { case (t, v) =>
                  if (v == "\\N") null
                  else t match {
                    // a bucket tuple IS the function's Int ordinal
                    case GraftPartition.PBucket(_, _, _) => v.toInt
                    case GraftPartition.PIdentity(_, dt) =>
                      // undo the tuple encoding's lead-backslash doubling
                      val raw =
                        if (v.startsWith("\\")) v.substring(1) else v
                      dt match {
                        case IntegerType   => raw.toInt
                        case LongType      => raw.toLong
                        case TimestampType | TimestampNTZType =>
                          raw.toLong // internal micros
                        case DateType      => raw.toInt // internal days
                        case DoubleType    => raw.toDouble
                        case FloatType     => raw.toFloat
                        case BooleanType   => raw.toBoolean
                        case d: DecimalType =>
                          org.apache.spark.sql.types.Decimal(
                            new java.math.BigDecimal(raw), d.precision, d.scale)
                        case _             => UTF8String.fromString(raw)
                      }
                    case other => throw new IllegalStateException(
                      s"non-SPJ transform in group key: ${other.key}")
                  }
                })
              (row, fs.map(_._2).sorted)
            }
          Some((spec, groups))
        }
      }
    }
  }
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    spjGroups match {
      case Some((spec, groups)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          spec.map {
            case GraftPartition.PBucket(n, c, _) =>
              org.apache.spark.sql.connector.expressions.Expressions
                .bucket(n, c)
                : org.apache.spark.sql.connector.expressions.Expression
            case t =>
              org.apache.spark.sql.connector.expressions.Expressions
                .identity(t.source)
                : org.apache.spark.sql.connector.expressions.Expression
          }.toArray,
          groups.length)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          visible.length + visibleDeltas.count(_.inserts > 0L))
    }
  override def planInputPartitions(): Array[InputPartition] = {
    // a changefeed is a RANGE of epochs — only the streaming read (whose
    // offsets carry the range) can answer it; a batch point-in-time diff
    // is GraftKvSink.changedFiles + the except-all changefeed frame
    require(!changeFeed,
      "graft_kv: readChangeFeed is a streaming read option; use readStream " +
        "(or the batch changefeed for a point-in-time diff)")
    require(startEpoch.isEmpty,
      "graft_kv: startingEpoch is a streaming read option; batch boundary " +
        "reads use asOfEpoch")
    // tasks resolve their own position-deletes from the (small) delta
    // files — the partition ships NAMES, not delete sets, so a large
    // delete never bloats task descriptors (the Iceberg delete-file shape)
    spjGroups match {
      case Some((_, groups)) =>
        return groups.map { case (key, names) =>
          GraftKvGroupPartition(
            names.map(n => GraftKvFilePartition(dir, n)), key): InputPartition
        }.toArray
      case None => ()
    }
    val deltaNames = visibleDeltas.map(_.name)
    // onlyFiles (changefeed): restrict which files get partitions — the
    // MASKING set stays the boundary's full visible delta list, so the
    // targeted files still read under the exact boundary-state overlay
    def wanted(n: String): Boolean = onlyFiles.forall(_.contains(n))
    val base = visible.filter(f => wanted(f._1)).map(f =>
      GraftKvFilePartition(dir, f._1, deltaNames): InputPartition)
    // a delta's insert records are their own partition; later deltas can
    // position-delete them like any other row
    val ins = visibleDeltas.filter(d => d.inserts > 0L && wanted(d.name))
      .map(d => GraftKvFilePartition(dir, d.name, deltaNames,
        deltaInserts = true): InputPartition)
    (base ++ ins).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftKvReaderFactory(manifest.schema.json, readSchema().json)
  /** POST-PRUNE statistics from the manifest (row counts summed, bytes
    * from the surviving files on disk) — the same contract as the range
    * connector's post-pushdown stats: a small kv dimension joins
    * broadcast-first with no hint, and stats-pruned scans report only
    * what they will actually read. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    // deltas adjust the count: each position-delete masks one live row,
    // each insert record adds one (see the agg-pushdown soundness note)
    val rows = math.max(0L, visible.map(_._2).sum +
      visibleDeltas.map(d => d.inserts - d.deletes).sum)
    val bytes = (visible.map(_._1) ++ visibleDeltas.map(_.name)).map { n =>
      val p = GraftKvSink.dataPath(dir, n)
      if (Files.exists(p)) Files.size(p) else 0L
    }.sum
    // decoding the per-file sketches (HLL registers, counters, fallback
    // blooms) costs O(files x columns) driver work — Spark calls
    // columnStats() on every computeStats but only CONSUMES the result
    // under spark.sql.cbo.enabled, so pay nothing in the default config
    lazy val cstats =
      if (org.apache.spark.sql.internal.SQLConf.get.cboEnabled)
        columnStatsMap(rows)
      else new java.util.HashMap[
        org.apache.spark.sql.connector.expressions.NamedReference,
        org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
      override def columnStats(): java.util.Map[
          org.apache.spark.sql.connector.expressions.NamedReference,
          org.apache.spark.sql.connector.read.colstats.ColumnStatistics] =
        cstats
    }
  }

  /** Per-COLUMN statistics for the CBO, derived from metadata the manifest
    * already maintains for pruning — no data is read:
    *  - min/max: fold of the per-file (min, max) ranges (numeric columns;
    *    catalyst range estimation is numeric, string bounds go unused);
    *  - distinct count: per-file HLL sketches (2 KB/column, written at
    *    every file size — unlike blooms they never cap out) union by
    *    register max into an exact-union table NDV; pre-HLL manifests
    *    fall back to the bloom bit-OR inversion -(m/k)·ln(1 − X/m).
    * With `spark.sql.cbo.enabled`, Spark's FilterEstimation/JoinEstimation
    * read these through DSv2 transformV2Stats — selective filters shrink
    * the estimated output and flip joins to broadcast with no hints, the
    * decision that matters most at 100 TB. Sound only when no MOR delta
    * overlays the boundary (a delete can evict a file's min/max row and
    * delta inserts carry no stats) — report nothing rather than wrong
    * bounds; plain row/byte counts above remain delta-exact. */
  private def columnStatsMap(rows: Long): java.util.Map[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics] = {
    val out = new java.util.HashMap[
      org.apache.spark.sql.connector.expressions.NamedReference,
      org.apache.spark.sql.connector.read.colstats.ColumnStatistics]()
    if (visibleDeltas.nonEmpty || visible.isEmpty || rows <= 0L) return out
    // table-level equi-height histograms (ANALYZE sidecar): reported only
    // for CURRENT-state reads whose visible row count stays within 2x of
    // the analyzed count — a drifted histogram degrades to absent, and a
    // time-travel read never sees current-state distribution estimates
    lazy val colHist: Option[(Long, Map[String, String])] =
      if (asOfEpoch.isDefined) None else GraftKvSink.readColHist(dir)
    manifest.schema.fields.foreach { f =>
      val perFile = visible.map { case (n, _) =>
        manifest.stats.getOrElse(n, Map.empty)
          .find(_._1.equalsIgnoreCase(f.name)).map(_._2)
      }
      // a file with no recorded range for the column (all-null, NaN seen,
      // pre-stats manifest) makes the fold unknowable — skip min/max
      val minMax: Option[(Any, Any)] =
        if (perFile.isEmpty || perFile.exists(_.isEmpty)) None
        else try {
          val ranges = perFile.flatten
          f.dataType match {
            case IntegerType => Some((
              Int.box(ranges.map(_._1.toInt).min),
              Int.box(ranges.map(_._2.toInt).max)))
            case LongType | TimestampType | TimestampNTZType => Some((
              Long.box(ranges.map(_._1.toLong).min),
              Long.box(ranges.map(_._2.toLong).max)))
            case DateType => Some((
              Int.box(ranges.map(_._1.toInt).min),
              Int.box(ranges.map(_._2.toInt).max)))
            case DoubleType => Some((
              Double.box(ranges.map(_._1.toDouble).min),
              Double.box(ranges.map(_._2.toDouble).max)))
            case FloatType => Some((
              Float.box(ranges.map(_._1.toFloat).min),
              Float.box(ranges.map(_._2.toFloat).max)))
            case dt: DecimalType =>
              // catalyst range estimation consumes Decimal bounds like any
              // numeric; fold by BigDecimal compare (string order lies)
              val mins = ranges.map(r => new java.math.BigDecimal(r._1))
              val maxs = ranges.map(r => new java.math.BigDecimal(r._2))
              Some((
                org.apache.spark.sql.types.Decimal(
                  mins.min, dt.precision, dt.scale),
                org.apache.spark.sql.types.Decimal(
                  maxs.max, dt.precision, dt.scale)))
            case _ => None
          }
        } catch { case _: NumberFormatException => None }
      // NDV: prefer the per-file HLL sketches (size-independent, exact
      // union via register max); fall back to the bloom-union inversion
      // for pre-HLL manifests whose files all stayed under the bloom cap
      val perHll = visible.map { case (n, _) =>
        manifest.blooms.getOrElse(n, Map.empty)
          .find(_._1.equalsIgnoreCase(GraftKvSink.HllKey + f.name)).map(_._2)
      }
      val perBloom = visible.map { case (n, _) =>
        manifest.blooms.getOrElse(n, Map.empty)
          .find(_._1.equalsIgnoreCase(f.name)).map(_._2)
      }
      val ndv: Option[Long] =
        if (perHll.nonEmpty && perHll.forall(_.isDefined)) try {
          Some(math.max(1L, math.min(rows,
            GraftKvSink.hllEstimate(GraftKvSink.hllMergeB64(perHll.flatten)))))
        } catch { case _: Exception => None }
        else if (perBloom.isEmpty || perBloom.exists(_.isEmpty)) None
        else try {
          val union = perBloom.flatten
            .map(b64 => org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(
                java.util.Base64.getDecoder.decode(b64))))
            .reduce((a, b) => a.mergeInPlace(b))
          val m = union.bitSize().toDouble
          val x = union.cardinality().toDouble
          // the k the library chose for (BloomItems, fpp): round(m/n · ln2)
          val k = math.max(1.0,
            math.round(m / GraftKvSink.BloomItems * math.log(2)).toDouble)
          if (x >= m) Some(rows) // saturated filter: every value distinct-ish
          else Some(math.max(1L, math.min(rows,
            math.round(-(m / k) * math.log1p(-(x / m))))))
        } catch { case _: Exception => None }
      // null count from the per-file non-null counters (nulls = rows − Σcnt);
      // avgLen for strings from Σlen / Σcnt — catalyst's 20 B/string
      // default is the wrong size estimate everywhere it matters
      def counterSum(prefix: String): Option[Long] = {
        val per = visible.map { case (n, _) =>
          manifest.blooms.getOrElse(n, Map.empty)
            .find(_._1.equalsIgnoreCase(prefix + f.name)).map(_._2) }
        if (per.isEmpty || per.exists(_.isEmpty)) None
        else try Some(per.flatten.map(_.toLong).sum)
        catch { case _: NumberFormatException => None }
      }
      val cnt = counterSum(GraftKvSink.CntKey)
      val nulls = cnt.map(c => math.max(0L, visible.map(_._2).sum - c))
      val avgStrLen: Option[Long] =
        if (f.dataType != StringType) None
        else (counterSum(GraftKvSink.LenKey), cnt) match {
          case (Some(l), Some(c)) if c > 0L =>
            Some(math.max(1L, math.round(l.toDouble / c)))
          case _ => None
        }
      val hist: Option[org.apache.spark.sql.connector.read.colstats.Histogram] =
        colHist.flatMap { case (hRows, cols) =>
          cols.get(f.name.toLowerCase)
            .filter(_ => hRows > 0L && rows <= 2L * hRows && rows >= hRows / 2L)
            .flatMap { enc =>
              try {
                val parsed = enc.split(';').map { b =>
                  val a = b.split(',')
                  (a(0).toDouble, a(1).toDouble, a(2).toLong)
                }
                val h = hRows.toDouble / parsed.length
                Some(new org.apache.spark.sql.connector.read.colstats.Histogram {
                  override def height(): Double = h
                  override def bins(): Array[
                      org.apache.spark.sql.connector.read.colstats.HistogramBin] =
                    parsed.map { case (l, u, n) =>
                      new org.apache.spark.sql.connector.read.colstats.HistogramBin {
                        override def lo(): Double = l
                        override def hi(): Double = u
                        override def ndv(): Long = n
                      }
                    }
                })
              } catch { case _: Exception => None }
            }
        }
      if (minMax.isDefined || ndv.isDefined || nulls.isDefined ||
        hist.isDefined) {
        out.put(org.apache.spark.sql.connector.expressions.Expressions
            .column(f.name),
          new org.apache.spark.sql.connector.read.colstats.ColumnStatistics {
            override def distinctCount(): java.util.OptionalLong =
              ndv.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty)
            override def min(): java.util.Optional[Object] =
              minMax.map(mm => java.util.Optional.of(mm._1.asInstanceOf[Object]))
                .getOrElse(java.util.Optional.empty[Object]())
            override def max(): java.util.Optional[Object] =
              minMax.map(mm => java.util.Optional.of(mm._2.asInstanceOf[Object]))
                .getOrElse(java.util.Optional.empty[Object]())
            override def nullCount(): java.util.OptionalLong =
              nulls.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty)
            override def avgLen(): java.util.OptionalLong =
              avgStrLen.map(java.util.OptionalLong.of)
                .getOrElse(java.util.OptionalLong.empty)
            override def histogram(): java.util.Optional[
                org.apache.spark.sql.connector.read.colstats.Histogram] =
              hist.map(java.util.Optional.of(_))
                .getOrElse(java.util.Optional.empty())
          })
      }
    }
    out
  }
}

final case class GraftKvFilePartition(dir: String, file: String,
    deltas: Seq[String] = Nil, deltaInserts: Boolean = false,
    // CDC partitions: `changeType` labels every emitted row ("insert" /
    // "delete"), `commitEpoch` stamps the committing epoch. `cdcDeletes`
    // INVERTS the delta role: `deltas` holds the ONE delta whose
    // position-deletes select which of `file`'s rows to emit (as their
    // pre-delete images) instead of masking them.
    changeType: String = null, commitEpoch: Long = -1L,
    cdcDeletes: Boolean = false,
    // CDC four-valued classification: this partition reads the delta's
    // `U` records instead of its D/I records — as `update_preimage`
    // (cdcDeletes: the U-deleted positions of `file`) or
    // `update_postimage` (deltaInserts: the U records' row payloads)
    updates: Boolean = false)
  extends InputPartition

/** One partition per PARTITION TUPLE (the storage-partitioned-join shape):
  * carries its member files' single-file partitions and the tuple as a
  * typed partition key — Spark's KeyGroupedPartitioning machinery reads
  * the key via HasPartitionKey and co-locates matching keys across scans
  * with NO exchange. */
final case class GraftKvGroupPartition(parts: Seq[GraftKvFilePartition],
    key: InternalRow)
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = key
}

/** Streaming READ half — the loop-closer for the connector: the manifest's
  * epoch-stamped files ARE the changelog, so replaying them as micro-batches
  * needs no extra state. Offsets are epoch ids (offset N = "epochs <= N
  * consumed"); each trigger reads exactly the files of epochs in
  * (start, end], the same visibility rule the batch `asOfEpoch` time-travel
  * read uses — StreamingSpec asserts the two agree epoch-for-epoch.
  * Batch-written files (no epoch in their name) surface once, as epoch 0.
  * latestOffset re-reads the manifest (one small JSON) per trigger, so a
  * concurrently running streaming WRITE to the same directory is picked up
  * epoch by epoch — the connector is a live source, not a snapshot. */
final class GraftKvMicroBatchStream(dir: String,
    projection: Option[StructType] = None,
    maxEpochs: Option[Long] = None,
    // CDC mode (`readChangeFeed`): micro-batches emit per-row CHANGE
    // RECORDS instead of snapshot rows — appended files surface as
    // `insert` rows, a merge-on-read delta's insert records as `insert`,
    // its position-deletes as `delete` rows carrying the deleted row's
    // pre-image (read from the still-present target file), and its U
    // records as `update_preimage`/`update_postimage` pairs — the Delta
    // CDF FOUR-VALUED `_change_type`, so a consumer can tell an update
    // from a genuine delete plus an unrelated insert. This is what lifts
    // the MOR streaming fence: a position-delete IS representable as a
    // change record, just not as an append. Copy-on-write rewrites are
    // synthesized from RETAINED HISTORY while it lasts (removed files →
    // `delete`, replacements → `insert`; file-granular, so surviving
    // rows appear as cancelling pairs and a signed fold recovers the
    // minimal diff); once vacuum reclaims the window, a checkpoint
    // behind it refuses via the compacted-history fence.
    // Epoch-LESS batch tables have no history to track: any stream of
    // them (CDC or snapshot) is a one-shot initial snapshot at epoch 0,
    // and later appends/rewrites never surface to a running stream.
    changeFeed: Boolean = false,
    // begin at this epoch instead of the initial snapshot (startingEpoch)
    startEpoch: Option[Long] = None)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private case class EpochOffset(epoch: Long) extends Offset {
    override def json(): String = epoch.toString
  }

  /** Admission control (Kafka maxOffsetsPerTrigger analogue): with
    * `maxEpochsPerTrigger`, each micro-batch advances at most that many
    * epochs past its start, so a stream recovering a long backlog (or fed
    * by a bursty batch producer) processes bounded work per trigger
    * instead of one giant catch-up batch. reportLatestOffset still tells
    * the engine the TRUE head for lag metrics. */
  override def getDefaultReadLimit: ReadLimit =
    maxEpochs.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val head = headEpoch
    val s = start.asInstanceOf[EpochOffset].epoch
    maxEpochs match {
      case Some(n) => EpochOffset(math.min(head, s + n))
      case None    => EpochOffset(head)
    }
  }
  override def reportLatestOffset(): Offset = EpochOffset(headEpoch)
  // the canonical BASENAME-aware parse: a shallow clone's foreign
  // references are absolute paths, and a raw-name match here silently
  // collapsed every foreign epoch to 0 in streaming windows and CDC
  // labels (caught by kv_clone_cdc's hash gate)
  private def epochOf(name: String): Long = GraftKvSink.epochOf(name)
  private def manifestOpt: Option[GraftKvSink.Manifest] = {
    val mf = GraftKvSink.manifestPath(dir)
    if (!Files.exists(mf)) None else Some(GraftKvSink.readManifest(mf))
  }
  private def filesOf(mo: Option[GraftKvSink.Manifest]): Seq[(String, Long)] =
    mo match {
      case None => Seq.empty
      case Some(m) =>
        // merge-on-read deltas cannot be represented in an append-only
        // micro-batch replay (a position-delete is a retraction): surfacing
        // only the insert half — or ignoring the delta entirely — would be
        // SILENTLY wrong, so a SNAPSHOT stream fails loudly until a
        // compaction folds the deltas in. A CDC stream represents them
        // exactly (deletes are change records) and reads on.
        require(changeFeed || m.deltas.isEmpty,
          s"graft_kv: streaming read of $dir with merge-on-read delta files " +
            "present — deletes cannot replay as appends; compact first, or " +
            "read the stream with readChangeFeed=true")
        m.files
    }
  private def files: Seq[(String, Long)] = filesOf(manifestOpt)
  /** Newest epoch with anything to say: data files, and in CDC mode also
    * delta files — a DELETE-only epoch publishes no data file, but its
    * change records must still advance the stream — and retained-history
    * removal epochs: a CoW DML that emptied every affected file published
    * no replacement, yet its delete records must surface. One manifest
    * read. */
  private def headEpoch: Long = {
    val m = manifestOpt
    val dataHead = filesOf(m).map(f => epochOf(f._1)).maxOption.getOrElse(-1L)
    if (!changeFeed) dataHead
    else (dataHead +:
      (m.map(_.deltas.map(d => epochOf(d.name))).getOrElse(Nil) ++
        m.map(_.removed.map(_.removedAt)).getOrElse(Nil) ++
        // rewrittenUpTo survives vacuum: without it the head would
        // REGRESS once retained history is reclaimed, and a checkpoint
        // behind the rewrite would idle forever instead of hitting the
        // compacted-history fence — silent CDC data loss
        m.map(_.rewrittenUpTo).filter(_ >= 0L))).max
  }

  override def initialOffset(): Offset =
    EpochOffset(startEpoch.map(_ - 1L).getOrElse(-1L))
  override def latestOffset(): Offset = EpochOffset(headEpoch)
  override def deserializeOffset(json: String): Offset = EpochOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[EpochOffset].epoch
    val e = end.asInstanceOf[EpochOffset].epoch
    // a checkpoint that ends strictly inside a compacted range can only
    // replay duplicates (the fine-grained epochs are gone) — refuse; a
    // fresh start (-1) reads the compacted file as one complete batch.
    // The same holds below a copy-on-write rewrite: the replacement files
    // carry surviving rows the checkpointed stream already consumed, and
    // an append-only replay has no retraction to fix that up.
    val mfP = GraftKvSink.manifestPath(dir)
    if (Files.exists(mfP)) {
      val m = GraftKvSink.readManifest(mfP)
      val upTo = m.compactedUpTo
      require(s < 0L || upTo < 0L || s >= upTo,
        s"graft_kv: stream checkpoint offset $s predates compacted history " +
          s"(epochs <= $upTo were merged) — restart with a fresh checkpoint")
      if (changeFeed)
        // a CoW rewrite is file-granular: the epoch records WHICH FILES
        // changed, not which rows. While the superseded files are
        // RETAINED (until vacuum), the stream SYNTHESIZES change records
        // from the manifest diff — removed files emit as `delete`, their
        // replacements as `insert`; a surviving row appears as a
        // cancelling pair, so any signed fold (IVM, replication)
        // recovers the minimal row-level diff. Once vacuum reclaims the
        // window it folds rewrittenUpTo into compactedUpTo, and the
        // compacted-history fence above refuses the resumed checkpoint
        // loudly — nothing to re-check here.
        ()
      else
        require(s < 0L || m.rewrittenUpTo < 0L || s >= m.rewrittenUpTo,
          s"graft_kv: stream checkpoint offset $s predates a row-level " +
            s"rewrite at epoch ${m.rewrittenUpTo} — replaying across it " +
            "would duplicate surviving rows; restart with a fresh checkpoint")
    }
    val inserts = files.collect {
      case (name, _) if epochOf(name) > s && epochOf(name) <= e =>
        if (changeFeed)
          GraftKvFilePartition(dir, name,
            changeType = "insert", commitEpoch = epochOf(name)): InputPartition
        else GraftKvFilePartition(dir, name): InputPartition
    }
    if (!changeFeed) return inserts.toArray
    // CDC: each in-range delta contributes its insert records as `insert`
    // rows; its U records as `update_postimage` rows (payload) plus, per
    // U-target file, `update_preimage` rows (the pre-update images read
    // from the still-present target); and per D-target file the deleted
    // rows' pre-images as `delete` rows — the Delta CDF four-valued
    // `_change_type`. The grouping is planned driver-side from the delta
    // files themselves — each is one DML statement's actions, the same
    // bounded read the changefeed and compaction planners do.
    val deltaParts = manifestOpt.toSeq.flatMap(_.deltas)
      .filter(d => epochOf(d.name) > s && epochOf(d.name) <= e)
      .flatMap { d =>
        val n = epochOf(d.name)
        val (hasI, hasU, dTargets, uTargets) = GraftKvSink.deltaShape(dir, d.name)
        val ins =
          if (hasI)
            Seq(GraftKvFilePartition(dir, d.name, deltaInserts = true,
              changeType = "insert", commitEpoch = n): InputPartition)
          else Nil
        val posts =
          if (hasU)
            Seq(GraftKvFilePartition(dir, d.name, deltaInserts = true,
              updates = true, changeType = "update_postimage",
              commitEpoch = n): InputPartition)
          else Nil
        val dels = dTargets.map(t =>
          GraftKvFilePartition(dir, t, deltas = Seq(d.name),
            cdcDeletes = true, changeType = "delete",
            commitEpoch = n): InputPartition)
        val pres = uTargets.map(t =>
          GraftKvFilePartition(dir, t, deltas = Seq(d.name),
            cdcDeletes = true, updates = true, changeType = "update_preimage",
            commitEpoch = n): InputPartition)
        ins ++ posts ++ dels ++ pres
      }
    // CoW retained history: a removed file was INSERTED at its name epoch
    // and DELETED wholesale at removedAt — both ends surface as full-file
    // change partitions while retention lasts. Replacement files are
    // ordinary manifest files and already planned as `insert` above, so a
    // rewrite epoch emits removed-as-delete + replacement-as-insert; rows
    // that survived the rewrite appear as cancelling pairs (file-granular
    // CDC), and a signed fold recovers the minimal diff. Only files the
    // rewrite actually touched are opened — untouched files are visible
    // at both boundaries and contribute nothing.
    val removedParts = manifestOpt.toSeq.flatMap(_.removed).flatMap { r =>
      val born =
        if (epochOf(r.name) > s && epochOf(r.name) <= e)
          Seq(GraftKvFilePartition(dir, r.name,
            changeType = "insert", commitEpoch = epochOf(r.name)): InputPartition)
        else Nil
      val gone =
        if (r.removedAt > s && r.removedAt <= e)
          Seq(GraftKvFilePartition(dir, r.name,
            changeType = "delete", commitEpoch = r.removedAt): InputPartition)
        else Nil
      born ++ gone
    }
    (inserts ++ deltaParts ++ removedParts).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = {
    val mf = GraftKvSink.manifestPath(dir)
    require(Files.exists(mf), s"graft_kv: no manifest at $dir")
    val full = GraftKvSink.readManifest(mf).schema
    new GraftKvReaderFactory(full.json, projection.getOrElse(full).json)
  }
  override def commit(end: Offset): Unit = () // files are immutable history
  override def stop(): Unit = ()
}

/** Line reader with COLUMN PRUNING: `projectedJson` names the fields (a
  * subset of the file schema, possibly reordered) to materialize — only
  * those values are parsed/converted per row; everything else in the line
  * is skipped after the tab split. A zero-column projection (count(*))
  * emits empty rows, one per line. Metadata columns `_file`/`_pos` emit
  * the partition's own file name and the row's line ordinal.
  *
  * MERGE-ON-READ application: when the partition carries delta file names,
  * the task first scans them for `D\t<thisfile>\t<pos>` position-deletes
  * (each delta is tiny — one DML statement's actions — and read once per
  * task, the Iceberg delete-file discipline) and masks those ordinals
  * while streaming. A `deltaInserts` partition reads a delta file itself,
  * emitting only its `I\t<row>` records — still under the same ordinal
  * masking, since a LATER delta may delete an earlier delta's insert. */
final class GraftKvReaderFactory(schemaJson: String, projectedJson: String)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    p match {
      case g: GraftKvGroupPartition =>
        // a tuple-group partition chains its member files' readers
        return new PartitionReader[InternalRow] {
          private val it = g.parts.iterator
          private var cur: PartitionReader[InternalRow] = _
          override def next(): Boolean = {
            while (true) {
              if (cur == null) {
                if (!it.hasNext) return false
                cur = createReader(it.next())
              }
              if (cur.next()) return true
              cur.close(); cur = null
            }
            false
          }
          override def get(): InternalRow = cur.get()
          override def close(): Unit = if (cur != null) cur.close()
        }
      case _ => ()
    }
    val fp = p.asInstanceOf[GraftKvFilePartition]
    val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
    val projected = DataType.fromJson(projectedJson).asInstanceOf[StructType]
    val srcIdx = projected.fields.map { f =>
      if (f.name == "_file") -1 // metadata column: the partition's own file
      else if (f.name == "_pos") -2 // metadata column: line ordinal
      else if (f.name == "_change_type") -3 // CDC: partition's change kind
      else if (f.name == "_commit_epoch") -4 // CDC: committing epoch
      else {
        // the column's PHYSICAL position via column mapping (= its index
        // on every never-renamed table); throws on an unknown column
        val fi = schema.fieldIndex(f.name)
        GraftKvSink.pidOf(schema(fi), fi)
      }
    }
    // position set over THIS partition's file, built from the partition's
    // delta names. Snapshot reads MASK these ordinals (they are deleted —
    // by D and U records alike); a CDC delete/update_preimage partition
    // EMITS exactly these ordinals instead — the pre-images, labeled by
    // changeType, selected from ONLY the matching record kind so an
    // update never double-reports as a delete.
    // r21: primitive sorted long[] + binary search, not HashSet[Long] —
    // the old set boxed `pos` into a fresh java.lang.Long per ROW probed
    // (every row of every MOR read pays it, deletes present or not). The
    // array is built once per partition from the same delta records,
    // sorted (duplicates harmless to binarySearch), and the no-deletes
    // case — most snapshot reads — collapses to one length check per row.
    val deletedPos: Array[Long] = {
      var arr = new Array[Long](16)
      var n = 0
      val kinds =
        if (!fp.cdcDeletes) "DU" else if (fp.updates) "U" else "D"
      fp.deltas.filter(_ != fp.file).foreach { d =>
        GraftKvSink.foreachDelete(fp.dir, d, kinds) { (target, pos) =>
          if (target == fp.file) {
            if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
            arr(n) = pos
            n += 1
          }
        }
      }
      val out = if (n == arr.length) arr else java.util.Arrays.copyOf(arr, n)
      java.util.Arrays.sort(out)
      out
    }
    val hasDeletes = deletedPos.length > 0
    @inline def isDeleted(pos: Long): Boolean =
      hasDeletes && java.util.Arrays.binarySearch(deletedPos, pos) >= 0
    // a delete pre-image read from a delta file targets its insert records
    val targetIsDelta = fp.cdcDeletes && fp.file.endsWith(".kvd")
    new PartitionReader[InternalRow] {
      // Per-row decode hot path, v3 (r21): the format is our own writer's —
      // UTF-8, '\n' line terminators, tabs never inside values (writer
      // `require`s), nulls as "\N" — so the reader works on RAW BYTES.
      // v1 split every line into a String[]; v2 (r20) decoded the whole
      // line to UTF-16 via Files.lines and substring'd projected fields;
      // v3 locates terminators and tabs in the byte buffer, parses numeric
      // fields through an ASCII CharSequence view (the same JDK parsers,
      // no image allocation), and copies string fields' UTF-8 bytes
      // STRAIGHT into UTF8String — the old decode-to-chars + re-encode
      // round trip was the identity on valid UTF-8. Line-terminator
      // handling mirrors Files.lines ('\n', '\r\n', bare '\r'; a final
      // unterminated line is yielded, a terminator at EOF adds none).
      private val in = Files.newInputStream(GraftKvSink.dataPath(fp.dir, fp.file))
      private var rbuf = new Array[Byte](1 << 16)
      private var rlen = 0
      private var rpos = 0
      private var atEof = false
      // spill buffer for lines crossing a read-buffer boundary; the common
      // case views the line in place inside rbuf (no copy)
      private var sbuf = new Array[Byte](256)
      // current line: larr[lbase, lend)
      private var larr: Array[Byte] = _
      private var lbase = 0
      private var lend = 0
      private var pendingSkipLf = false
      private var pos = -1L
      private def fill(): Boolean = {
        if (atEof) return false
        rlen = in.read(rbuf)
        rpos = 0
        if (rlen <= 0) { atEof = true; rlen = 0; false } else true
      }
      private def readLine(): Boolean = {
        if (pendingSkipLf) { // '\r' ended the previous chunk: eat one '\n'
          pendingSkipLf = false
          if ((rpos < rlen || fill()) && rbuf(rpos) == '\n') rpos += 1
        }
        if (rpos >= rlen && !fill()) return false
        var spilled = 0
        while (true) {
          var i = rpos
          while (i < rlen && rbuf(i) != '\n' && rbuf(i) != '\r') i += 1
          if (i < rlen) {
            if (spilled == 0) { larr = rbuf; lbase = rpos; lend = i }
            else {
              val n = i - rpos
              if (spilled + n > sbuf.length)
                sbuf = java.util.Arrays.copyOf(sbuf,
                  math.max(sbuf.length * 2, spilled + n))
              System.arraycopy(rbuf, rpos, sbuf, spilled, n)
              spilled += n
              larr = sbuf; lbase = 0; lend = spilled
            }
            val t = rbuf(i)
            rpos = i + 1
            if (t == '\r') {
              if (rpos < rlen) { if (rbuf(rpos) == '\n') rpos += 1 }
              else pendingSkipLf = true
            }
            return true
          }
          val n = rlen - rpos
          if (n > 0) {
            if (spilled + n > sbuf.length)
              sbuf = java.util.Arrays.copyOf(sbuf,
                math.max(sbuf.length * 2, spilled + n))
            System.arraycopy(rbuf, rpos, sbuf, spilled, n)
            spilled += n
          }
          rpos = rlen
          if (!fill()) { // EOF terminates the last (non-empty) line
            larr = sbuf; lbase = 0; lend = spilled
            return true
          }
        }
        false
      }
      // ASCII view over the current line for the JDK's range parsers
      // (numeric images are pure ASCII by construction)
      private val asciiView: CharSequence = new CharSequence {
        override def length(): Int = lend
        override def charAt(i: Int): Char = (larr(i) & 0xFF).toChar
        override def subSequence(a: Int, b: Int): CharSequence =
          throw new UnsupportedOperationException
      }
      private def mkString(s: Int, e: Int): String =
        new String(larr, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
      // line starts with "<m>\t" (record-kind marker probe)
      private def marked(m: Byte): Boolean =
        lend - lbase >= 2 && larr(lbase) == m && larr(lbase + 1) == '\t'
      private def tabFrom(from: Int): Int = {
        var i = from
        while (i < lend) { if (larr(i) == '\t') return i; i += 1 }
        -1
      }
      // payload offset of a delta line: I\t<row> | U\t<file>\t<pos>\t<row>
      private def payloadStart(): Int =
        if (marked('U')) {
          val p1 = tabFrom(lbase + 2)
          val p2 = tabFrom(if (p1 < 0) lbase else p1 + 1)
          if (p2 < 0) lbase else p2 + 1
        } else lbase + 2
      private val fileNameU8 = UTF8String.fromString(fp.file)
      private val changeTypeU8 =
        if (fp.changeType == null) null else UTF8String.fromString(fp.changeType)
      private val nOut = projected.fields.length
      // ONE mutable output row per partition, reused across rows (the
      // CSV/ORC reader discipline: consumers that buffer must copy —
      // Spark's scan exec projects each row to unsafe before any
      // buffering operator sees it). Typed holders mean numeric fields
      // are SET, not boxed; the per-partition-constant metadata columns
      // (_file, _change_type, _commit_epoch) are written once here.
      private val mrow =
        new org.apache.spark.sql.catalyst.expressions.SpecificInternalRow(
          projected.fields.map(_.dataType).toSeq)
      private val outTags: Array[Int] = projected.fields.map(_.dataType match {
        case IntegerType        => 0
        case LongType           => 1
        case TimestampType | TimestampNTZType => 1 // internal micros
        case DateType           => 0 // internal epoch days
        case DoubleType         => 2
        case FloatType          => 3
        case BooleanType        => 4
        case _: DecimalType     => 5
        case _: ArrayType       => 6
        case StringType         => 7
        case dt => throw new IllegalStateException(s"unsupported $dt")
      })
      private val outDecPrec = projected.fields.map(_.dataType match {
        case d: DecimalType => d.precision; case _ => 0
      })
      private val outDecScale = projected.fields.map(_.dataType match {
        case d: DecimalType => d.scale; case _ => 0
      })
      private val outElemType = projected.fields.map(_.dataType match {
        case a: ArrayType => a.elementType; case _ => null
      })
      private val maxSrc = if (srcIdx.isEmpty) -1 else srcIdx.max
      locally { // per-partition-constant metadata ordinals, set once
        var o = 0
        while (o < nOut) {
          srcIdx(o) match {
            case -1 => mrow.update(o, fileNameU8)
            case -3 =>
              if (changeTypeU8 == null) mrow.setNullAt(o)
              else mrow.update(o, changeTypeU8)
            case -4 => mrow.setLong(o, fp.commitEpoch)
            case _  => ()
          }
          o += 1
        }
      }
      // starts(k)/ends(k) bound physical field k's image in the line
      private val starts = new Array[Int](math.max(maxSrc + 1, 1))
      private val ends = new Array[Int](math.max(maxSrc + 1, 1))
      // number of complete fields located (fields with index < nFound are
      // valid); a line holding fewer fields than maxSrc+1 is an old row
      // written before a column was added — those ordinals null-fill.
      // Offsets are absolute positions in larr.
      private def locate(pstart: Int): Int = {
        var k = 0
        var from = pstart
        while (k <= maxSrc) {
          starts(k) = from
          var t = from
          while (t < lend && larr(t) != '\t') t += 1
          if (t >= lend) { ends(k) = lend; return k + 1 }
          ends(k) = t
          from = t + 1
          k += 1
        }
        k
      }
      override def next(): Boolean = {
        while (readLine()) {
          pos += 1L
          val live =
            if (fp.cdcDeletes)
              // pre-image rows in a delta target are its I or U payloads
              isDeleted(pos) && (!targetIsDelta ||
                marked('I') || marked('U'))
            else if (fp.deltaInserts)
              // snapshot delta read surfaces I and U payloads alike; CDC
              // splits them: `insert` partitions read I, `update_postimage`
              // partitions read U
              !isDeleted(pos) &&
                (if (fp.changeType == null) marked('I') || marked('U')
                else if (fp.updates) marked('U')
                else marked('I'))
            else !isDeleted(pos)
          if (live) return true
        }
        false
      }
      override def get(): InternalRow = {
        val ps =
          if (fp.deltaInserts || targetIsDelta) payloadStart()
          else lbase
        val nFound = if (maxSrc < 0) 0 else locate(ps)
        var o = 0
        while (o < nOut) {
          val si = srcIdx(o)
          if (si == -2) mrow.setLong(o, pos)
          else if (si >= 0) {
            // (metadata ordinals -1/-3/-4 were preset at construction)
            if (si >= nFound) mrow.setNullAt(o) // schema-evolved
            // column appended after this row was written: null-fill (the
            // add-column contract — old rows have no value)
            else {
              val s = starts(si)
              val e = ends(si)
              // "\N" null marker checked in place; numeric/boolean fields
              // parse from the line's byte range directly; double/float/
              // decimal/array need a String image (no range parse exists);
              // string fields copy their UTF-8 bytes without re-encoding
              if (e - s == 2 && larr(s) == '\\' && larr(s + 1) == 'N')
                mrow.setNullAt(o)
              else outTags(o) match {
                case 0 =>
                  mrow.setInt(o, java.lang.Integer.parseInt(asciiView, s, e, 10))
                case 1 =>
                  mrow.setLong(o, java.lang.Long.parseLong(asciiView, s, e, 10))
                case 2 => mrow.setDouble(o, mkString(s, e).toDouble)
                case 3 => mrow.setFloat(o, mkString(s, e).toFloat)
                case 4 =>
                  // writer emits Boolean.toString: exactly "true"/"false";
                  // match StringOps.toBoolean's case-insensitive accept +
                  // throw-on-garbage contract without allocating ('|32'
                  // lowercases ASCII letters and nothing else matches)
                  if (e - s == 4 && (larr(s) | 32) == 't' &&
                      (larr(s + 1) | 32) == 'r' && (larr(s + 2) | 32) == 'u' &&
                      (larr(s + 3) | 32) == 'e') mrow.setBoolean(o, true)
                  else if (e - s == 5 && (larr(s) | 32) == 'f' &&
                      (larr(s + 1) | 32) == 'a' && (larr(s + 2) | 32) == 'l' &&
                      (larr(s + 3) | 32) == 's' && (larr(s + 4) | 32) == 'e')
                    mrow.setBoolean(o, false)
                  else mrow.setBoolean(o, mkString(s, e).toBoolean)
                case 5 => mrow.update(o, org.apache.spark.sql.types.Decimal(
                  new java.math.BigDecimal(mkString(s, e)),
                  outDecPrec(o), outDecScale(o)))
                case 6 => mrow.update(o, GraftKvSink.parseArrayCell(
                  outElemType(o), mkString(s, e)))
                case _ =>
                  // one leading backslash is the escape for a literal
                  // leading backslash (writer doubles it)
                  val b = if (s < e && larr(s) == '\\') s + 1 else s
                  mrow.update(o, UTF8String.fromBytes(
                    java.util.Arrays.copyOfRange(larr, b, e)))
              }
            }
          }
          o += 1
        }
        mrow
      }
      override def close(): Unit = in.close()
    }
  }
}
