package graft.sources

import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Declarative partitioning for graft_kv tables — the Iceberg partition-
  * transform family (identity, bucket(n, col), truncate(w, col), and the
  * temporal transforms days/months/years/hours over TIMESTAMP/DATE
  * columns) adapted to the connector's type system
  * (int/long/double/string/timestamp/date).
  *
  * The layout contract is Iceberg's, not Hive's: partition values live in
  * the MANIFEST (per-file `part:<transform>` entries in the stats map),
  * never in directory names — each data file holds rows of exactly one
  * partition tuple, and the scan prunes files by evaluating pushed
  * predicates against the recorded tuples. Files WITHOUT a tuple entry
  * (pre-partitioning history, clone-foreign files, a MOR-squashed
  * compaction target) are never pruned by partition predicates — absent
  * metadata degrades to "read it", the same soundness rule the min/max
  * stats follow. That rule is also what makes the spec evolvable: old
  * files keep working untagged.
  *
  * Transform semantics (all over the value's canonical string encoding —
  * the same one the data files and per-file stats use, so writer and
  * pruner can never disagree):
  *  - identity:        the encoded value itself
  *  - bucket(n, col):  floorMod(murmur3(utf8 bytes), n) — deterministic
  *    across JVMs, so independent writers agree on routing
  *  - truncate(w, col): ints/longs floor to w-sized ranges (Iceberg's
  *    v - floorMod(v, w)), strings truncate to w codepoints — both
  *    monotonic, so range predicates prune too
  * NULL partition values route to the reserved "\\N" tuple — the same
  * marker the row encoding uses — letting null-rejecting predicates
  * prune all-null partitions outright. */
object GraftPartition {
  val PartKey = "part:" // stats-map key prefix for per-file tuple entries

  sealed trait PTransform {
    def source: String
    /** the source column's type — every transform needs it to
      * canonicalize FILTER values (external java.sql/java.time objects or
      * Catalyst-internal micros/days longs) into the same string encoding
      * the data files use. */
    def dt: DataType
    /** canonical spec string, e.g. "c", "bucket(4,c)", "truncate(7,c)" */
    def key: String
    /** transform output for an encoded source value (null input = SQL
      * NULL source -> the "\\N" tuple) */
    def apply(enc: String): String
    /** is p (a recorded tuple value) <= q in the transform's output
      * order? Only meaningful for monotonic transforms. */
    def monotonic: Boolean
    /** A FLOOR transform maps each source value to the minimum of a
      * contiguous bucket (truncate on ints, days/months/years/hours on
      * time types): `t(r) < t(v)` then implies `r < v` and `t(r) > t(v)`
      * implies `r > v`, which is what lets [[allMatch]] prove a whole
      * file inside a RANGE predicate — the metadata-only retention
      * DELETE ("drop everything before day X") at 100 TB. */
    def floorBucket: Boolean = false
    /** For floor transforms: is the (canonicalized) comparison value
      * exactly at its bucket's lower boundary? At a boundary,
      * `t(r) >= t(v)` additionally proves `r >= v`. */
    def alignedAt(canon: String): Boolean = false
    def statsKey: String = PartKey + key
  }

  final case class PIdentity(source: String, dt: DataType) extends PTransform {
    val key: String = source
    def apply(enc: String): String =
      if (enc == null) "\\N" else GraftPartition.esc(enc)
    val monotonic = true
    // identity is the degenerate floor: every bucket holds exactly one
    // value, so every value sits at (and is) its bucket boundary
    override val floorBucket = true
    override def alignedAt(canon: String): Boolean = true
  }

  final case class PBucket(n: Int, source: String, dt: DataType)
    extends PTransform {
    require(n > 0, s"graft_kv: bucket count must be > 0, got $n")
    val key: String = s"bucket($n,$source)"
    def apply(enc: String): String =
      if (enc == null) "\\N" else bucketOf(enc, n).toString
    val monotonic = false
  }

  /** Iceberg's temporal transforms: UTC bucket ordinals from the
    * connector's canonical time encodings (TIMESTAMP = Catalyst micros,
    * DATE = epoch days). All are monotonic floors, so range predicates
    * both prune ([[mayMatch]]) and prove whole-file containment
    * ([[allMatch]]). `hours` applies to TIMESTAMP only (a date has no
    * sub-day resolution — the Iceberg rule). */
  final case class PTime(unit: String, source: String, dt: DataType)
    extends PTransform {
    val key: String = s"$unit($source)"
    private def micros(enc: String): Long = dt match {
      case DateType => enc.toLong * MicrosPerDay // days -> UTC midnight
      case _        => enc.toLong // TIMESTAMP / TIMESTAMP_NTZ micros
    }
    private def bucket(enc: String): Long = {
      val us = micros(enc)
      unit match {
        case "hours" => java.lang.Math.floorDiv(us, 3600000000L)
        case "days"  => java.lang.Math.floorDiv(us, MicrosPerDay)
        case _ =>
          val d = java.time.LocalDate.ofEpochDay(
            java.lang.Math.floorDiv(us, MicrosPerDay))
          val months = (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
          if (unit == "months") months.toLong
          else java.lang.Math.floorDiv(months.toLong, 12L) // years
      }
    }
    def apply(enc: String): String =
      if (enc == null) "\\N" else bucket(enc).toString
    val monotonic = true
    override val floorBucket = true
    override def alignedAt(canon: String): Boolean = {
      val us = micros(canon)
      unit match {
        case "hours" => java.lang.Math.floorMod(us, 3600000000L) == 0L
        case "days"  => java.lang.Math.floorMod(us, MicrosPerDay) == 0L
        case _ =>
          java.lang.Math.floorMod(us, MicrosPerDay) == 0L && {
            val d = java.time.LocalDate.ofEpochDay(
              java.lang.Math.floorDiv(us, MicrosPerDay))
            d.getDayOfMonth == 1 && (unit == "months" || d.getMonthValue == 1)
          }
      }
    }
  }

  private val MicrosPerDay = 86400000000L

  final case class PTruncate(w: Int, source: String, dt: DataType)
    extends PTransform {
    require(w > 0, s"graft_kv: truncate width must be > 0, got $w")
    val key: String = s"truncate($w,$source)"
    def apply(enc: String): String =
      if (enc == null) "\\N"
      else dt match {
        case IntegerType | LongType =>
          val v = enc.toLong
          (v - java.lang.Math.floorMod(v, w.toLong)).toString
        case _ => // string: first w codepoints
          val cp = enc.codePointCount(0, enc.length)
          GraftPartition.esc(
            if (cp <= w) enc
            else enc.substring(0, enc.offsetByCodePoints(0, w)))
      }
    val monotonic = true
    // numeric truncation floors to w-sized ranges; string truncation is a
    // PREFIX, not a floor over a total order with gaps — ranges prune but
    // never prove containment
    override val floorBucket: Boolean = dt match {
      case IntegerType | LongType => true
      case _                      => false
    }
    override def alignedAt(canon: String): Boolean = floorBucket &&
      java.lang.Math.floorMod(canon.toLong, w.toLong) == 0L
  }

  /** A real string value beginning with a backslash doubles its LEAD
    * character in the tuple (the row encoding's own rule), so the
    * literal two-character value backslash-N can never collide with the
    * reserved "\\N" null tuple. Doubling only the first char preserves
    * UTF8 binary order, so monotonic (range) pruning stays correct. */
  private def esc(s: String): String =
    if (s.startsWith("\\")) "\\" + s else s

  private[graft] def bucketOf(enc: String, n: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.bytesHash(
        enc.getBytes(java.nio.charset.StandardCharsets.UTF_8), 42), n)

  /** A file's recorded tuple entries, straight from its stats map. */
  def filePartsOf(stats: Map[String, (String, String)]): Map[String, String] =
    stats.collect { case (k, (v, _)) if k.startsWith(PartKey) => k -> v }

  /** The transforms a file's own tuple keys name, parsed against the
    * schema through a shared per-plan cache (a handful of distinct keys
    * however many files). A key that no longer parses (e.g. its source
    * column was renamed away) yields nothing — and a transform that is
    * not parsed never prunes, the standing soundness rule. */
  def fileSpecOf(parts: Map[String, String], schema: StructType,
      cache: scala.collection.mutable.Map[String, Option[PTransform]])
      : Seq[PTransform] =
    parts.keys.toSeq.sorted.flatMap(k => cache.getOrElseUpdate(k,
      try Some(parseOne(k.stripPrefix(PartKey), schema))
      catch { case _: Exception => None }))

  /** Parse the persisted comma-separated spec against a schema. */
  def parse(spec: Seq[String], schema: StructType): Seq[PTransform] =
    spec.map(parseOne(_, schema))

  /** The spec/tuple key string with its source column renamed (RENAME
    * COLUMN re-keys layout metadata in one metadata publish; the
    * transform shape is untouched). None when the key does not source
    * `from` — or no longer parses against `schema` at all (an
    * evolved-away key whose source was itself renamed earlier stays
    * as-is: it already never prunes). Parse against the PRE-rename
    * schema. */
  def renameKey(key: String, schema: StructType, from: String,
      to: String): Option[String] = {
    val t = try parseOne(key, schema)
      catch { case _: IllegalArgumentException => return None }
    if (!t.source.equalsIgnoreCase(from)) None
    else Some(t match {
      case PIdentity(_, _)    => to.toLowerCase
      case PBucket(n, _, _)   => s"bucket($n,${to.toLowerCase})"
      case PTruncate(w, _, _) => s"truncate($w,${to.toLowerCase})"
      case PTime(u, _, _)     => s"$u(${to.toLowerCase})"
    })
  }

  /** Split a comma-joined spec at TOP-LEVEL commas only — "bucket(4,id)"
    * carries a comma of its own. */
  def splitSpec(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 =>
        if (cur.toString.trim.nonEmpty) out += cur.toString.trim
        cur.clear()
      case c => cur.append(c)
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private val BucketRe = """(?i)bucket\s*\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TruncRe = """(?i)truncate\s*\(\s*(\d+)\s*,\s*([^)]+?)\s*\)""".r
  private val TimeRe = """(?i)(days|months|years|hours)\s*\(\s*([^)]+?)\s*\)""".r

  def parseOne(s: String, schema: StructType): PTransform = s.trim match {
    case BucketRe(n, c) =>
      val (name, dt) = colOf(c, schema)
      validated(PBucket(n.toInt, name, dt))
    case TruncRe(w, c) =>
      val (name, dt) = colOf(c, schema)
      validated(PTruncate(w.toInt, name, dt))
    case TimeRe(u, c) =>
      val (name, dt) = colOf(c, schema)
      validated(PTime(u.toLowerCase, name, dt))
    case c =>
      val (name, dt) = colOf(c, schema)
      validated(PIdentity(name, dt))
  }

  private def colOf(c: String, schema: StructType): (String, DataType) = {
    val f = schema.fields.find(_.name.equalsIgnoreCase(c.trim)).getOrElse(
      throw new IllegalArgumentException(
        s"graft_kv: partition column '${c.trim}' is not in the table " +
          s"schema (${schema.fieldNames.mkString(", ")})"))
    (f.name.toLowerCase, f.dataType)
  }

  private def validated(t: PTransform): PTransform = t match {
    // arrays have no transform output: no order (identity/truncate),
    // and bucketing a whole variable-length cell invites accidental
    // skew for no pruning value — refuse every shape (SURVEY §7.46)
    case _ if t.dt.isInstanceOf[ArrayType] =>
      throw new IllegalArgumentException(
        s"graft_kv: partition transforms do not apply to ARRAY column " +
          s"'${t.source}' — arrays have no transform output")
    case PTruncate(_, _,
        DoubleType | FloatType | TimestampType | TimestampNTZType |
        DateType | BooleanType | _: DecimalType) =>
      throw new IllegalArgumentException(
        s"graft_kv: truncate() does not apply to ${t.dt.simpleString} " +
          s"column '${t.source}' (use days/months/years/hours for time)")
    case PTime("hours", _, DateType) => throw new IllegalArgumentException(
      s"graft_kv: hours() needs a TIMESTAMP column, '${t.source}' is a DATE")
    case PTime(_, _, dt) if dt != TimestampType &&
        dt != TimestampNTZType && dt != DateType =>
      throw new IllegalArgumentException(
        s"graft_kv: ${t.key} needs a TIMESTAMP or DATE column, " +
          s"'${t.source}' is ${dt.simpleString}")
    case PBucket(_, _, _) => t // bucket hashes the canonical encoding: any type
    case _ => t
  }

  /** Catalog route: Spark's PARTITIONED BY transforms -> spec strings. */
  def fromTransforms(ts: Seq[Transform], schema: StructType): Seq[String] =
    ts.map { t =>
      val refs = t.references()
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"graft_kv: partition transform ${t.describe()} must reference " +
          "exactly one top-level column")
      val col = refs(0).fieldNames()(0)
      def intArg: Int = t.arguments().collectFirst {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value() != null => l.value().toString.toInt
      }.getOrElse(throw new IllegalArgumentException(
        s"graft_kv: ${t.name()} transform needs an integer argument"))
      val spec = t.name().toLowerCase match {
        case "identity" => col
        case "bucket"   => s"bucket($intArg,$col)"
        case "truncate" => s"truncate($intArg,$col)"
        case u @ ("days" | "months" | "years" | "hours" | "day" | "month" |
                  "year" | "hour") =>
          // Spark parses both spellings (days(c) and day(c)); canonical
          // spec uses the plural Iceberg names
          val unit = if (u.endsWith("s")) u else u + "s"
          s"$unit($col)"
        case other => throw new UnsupportedOperationException(
          s"graft_kv: unsupported partition transform '$other' — " +
            "supported: identity, bucket(n, col), truncate(w, col), " +
            "days/months/years/hours(col)")
      }
      parseOne(spec, schema).key // validate + canonicalize
    }

  /** Report the spec back through Table.partitioning(). */
  def toTransforms(spec: Seq[String], schema: StructType): Array[Transform] =
    parse(spec, schema).map {
      case PIdentity(c, _)      => Expressions.identity(c)
      case PBucket(n, c, _)     => Expressions.bucket(n, c)
      case PTruncate(w, c, _) => Expressions.apply("truncate",
        Expressions.literal(w), Expressions.column(c))
      case PTime(u, c, _) => Expressions.apply(u, Expressions.column(c))
    }.toArray

  /** Typed "a <= b" in the transform's OUTPUT order (numbers for numeric
    * truncation/identity/time buckets, UTF8 binary order for strings —
    * matching the stats pruner's `le`). */
  private def le(t: PTransform, a: String, b: String): Boolean = {
    val numeric = t match {
      case PIdentity(_, IntegerType | LongType | TimestampType |
                        TimestampNTZType | DateType) => true
      case PIdentity(_, DoubleType)               => return a.toDouble <= b.toDouble
      case PIdentity(_, FloatType)                => return a.toFloat <= b.toFloat
      case PIdentity(_, _: DecimalType) => return new java.math.BigDecimal(a)
        .compareTo(new java.math.BigDecimal(b)) <= 0
      // BOOLEAN identity: "false" < "true" in UTF-8 order — the default
      case PTruncate(_, _, IntegerType | LongType) => true
      case PTime(_, _, _)                           => true
      case _                                       => false
    }
    if (numeric) a.toLong <= b.toLong
    else UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) <= 0
  }

  /** A filter value's canonical string image for transform input —
    * time-typed values arrive as EXTERNAL java.sql/java.time objects on
    * the v1 pushFilters route and as Catalyst-INTERNAL micros/days
    * numbers on the v2-translated route; both must land on the encoding
    * the data files carry ([[GraftKvSink.canonValue]]). */
  private def canon(t: PTransform, v: Any): String =
    GraftKvSink.canonValue(t.dt, v)

  /** Does EVERY row of a file with recorded tuple `parts` satisfy the
    * filter? The partition-overwrite / metadata-DELETE classifier's
    * "drop this whole file" proof. EQUALITY proofs need an IDENTITY
    * transform (a bucket residue or floored range equality says nothing
    * about individual values); RANGE proofs extend to every FLOOR
    * transform — a file whose days(ts) bucket sits strictly below the
    * probe's bucket is wholly `ts < v`, which is what makes
    * `DELETE WHERE ts < <horizon>` on a days-partitioned table a pure
    * manifest edit (the 100 TB retention path reads zero data files).
    * Conservative: false whenever unprovable. */
  def allMatch(spec: Seq[PTransform], parts: Map[String, String],
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def ident(col: String): Option[(PTransform, String)] =
      spec.collectFirst {
        case t @ PIdentity(srcName, _) if srcName.equalsIgnoreCase(col) =>
          parts.get(t.statsKey).map(t -> _)
      }.flatten
    // the first floor transform on the column with a recorded tuple (an
    // identity one, if present, proves the most — but any floor suffices
    // for the arms below, and a file records one tuple per transform)
    def floor(col: String): Option[(PTransform, String)] =
      spec.collectFirst {
        case t if t.floorBucket && t.source.equalsIgnoreCase(col) &&
          parts.contains(t.statsKey) => (t, parts(t.statsKey))
      }
    def eq(col: String, v: Any): Boolean =
      v != null && ident(col).exists { case (t, p) =>
        p != "\\N" && p == t.apply(canon(t, v)) }
    // an unparseable canonical value image (canon falls through to
    // String.valueOf) cannot PROVE anything — decline, don't throw
    try f match {
      case EqualTo(c, v)       => eq(c, v)
      case EqualNullSafe(c, v) =>
        if (v == null) ident(c).exists(_._2 == "\\N") else eq(c, v)
      case In(c, vs)           => vs.nonEmpty && vs.forall(_ != null) &&
        ident(c).exists { case (t, p) =>
          p != "\\N" && vs.exists(v => p == t.apply(canon(t, v))) }
      case IsNull(c)           => ident(c).exists(_._2 == "\\N")
      case IsNotNull(c)        => ident(c).exists(_._2 != "\\N")
      // floor-bucket range proofs: every row r in the file has t(r) = p.
      //   p > t(v)              ⟹ r > v   (strict floor monotonicity)
      //   p == t(v), v aligned  ⟹ r >= bucket-min = v
      //   p < t(v)              ⟹ r < v
      //   p == t(v), unit bucket⟹ r == v  (identity only, for <=)
      case GreaterThan(c, v) => v != null && floor(c).exists { case (t, p) =>
        p != "\\N" && { val bv = t.apply(canon(t, v))
          le(t, bv, p) && p != bv } }
      case GreaterThanOrEqual(c, v) => v != null && floor(c).exists {
        case (t, p) => p != "\\N" && { val cv = canon(t, v)
          val bv = t.apply(cv)
          le(t, bv, p) && (p != bv || t.alignedAt(cv)) } }
      case LessThan(c, v) => v != null && floor(c).exists { case (t, p) =>
        p != "\\N" && { val bv = t.apply(canon(t, v))
          le(t, p, bv) && p != bv } }
      case LessThanOrEqual(c, v) => v != null && floor(c).exists {
        case (t, p) => p != "\\N" && { val bv = t.apply(canon(t, v))
          // at p == t(v) only identity's unit bucket bounds rows above by
          // v; a wider bucket may hold rows past v
          (le(t, p, bv) && p != bv) ||
            (p == bv && t.isInstanceOf[PIdentity]) } }
      case And(l, r) => allMatch(spec, parts, l) && allMatch(spec, parts, r)
      case Or(l, r)  => allMatch(spec, parts, l) || allMatch(spec, parts, r)
      case Not(inner) => !mayMatch(spec, parts, inner) // no row CAN match it
      case _ => false
    } catch { case _: NumberFormatException => false }
  }

  /** Translate a DSv2 Predicate to the v1 Filter shapes the partition
    * machinery speaks — only the classifiable forms; anything else maps
    * to None (callers decline to the row-level path). Values convert
    * from Catalyst-internal representations (UTF8String) to the JVM
    * types v1 Filters carry. */
  def v2ToV1(p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.connector.expressions.{Literal => VLit, NamedReference}
    import org.apache.spark.sql.connector.expressions.filter.{And => VAnd, Not => VNot, Or => VOr, Predicate}
    import org.apache.spark.sql.sources._
    def jvm(l: VLit[_]): Any = l.value() match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case other                                       => other
    }
    def colOnly(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case r: NamedReference if r.fieldNames().length == 1 =>
        Some(r.fieldNames()(0))
      case _ => None
    }
    // (column, value, columnIsLeft) for binary comparisons
    def binary(): Option[(String, Any, Boolean)] = p.children() match {
      case Array(l, r) => (l, r) match {
        case (c, v: VLit[_]) => colOnly(c).map(n => (n, jvm(v), true))
        case (v: VLit[_], c) => colOnly(c).map(n => (n, jvm(v), false))
        case _               => None
      }
      case _ => None
    }
    p match {
      case a: VAnd =>
        for (l <- v2ToV1(a.left()); r <- v2ToV1(a.right())) yield And(l, r)
      case o: VOr =>
        for (l <- v2ToV1(o.left()); r <- v2ToV1(o.right())) yield Or(l, r)
      case n: VNot => v2ToV1(n.child()).map(Not)
      case _ => p.name() match {
        case "=" => binary().map { case (c, v, _) => EqualTo(c, v) }
        case "<=>" => binary().map { case (c, v, _) => EqualNullSafe(c, v) }
        case "<" => binary().map { case (c, v, cl) =>
          if (cl) LessThan(c, v) else GreaterThan(c, v) }
        case ">" => binary().map { case (c, v, cl) =>
          if (cl) GreaterThan(c, v) else LessThan(c, v) }
        case "<=" => binary().map { case (c, v, cl) =>
          if (cl) LessThanOrEqual(c, v) else GreaterThanOrEqual(c, v) }
        case ">=" => binary().map { case (c, v, cl) =>
          if (cl) GreaterThanOrEqual(c, v) else LessThanOrEqual(c, v) }
        case "IN" => p.children() match {
          case cs if cs.nonEmpty =>
            for {
              col <- colOnly(cs.head)
              vs <- Some(cs.tail.collect { case l: VLit[_] => jvm(l) })
              if vs.length == cs.tail.length
            } yield In(col, vs.toArray)
          case _ => None
        }
        case "IS_NULL" =>
          p.children() match {
            case Array(c) => colOnly(c).map(IsNull)
            case _        => None
          }
        case "IS_NOT_NULL" =>
          p.children() match {
            case Array(c) => colOnly(c).map(IsNotNull)
            case _        => None
          }
        case _ => None
      }
    }
  }

  /** Render a pushed Filter back to SQL text (the overwrite guard's feed:
    * incoming rows are checked per row against the replaced region's
    * predicate). Only the shapes the classifier accepts. */
  def filterSql(f: org.apache.spark.sql.sources.Filter): String = {
    import org.apache.spark.sql.sources._
    def lit(v: Any): String = v match {
      case null      => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      // time values render zone-free: timestamp_micros() takes the exact
      // canonical micros (a TIMESTAMP '…' literal would re-parse in the
      // session zone), DATE literals are calendar-exact by construction
      case t: java.sql.Timestamp =>
        s"timestamp_micros(${org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t)}L)"
      case i: java.time.Instant =>
        s"timestamp_micros(${org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i)}L)"
      case d: java.sql.Date => s"DATE '${java.time.LocalDate.ofEpochDay(
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(d).toLong)}'"
      case d: java.time.LocalDate => s"DATE '$d'"
      case d: java.time.LocalDateTime => // external TIMESTAMP_NTZ shape
        s"timestamp_ntz '"+d.toString.replace('T', ' ')+"'"
      case other     => String.valueOf(other)
    }
    f match {
      case EqualTo(c, v)            => s"`$c` = ${lit(v)}"
      case EqualNullSafe(c, v)      => s"`$c` <=> ${lit(v)}"
      case In(c, vs)                => s"`$c` IN (${vs.map(lit).mkString(", ")})"
      case IsNull(c)                => s"`$c` IS NULL"
      case IsNotNull(c)             => s"`$c` IS NOT NULL"
      case GreaterThan(c, v)        => s"`$c` > ${lit(v)}"
      case GreaterThanOrEqual(c, v) => s"`$c` >= ${lit(v)}"
      case LessThan(c, v)           => s"`$c` < ${lit(v)}"
      case LessThanOrEqual(c, v)    => s"`$c` <= ${lit(v)}"
      case And(l, r)                => s"(${filterSql(l)}) AND (${filterSql(r)})"
      case Or(l, r)                 => s"(${filterSql(l)}) OR (${filterSql(r)})"
      case Not(i)                   => s"NOT (${filterSql(i)})"
      case other => throw new UnsupportedOperationException(
        s"graft_kv: INSERT OVERWRITE predicate shape $other is not " +
          "supported (use partition-aligned equality/range predicates)")
    }
  }

  /** Can a file whose recorded partition tuple includes the `parts`
    * entries contain a row satisfying the filter? Conservative on every
    * axis: transforms with no recorded entry never prune; unknown filter
    * shapes never prune; null tuple ("\\N") is pruned exactly by
    * null-rejecting predicates. */
  def mayMatch(spec: Seq[PTransform], parts: Map[String, String],
      f: org.apache.spark.sql.sources.Filter): Boolean = {
    import org.apache.spark.sql.sources._
    def relevant(col: String): Seq[(PTransform, String)] =
      spec.filter(_.source.equalsIgnoreCase(col))
        .flatMap(t => parts.get(t.statsKey).map(t -> _))
    def couldEqual(col: String, v: Any): Boolean =
      v != null && relevant(col).forall { case (t, p) =>
        p != "\\N" && p == t.apply(canon(t, v))
      }
    // unparseable value image (canon's String.valueOf fallthrough) →
    // cannot prune; matching the stats pruner's conservative rule
    try f match {
      case EqualTo(c, v)       => couldEqual(c, v)
      case EqualNullSafe(c, v) =>
        if (v == null) relevant(c).forall(_._2 == "\\N")
        else couldEqual(c, v)
      case In(c, vs)           => vs.exists(couldEqual(c, _))
      case IsNull(c)           => relevant(c).forall(_._2 == "\\N")
      case IsNotNull(c)        => relevant(c).forall(_._2 != "\\N")
      // monotonic transforms order-prune: row > v implies t(row) >= t(v)
      case GreaterThan(c, v) => v != null && relevant(c).forall { case (t, p) =>
        !t.monotonic || (p != "\\N" && le(t, t.apply(canon(t, v)), p))
      }
      case GreaterThanOrEqual(c, v) => v != null && relevant(c).forall {
        case (t, p) =>
          !t.monotonic || (p != "\\N" && le(t, t.apply(canon(t, v)), p))
      }
      case LessThan(c, v) => v != null && relevant(c).forall { case (t, p) =>
        !t.monotonic || (p != "\\N" && le(t, p, t.apply(canon(t, v))))
      }
      case LessThanOrEqual(c, v) => v != null && relevant(c).forall {
        case (t, p) =>
          !t.monotonic || (p != "\\N" && le(t, p, t.apply(canon(t, v))))
      }
      case And(l, r) => mayMatch(spec, parts, l) && mayMatch(spec, parts, r)
      case Or(l, r)  => mayMatch(spec, parts, l) || mayMatch(spec, parts, r)
      case _         => true
    } catch { case _: NumberFormatException => true }
  }
}
