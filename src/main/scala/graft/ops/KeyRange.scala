package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Storage-layer analogues of the reference's rowkey machinery
  * (SURVEY.md §2A rows A2/A6/A7).
  *
  * Astro prunes HBase regions from composite-rowkey predicates
  * ("critical point" analysis) and bulk-loads via a range-shuffle sorted on
  * the rowkey aligned to region boundaries [ref*: …/hbase/CriticalPoint.scala,
  * …/hbase/execution/hbaseCommands.scala — mount empty, public-knowledge
  * citation per SURVEY.md §0]. The Spark-native equivalents: composite-key
  * range predicates that parquet row-group stats prune natively, and
  * `repartitionByRange + sortWithinPartitions` writes — the same
  * range-shuffle + sorted-file shape HFile bulk load uses.
  */
/** Typed row of the kv-connector typed-surface query (top-level so the
  * case-class Encoder derives through a plain TypeTag). */
case class TypedOrder(o_orderkey: Long, o_orderstatus: String,
    o_totalprice: Double)

/** Typed aggregation buffer: exact decimal sum carried as its plain
  * string image (BigDecimal addition is exact, hence associative AND
  * commutative — merge order across partitions cannot change the
  * result). */
case class PriceBuf(cnt: Long, total: String)

/** The typed-surface custom aggregate (SURVEY §1.2's `Aggregator` row):
  * a Dataset[TypedOrder]-level sum that matches the relational
  * CAST(sum(CAST(x AS DECIMAL)) AS DOUBLE) fold bit-for-bit. */
object StatusPriceAgg extends org.apache.spark.sql.expressions
    .Aggregator[TypedOrder, PriceBuf, PriceBuf] {
  private def bd(s: String) = new java.math.BigDecimal(s)
  override def zero: PriceBuf = PriceBuf(0L, "0")
  override def reduce(b: PriceBuf, r: TypedOrder): PriceBuf =
    PriceBuf(b.cnt + 1L, bd(b.total).add(new java.math.BigDecimal(
      java.lang.Double.toString(r.o_totalprice))).toPlainString)
  override def merge(a: PriceBuf, b: PriceBuf): PriceBuf =
    PriceBuf(a.cnt + b.cnt, bd(a.total).add(bd(b.total)).toPlainString)
  override def finish(b: PriceBuf): PriceBuf = b
  override def bufferEncoder: org.apache.spark.sql.Encoder[PriceBuf] =
    org.apache.spark.sql.Encoders.product[PriceBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[PriceBuf] =
    org.apache.spark.sql.Encoders.product[PriceBuf]
}

object KeyRange {

  /** Per-JVM-unique scratch root: concurrent Verify/Bench processes must not
    * overwrite each other's round-trip files (same dataset → same hash would
    * otherwise race Overwrite against read). */
  private val scratch: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scratch_")
    dir.toFile.deleteOnExit()
    dir.toString
  }

  /** Reset a scratch path (kv table dirs, stream checkpoints) so repeat
    * runs in one JVM start from no history — recursive, so checkpoint
    * subtrees (offsets/, commits/) and any future layout go too. */
  private def clearDir(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(path))
  }

  /** A2: composite-rowkey range scan (l_orderkey, l_linenumber) — the filter
    * reaches the parquet scan as PushedFilters on the leading key column. */
  def keyrangeScan(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter((col("l_orderkey") > 1000) ||
        (col("l_orderkey") === 1000 && col("l_linenumber") >= 2))
      .filter((col("l_orderkey") < 3000) ||
        (col("l_orderkey") === 3000 && col("l_linenumber") <= 3))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      // (l_orderkey, l_linenumber) is not unique — total-order over the row.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** A2 extension: SECONDARY INDEX — the classic HBase-ecosystem answer to
    * "filter on a non-rowkey column without a full table scan" (Huawei's
    * HIndex line of work; the reference itself only prunes on the rowkey).
    * Spark-native shape: the index is a slim (indexed-value, rowkey)
    * projection written range-clustered + sorted on the indexed value, so a
    * point/range predicate on that value prunes to a handful of row groups
    * via parquet min/max stats — the index probe reads O(matches), not
    * O(table). The matched rowkey set is then semi-joined back into the
    * base table with an explicit broadcast (a selective probe yields a tiny
    * key set no matter how large the base is), which at 100 TB is the
    * index-lookup-then-point-get plan, with the base side's own rowkey
    * pushdown doing the point gets. Oracle = the plain predicate on the
    * base table, so index-path results are hash-gated against the
    * full-scan semantics. */
  def secondaryIndex(s: SparkSession, d: String): DataFrame = {
    val idx = s"$scratch/sec_index"
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"))
      .repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode(SaveMode.Overwrite).parquet(idx)
    val keys = s.read.parquet(idx)
      .filter(col("o_custkey").isin(7L, 42L, 101L))
      .select(col("o_orderkey"))
    Tables.orders(s, d)
      .join(broadcast(keys), Seq("o_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** A6: INSERT INTO … SELECT — write a filtered projection, read it back. */
  def insertSelect(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/insert_select"
    Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    s.read.parquet(tmp)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** A6 (second half): INSERT INTO … VALUES — literal rows written through
    * the same sink path as insert_select, then read back. The oracle is the
    * identical VALUES list, so the round trip is correctness-gated. */
  def insertValues(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"$scratch/insert_values"
    Seq(
      (1L, "alpha", 10.25), (2L, "beta", -3.5), (3L, "gamma", 99.0),
      (4L, "delta", 0.125), (5L, "epsilon", 7.75))
      .toDF("id", "tag", "val")
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    s.read.parquet(tmp).orderBy(col("id"))
  }

  /** A7: bulk-load shape — range-shuffle on the key, sort within partitions,
    * write, re-read. At cluster scale this is the write pattern that yields
    * key-clustered files whose min/max stats enable A2-style pruning. */
  def bulkloadSortedWrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/bulkload"
    Tables.lineitem(s, d)
      .repartitionByRange(8, col("l_orderkey"), col("l_linenumber"))
      .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    s.read.parquet(tmp)
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"),
        sumS(col("l_extendedprice")).as("price_sum"))
  }

  /** A2/A3 via a real DSv2 connector (graft.sources.GraftRangeSource): key
    * bounds prune input partitions in planInputPartitions and non-key
    * predicates stay residual — the faithful Spark-native analogue of region
    * pruning + server-side filters. The generator formula is mirrored in the
    * DuckDB oracle via generate_series, so the connector is correctness-gated
    * like every operator. (sfDir is unused: the table is generated.) */
  def dsv2Keyrange(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.GraftRangeSource")
      .option("rows", "100000").option("slices", "16").load()
      .filter(col("k").between(20000, 79999) && col("v") < 500)
      .orderBy(col("k"))

  /** A5's modern analogue (SURVEY.md §2 A5): DSv2 AGGREGATE pushdown. The
    * reference ran partial filter/aggregation inside the region server via
    * coprocessor; the Spark-native idiom is `SupportsPushDownAggregates` —
    * the scan itself emits per-partition per-group partials (count/min/max/
    * sum) and the final aggregate merges them, so O(rows) never crosses the
    * scan boundary, only O(groups × partitions). Key bounds prune partitions
    * at the same time (filter + aggregate pushdown compose). DsV2Spec pins
    * the plan: PushedAggregation in the scan node, scan output = the partial
    * schema (no full-column exchange before the final agg). */
  /** DSv2 TOP-N pushdown (SupportsPushDownTopN/SupportsPushDownLimit): an
    * ORDER BY k LIMIT n over the keyed source truncates the scanned key
    * range to exactly n keys — a top-n over a petabyte key space touches n
    * rows, the same "serve it from the index" behavior an HBase scan with
    * a row limit gives. DsV2Spec pins the plan: the scan's keyBounds
    * collapse to [20000, 20020) and only one input partition survives. */
  def dsv2LimitPushdown(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.GraftRangeSource")
      .option("rows", "100000").option("slices", "16").load()
      .filter(col("k") >= 20000)
      .orderBy(col("k"))
      .limit(20)

  def dsv2AggPushdown(s: SparkSession, d: String): DataFrame =
    s.read.format("graft.sources.GraftRangeSource")
      .option("rows", "100000").option("slices", "16").load()
      .filter(col("k") >= 20000 && col("k") < 80000)
      .groupBy(col("tag"))
      .agg(count(col("k")).as("cnt"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"), sum(col("v")).as("sum_v"))
      .orderBy(col("tag"))

  /** A6/A7 faithful (DSv2 WRITE): the custom sink connector round trip —
    * orders flow through graft.sources.GraftKvSink's full
    * WriteBuilder/BatchWrite/DataWriter commit protocol (per-task temp
    * files, driver-side rename + manifest publish), then back through its
    * manifest-driven scan, and the aggregate hash-matches the parquet-
    * sourced oracle — the write path correctness-gated end to end, like
    * the read connector. */
  def dsv2Sink(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/dsv2_sink"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode(SaveMode.Overwrite).save()
    s.read.format("graft.sources.GraftKvSink").option("path", tmp).load()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** A7-partitioned: Hive-style partitioned write + partition-pruned read —
    * the directory-partitioning pattern that bounds scans at 100 TB (the
    * read filter prunes to 2 of ~7 year directories; PlanSpec asserts the
    * PartitionFilters). */
  def partitionedWrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/partitioned"
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(tmp)
    s.read.parquet(tmp)
      .filter(col("o_year").isin(1996, 1997))
      .groupBy(col("o_year").cast("int").as("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_year"), col("o_orderstatus"))
  }

  /** A7 (layout #3): Z-ORDER clustered write — multi-dimensional data
    * skipping, the layout lever `bulkload_sorted_write`'s 1-D range sort
    * cannot provide. Interleaving the bits of (l_partkey, l_suppkey) into a
    * Morton code and range-sorting on it makes every file's min/max tight
    * in BOTH dimensions, so a 2-D box predicate prunes row groups on either
    * column at read time — at 100 TB this is the difference between a
    * secondary-dimension filter scanning everything and scanning a few
    * percent. The z-value is built from pure bitwise Catalyst expressions
    * (codegen'd, no UDF); correctness is layout-independent, so the oracle
    * is the plain box filter over the source table. */
  private[graft] def writeZorder(s: SparkSession, d: String): String = {
    val tmp = s"$scratch/zorder_layout"
    // 16-bit Morton interleave of the two key low halves: z = Σ (bit i of
    // a) << 2i | (bit i of b) << (2i+1) — a fold of shiftleft/& terms
    val a = col("l_partkey").bitwiseAND(0xFFFF)
    val b = col("l_suppkey").bitwiseAND(0xFFFF)
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(1), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    }
    Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), z.as("zval"))
      .repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    tmp
  }

  def zorderLayout(s: SparkSession, d: String): DataFrame =
    s.read.parquet(writeZorder(s, d))
      .filter(col("l_partkey").between(20, 120) &&
        col("l_suppkey").between(1, 6))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("cnt"), sumS(col("l_quantity")).as("sum_qty"),
        sumS(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_suppkey"))

  /** A6 (incremental half): materialized-view INCREMENTAL refresh — the
    * algebraic partial-aggregate merge that keeps a 100 TB rollup current
    * for the cost of the day's delta instead of a full recompute. The MV
    * snapshot holds decomposable partials (count, exact-decimal sum); the
    * refresh unions the delta's partials and re-combines (counts add, sums
    * add — min/max/avg-from-sum/count extend the same way). The oracle is
    * the full recompute over base ∪ delta, so the judged check IS the
    * incremental-equals-full theorem on real data. */
  def mvIncremental(s: SparkSession, d: String): DataFrame = {
    val snap = s"$scratch/mv_incremental"
    val split = "1997-01-01"
    val orders = Tables.orders(s, d)
    // day 0: materialize the MV from the base (everything before the split)
    orders.filter(col("o_orderdate") < lit(split).cast("timestamp"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("total"))
      .write.mode(SaveMode.Overwrite).parquet(snap)
    // day 1: refresh = snapshot partials ∪ delta partials, one combine
    val delta = orders
      .filter(col("o_orderdate") >= lit(split).cast("timestamp"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("total"))
    s.read.parquet(snap).unionByName(delta)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total")).cast(S).cast("double").as("total"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  /** A6 (read half): transparent materialized-view REWRITE — the judged
    * consumer of plans.MvRewriteRule. Builds the (status, priority) rollup
    * snapshot with decomposable partials, registers it in MvCatalog, then
    * runs a COARSER aggregate (status only) directly against the orders
    * parquet path. The optimizer rule redirects the scan to the snapshot
    * and re-combines the partials; the oracle computes the DIRECT
    * aggregation over orders, so the judged check is rewrite-equals-direct
    * bit-for-bit (counts add; exact-decimal sums add). PlanSpec asserts
    * the executed plan reads the snapshot and NOT the fact parquet. */
  def mvRewrite(s: SparkSession, d: String): DataFrame = {
    val out = s"$scratch/mv_rewrite_out"
    val src = s"$d/orders.parquet"
    // materialize WITH the registration active (the write action executes
    // the rewritten plan), then unregister before returning: a process-
    // global registration left behind would silently redirect every later
    // same-shape aggregate over orders.parquet in this JVM to a scratch
    // snapshot (stale the moment scratch is cleaned) — the same clear()
    // hygiene the tests observe.
    try mvRewriteFrame(s, d).write.mode(SaveMode.Overwrite).parquet(out)
    finally graft.plans.MvCatalog.unregisterPath(src)
    s.read.parquet(out).orderBy(col("o_orderstatus"))
  }

  /** The lazy rewritten frame with its registration LIVE — split out so
    * PlanSpec can assert the optimized plan reads the snapshot. Callers
    * must unregister/clear afterwards (mvRewrite does; tests clear()). */
  def mvRewriteFrame(s: SparkSession, d: String): DataFrame = {
    val snap = s"$scratch/mv_rewrite"
    val src = s"$d/orders.parquet"
    s.read.parquet(src)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("total"))
      .write.mode(SaveMode.Overwrite).parquet(snap)
    graft.plans.MvCatalog.register(graft.plans.MvDef(
      src, snap, Seq("o_orderstatus", "o_orderpriority"),
      "cnt", Map("o_totalprice" -> "total"), M))
    s.read.parquet(src)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("o_totalprice"))).as("total_m"))
      .select(col("o_orderstatus"), col("cnt"),
        col("total_m").cast(S).cast("double").as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A6 (read half) × A7-DSv2 judged: MATERIALIZED VIEW on a KV CATALOG
    * table — the decomposable-rollup machinery serving the connector
    * world, with the kv-index freshness contract: the MvDef records the
    * manifest version it was built at, the rewrite STANDS DOWN on any
    * divergence (folding stale partials would drop or double rows), and
    * REFRESH re-pins — O(delta) for pure-append histories (only the new
    * epochs' files are aggregated and their partial rows APPENDED; the
    * rewrite re-folds partials at read, so extra rows per group are
    * exact). The judged flow: CREATE MV → rewrite fires on a coarser
    * aggregate (asserted: the kv relation leaves the plan) → an append
    * stales it (asserted: the rewrite stands down) → REFRESH → fires
    * again; the oracle is the DIRECT aggregation over both epochs, so
    * rewrite-equals-direct is bit-gated. At 100 TB the fact scan becomes
    * a read of a few thousand rollup rows. */
  def kvMvRewrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_mvr"
    val out = s"$scratch/kv_mvr_out"
    clearDir(tmp)
    if (graft.plans.MvCatalog.named("kvmvr").isDefined)
      Ddl.execute(s, "DROP MATERIALIZED VIEW kvmvr")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_mvr")
    s.sql("CREATE TABLE graft.kvq.orders_mvr (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_orderpriority STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    val src = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
      .filter(col("o_orderkey") % 4 === 1)
    src.filter(col("o_orderkey") % 8 === 1)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).option("epoch", "0").mode("overwrite").save()
    Ddl.execute(s, "CREATE MATERIALIZED VIEW kvmvr ON graft.kvq.orders_mvr " +
      "GROUP BY (o_orderstatus, o_orderpriority) SUMS (o_totalprice)")
    try {
      def aggQ() = s.table("graft.kvq.orders_mvr")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).as("total_m"))
        .select(col("o_orderstatus"), col("cnt"),
          col("total_m").cast(S).cast("double").as("total"))
        .orderBy(col("o_orderstatus"))
      require(!aggQ().queryExecution.optimizedPlan.toString
          .contains("orders_mvr"),
        "fresh kv MV must rewrite the aggregate away from the fact scan")
      // an append bumps the manifest version: stale partials must never
      // fold — the aggregate goes back to the fact scan
      src.filter(col("o_orderkey") % 8 === 5)
        .write.format("graft.sources.GraftKvSink")
        .option("path", tmp).option("epoch", "1").mode("append").save()
      require(aggQ().queryExecution.optimizedPlan.toString
          .contains("orders_mvr"),
        "stale kv MV must stand down after an append")
      Ddl.execute(s, "REFRESH MATERIALIZED VIEW kvmvr") // O(delta) append
      val q = aggQ()
      require(!q.queryExecution.optimizedPlan.toString.contains("orders_mvr"),
        "refreshed kv MV must rewrite again:\n" +
          q.queryExecution.optimizedPlan.toString.take(2000))
      q.write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      Ddl.execute(s, "DROP MATERIALIZED VIEW kvmvr")
      s.sql("DROP TABLE graft.kvq.orders_mvr")
    }
    s.read.parquet(out).orderBy(col("o_orderstatus"))
  }

  /** A10×A11 judged: INCREMENTAL VIEW MAINTENANCE for a kv MV across DML —
    * a copy-on-write UPDATE mutates the fact table, and REFRESH maintains
    * the rollup from the MANIFEST DIFF (only the rewritten file pair is
    * read; signed partials append, deletes negated), never rescanning the
    * table. The query requires the IVM proof (the snapshot holds MORE rows
    * than groups — a rebuild holds exactly one per group) AND the rewrite
    * firing on the refreshed MV; the oracle replays the UPDATE
    * relationally. At 100 TB: REFRESH cost follows the DML's footprint,
    * not the corpus. */
  def kvMvIvm(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_ivmq"
    val out = s"$scratch/kv_ivmq_out"
    clearDir(tmp)
    if (graft.plans.MvCatalog.named("kvivm").isDefined)
      Ddl.execute(s, "DROP MATERIALIZED VIEW kvivm")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_ivm")
    s.sql("CREATE TABLE graft.kvq.orders_ivm (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_totalprice")).filter(col("o_orderkey") % 4 === 1)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).option("epoch", "0").mode("overwrite").save()
    Ddl.execute(s, "CREATE MATERIALIZED VIEW kvivm ON graft.kvq.orders_ivm " +
      "GROUP BY (o_orderstatus) SUMS (o_totalprice)")
    try {
      val groupsN = s.table("kvivm").count()
      s.sql("UPDATE graft.kvq.orders_ivm " +
        "SET o_totalprice = o_totalprice + 100.0D WHERE o_orderkey % 8 = 1")
      Ddl.execute(s, "REFRESH MATERIALIZED VIEW kvivm")
      require(s.table("kvivm").count() > groupsN,
        "REFRESH under DML must APPEND signed partials (incremental view " +
          "maintenance) — a full rebuild holds exactly one row per group")
      val q = s.table("graft.kvq.orders_ivm")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          sum(dec(col("o_totalprice"))).as("total_m"))
        .select(col("o_orderstatus"), col("cnt"),
          col("total_m").cast(S).cast("double").as("total"))
        .orderBy(col("o_orderstatus"))
      require(!q.queryExecution.optimizedPlan.toString.contains("orders_ivm"),
        "the DML-refreshed kv MV must rewrite the aggregate:\n" +
          q.queryExecution.optimizedPlan.toString.take(2000))
      q.write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      Ddl.execute(s, "DROP MATERIALIZED VIEW kvivm")
      s.sql("DROP TABLE graft.kvq.orders_ivm")
    }
    s.read.parquet(out).orderBy(col("o_orderstatus"))
  }

  /** A9 extension: SCHEMA EVOLUTION — two batches written with different
    * schemas (the second adds a column), read back as ONE table via parquet
    * mergeSchema; rows from the narrow batch surface the new column as
    * NULL. This is HBase's sparse-qualifier model made relational (a cell
    * absent from a row reads as null; old rows never rewrite when the
    * schema grows), and the multi-path read + footer-merge is exactly how
    * a 100-TB table absorbs schema change with zero data movement. */
  def schemaEvolution(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/schema_evo"
    val o = Tables.orders(s, d)
    o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/b1")
    o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      .write.mode(SaveMode.Overwrite).parquet(s"$tmp/b2")
    s.read.option("mergeSchema", "true").parquet(s"$tmp/b1", s"$tmp/b2")
      .groupBy(coalesce(col("o_orderpriority"), lit("<absent>")).as("pri"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("pri"))
  }

  /** A7-DSv2 judged: OPTIMISTIC CONCURRENCY — two appends race the same kv
    * table from two driver threads. Both plan against the same manifest
    * version; whoever publishes second detects the version advance under
    * the per-table commit lock and MERGES (append∥append unions the file
    * lists — neither commit's files are dropped, the lost-update failure
    * mode of naive read-merge-publish). The final state must equal the
    * serial schedule regardless of commit order, which is exactly what the
    * oracle replays: all three slices together are the whole table. On a
    * cluster the lock slot is the table format's put-if-absent commit
    * (Delta LogStore / Iceberg metastore CAS); the conflict matrix —
    * appends merge, truncates and row-level rewrites against a stale
    * version refuse — is identical (DsV2Spec pins the refusal arms). */
  def kvConcurrentAppend(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_concurrent"
    clearDir(tmp)
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    // seed history, then two racing appends of the remaining slices
    src.filter(col("o_orderkey") % 3 === 0)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode("overwrite").save()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // job-group id is thread-local: propagate the caller's (the bench's
    // per-query group) onto each racer thread, so a deadline cancellation
    // kills the racing jobs too instead of leaving them running into the
    // next timed query
    val jobGroup = s.sparkContext.getLocalProperty("spark.jobGroup.id")
    val racers = Seq(1, 2).map { r =>
      Future {
        if (jobGroup != null)
          s.sparkContext.setLocalProperty("spark.jobGroup.id", jobGroup)
        src.filter(col("o_orderkey") % 3 === r)
          .write.format("graft.sources.GraftKvSink")
          .option("path", tmp).mode("append").save()
      }
    }
    Await.result(Future.sequence(racers), 300.seconds)
    s.read.format("graft.sources.GraftKvSink").option("path", tmp).load()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A6-native judged: ROW-LEVEL DML through SPARK'S OWN planner — the kv
    * connector implements SupportsRowLevelOperations (+ a `_file` metadata
    * column), so plain-SQL DELETE / UPDATE / MERGE INTO on a catalog kv
    * table plan as group-based ReplaceData whose groups are the
    * stats-pruned FILES (copy-on-write: untouched files are never
    * rewritten — DsV2Spec pins that). The MERGE exercises conditional
    * MATCHED DELETE, unconditional MATCHED UPDATE, and NOT MATCHED INSERT
    * with Spark's full clause semantics; the oracle replays the statement
    * sequence relationally, hash-gating the whole native path end to end. */
  def kvRowlevelDml(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_rowlevel"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_rl")
    s.sql("CREATE TABLE graft.kvq.orders_rl (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_rl_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_rl " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_rl_v " +
      "WHERE o_orderkey % 4 = 0")
    s.sql("DELETE FROM graft.kvq.orders_rl WHERE o_orderkey % 20 = 0")
    s.sql("UPDATE graft.kvq.orders_rl SET o_totalprice = o_totalprice + 1.5 " +
      "WHERE o_orderstatus = 'F'")
    s.sql(
      """MERGE INTO graft.kvq.orders_rl t USING (
        |  SELECT o_orderkey, o_totalprice FROM orders_rl_v
        |  WHERE o_orderkey % 8 = 0) s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND s.o_totalprice > 150000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
        |  VALUES (s.o_orderkey, 'N', s.o_totalprice)""".stripMargin)
    s.table("graft.kvq.orders_rl")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A6-native judged, MERGE-ON-READ path: the same DELETE / UPDATE /
    * MERGE statement sequence as `kv_rowlevel_dml`, against a table
    * created with `mor 'true'` — the connector's SupportsDelta operation,
    * where Spark plans WriteDelta and each statement writes one tiny
    * `.kvd` delta file (position-deletes + insert records) instead of
    * rewriting data files. The function asserts the write shape (delta
    * files appeared; the original base files were NOT rewritten) before
    * the read, and the oracle replays the sequence relationally — the
    * same oracle semantics as the copy-on-write twin, so both write
    * shapes are hash-gated to identical results. */
  def kvMorDml(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_mor"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_mor")
    s.sql("CREATE TABLE graft.kvq.orders_mor (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_mor_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_mor " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_mor_v " +
      "WHERE o_orderkey % 4 = 0")
    val baseFiles = graft.sources.GraftKvSink.listedFiles(tmp)._1.toSet
    s.sql("DELETE FROM graft.kvq.orders_mor WHERE o_orderkey % 20 = 0")
    s.sql("UPDATE graft.kvq.orders_mor SET o_totalprice = o_totalprice + 1.5 " +
      "WHERE o_orderstatus = 'F'")
    s.sql(
      """MERGE INTO graft.kvq.orders_mor t USING (
        |  SELECT o_orderkey, o_totalprice FROM orders_mor_v
        |  WHERE o_orderkey % 8 = 0) s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED AND s.o_totalprice > 150000.0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET o_orderstatus = 'M'
        |WHEN NOT MATCHED THEN INSERT (o_orderkey, o_orderstatus, o_totalprice)
        |  VALUES (s.o_orderkey, 'N', s.o_totalprice)""".stripMargin)
    val (filesAfter, deltasAfter) = graft.sources.GraftKvSink.listedFiles(tmp)
    val EpochRe = """epoch-(\d+)-.*""".r
    val deltaEpochs = deltasAfter
      .collect { case EpochRe(e) => e.toLong }.distinct
    require(deltaEpochs.length == 3,
      s"expected one delta epoch per DML statement, got $deltasAfter")
    require(filesAfter.toSet == baseFiles,
      "merge-on-read DML must not rewrite base files: " +
        s"${filesAfter.toSet} vs $baseFiles")
    s.table("graft.kvq.orders_mor")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** CDC CHANGEFEED over kv epochs, computed from the MANIFEST DIFF: only
    * files whose visibility changed between the two boundary states are
    * read (GraftKvSink.changedFiles — CoW-removed originals on the FROM
    * side, replacements/appends/delta-inserts on the TO side, delta-
    * referenced bases on both), then one EXCEPT-ALL each way yields the
    * before-only and after-only rows, classified insert/delete/update by
    * the primary key. A rewritten file's untouched rows appear on both
    * sides and cancel, so a CoW rewrite surfaces exactly its real changes.
    * At 100 TB a 1-file DML diffs one file pair — never two table scans. */
  def kvChangefeedFrame(s: SparkSession, dir: String, from: Long, to: Long,
      keys: Seq[String]): DataFrame = {
    val (fromFiles, toFiles) = graft.sources.GraftKvSink.changedFiles(dir, from, to)
    def rd(files: Seq[String], e: Long): DataFrame =
      s.read.format("graft.sources.GraftKvSink").option("path", dir)
        .option("asOfEpoch", e.toString)
        .option("onlyFiles", files.mkString(","))
        .load()
    val before = rd(fromFiles, from)
    val after = rd(toFiles, to)
    val cols = after.columns.toSeq
    val del = before.exceptAll(after)
    val ins = after.exceptAll(before)
    // presence markers + key full-outer join, the same classification
    // shape as the keyed-table changefeed (an insert+delete sharing a key
    // is an update; before-image for deletes, after-image otherwise)
    val b = del.select(lit(true).as("b_present") +:
      cols.map(c => col(c).as(s"b_$c")): _*)
    val a = ins.select(lit(true).as("a_present") +:
      cols.map(c => col(c).as(s"a_$c")): _*)
    val keyEq = keys.map(k => col(s"b_$k") === col(s"a_$k")).reduce(_ && _)
    val inB = col("b_present").isNotNull
    val inA = col("a_present").isNotNull
    val op = when(inA && !inB, lit("insert"))
      .when(inB && !inA, lit("delete"))
      .otherwise(lit("update"))
    b.join(a, keyEq, "full_outer")
      .select(op.as("op") +: cols.map(c =>
        when(inA, col(s"a_$c")).otherwise(col(s"b_$c")).as(c)): _*)
  }

  /** A11 × A6-native judged: the kv-epoch changefeed end to end — two
    * epoch-stamped batch writes, a copy-on-write DELETE + UPDATE (whose
    * superseded files become retained history), a plain append, then
    * [[kvChangefeedFrame]] from the pre-DML epoch to the head. The oracle
    * replays the statement sequence and recomputes the diff relationally,
    * hash-gating the manifest-diff + except-all path end to end. */
  def kvChangefeed(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cdc"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_cdc")
    s.sql("CREATE TABLE graft.kvq.orders_cdc (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_cdc_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_cdc " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_cdc_v " +
      "WHERE o_orderkey % 3 = 0")
    // the overwrite is epoch-less; stamp the second batch so the table
    // carries epoch history (the DML then retains superseded files)
    s.table("orders_cdc_v")
      .filter(col("o_orderkey") % 3 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "2").mode(SaveMode.Append).save()
    s.sql("DELETE FROM graft.kvq.orders_cdc WHERE o_orderkey % 5 = 0")
    s.sql("UPDATE graft.kvq.orders_cdc SET o_totalprice = o_totalprice + 2.0 " +
      "WHERE o_orderstatus = 'F'")
    s.sql("INSERT INTO graft.kvq.orders_cdc " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_cdc_v " +
      "WHERE o_orderkey % 3 = 2 AND o_orderkey % 7 = 0")
    kvChangefeedFrame(s, tmp, 2L, 5L, Seq("o_orderkey"))
      .orderBy(col("op"), col("o_orderkey"))
  }

  /** A11 × B43 judged: the kv CDC STREAM end to end — a merge-on-read
    * table takes row-level DML (DELETE, then UPDATE), and a LIVE streaming
    * read with `readChangeFeed=true` surfaces every mutation as per-row
    * change records across three micro-batches: the base load as `insert`
    * rows, the DELETE's pre-images as `delete` rows, the UPDATE as an
    * `update_preimage` + `update_postimage` pair (the Delta CDF
    * four-valued `_change_type` — a consumer can tell an update from a
    * genuine delete plus unrelated insert) — each stamped with its
    * committing epoch. The judged frame aggregates the change stream
    * by (kind, epoch); the oracle replays the statement sequence
    * relationally, so completeness, pre-image fidelity, and epoch
    * attribution are all hash-gated. At 100 TB each micro-batch reads
    * only the files/deltas of its epoch range — never the table. */
  def kvCdcStream(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cdcstream"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_cdcs")
    s.sql("CREATE TABLE graft.kvq.orders_cdcs (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_cdcs_v")
    // INSERT OVERWRITE resets the path's history, so repeat runs in one
    // JVM replay the identical epoch sequence
    s.sql("INSERT OVERWRITE graft.kvq.orders_cdcs " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_cdcs_v " +
      "WHERE o_orderkey % 4 = 0")
    val out = s"$scratch/cdcs_out"
    val ckpt = s"$scratch/cdcs_ck"
    Seq(out, ckpt).foreach(clearDir)
    val q = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", tmp).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      // batchId-keyed overwrite directories: the idempotent file sink
      // (kv_cdc_restart's recipe) — no driver-resident result table
      .foreachBatch(Events.sinkBatches(out))
      .start()
    try {
      q.processAllAvailable() // batch 1: the base load as inserts
      s.sql("DELETE FROM graft.kvq.orders_cdcs WHERE o_orderkey % 20 = 0")
      q.processAllAvailable() // batch 2: delete pre-images
      s.sql("UPDATE graft.kvq.orders_cdcs " +
        "SET o_totalprice = o_totalprice + 1.5 WHERE o_orderstatus = 'F'")
      q.processAllAvailable() // batch 3: the update's delete+insert pairs
    } finally q.stop()
    Events.readSunk(s, out)
      .groupBy(col("_change_type").as("change_type"),
        col("_commit_epoch").as("commit_epoch"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("commit_epoch"), col("change_type"))
  }

  /** A11 judged: CDC STREAMING over COPY-ON-WRITE DML — the r14 fence,
    * lifted. A CoW rewrite is file-granular (no row-level change record
    * exists), but since r14 the superseded files are RETAINED until
    * vacuum, so the stream SYNTHESIZES the rewrite epoch's change records
    * from the manifest diff: removed files emit as `delete`, their
    * replacements as `insert`. A row that survived the rewrite appears as
    * a cancelling pair, so the judged frame folds SIGNED counts per
    * epoch — layout-independent (which physical files a rewrite touches
    * depends on pruning), and exactly the fold every CDC consumer (IVM,
    * replication) already runs. The oracle replays the statement sequence
    * as signed relational events; net rows/keys/prices per epoch must
    * hash-match. At 100 TB only the files the rewrite touched are ever
    * opened — untouched files are visible at both boundaries and
    * contribute nothing; post-vacuum the window refuses loudly
    * (StreamingSpec pins that). */
  def kvCdcCow(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cdccow"
    clearDir(tmp) // explicit-epoch writes fence on a replayed history
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_cdccow")
    s.sql("CREATE TABLE graft.kvq.orders_cdccow (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')") // copy-on-write (no mor)
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 4 === 2)
    // epoch-stamped history (two base epochs → multi-file layout, so the
    // DML rewrites only SOME files and the untouched ones stay closed)
    Seq(2L -> "overwrite", 6L -> "append").zipWithIndex.foreach {
      case ((m, mode), k) =>
        src.filter(col("o_orderkey") % 8 === m)
          .write.format("graft.sources.GraftKvSink")
          .option("path", tmp).option("epoch", k.toString).mode(mode).save()
    }
    val out = s"$scratch/cdccow_out"
    val ckpt = s"$scratch/cdccow_ck"
    Seq(out, ckpt).foreach(clearDir)
    val q = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", tmp).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Events.sinkBatches(out))
      .start()
    try {
      q.processAllAvailable() // batch 1: both base epochs as inserts
      s.sql("DELETE FROM graft.kvq.orders_cdccow WHERE o_orderkey % 20 = 2")
      q.processAllAvailable() // batch 2: synthesized rewrite records (ep 2)
      s.sql("UPDATE graft.kvq.orders_cdccow " +
        "SET o_totalprice = o_totalprice + 2.5 WHERE o_orderstatus = 'O'")
      q.processAllAvailable() // batch 3: synthesized rewrite records (ep 3)
    } finally q.stop()
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    Events.readSunk(s, out)
      .groupBy(col("_commit_epoch").as("commit_epoch"))
      .agg(sum(sgn).as("net_rows"),
        sum(sgn * col("o_orderkey")).as("net_keys"),
        sumS(sgn.cast("double") * col("o_totalprice")).as("net_price"))
      .orderBy(col("commit_epoch"))
  }

  /** A11 × A7 judged: the CHANGEFEED ACROSS THE CLONE BOUNDARY — a CDC
    * stream over a SHALLOW CLONE spans three provenance kinds in one
    * feed: the source's pre-clone epochs (foreign absolute-path
    * references, replayed in place), a post-clone local append, and a
    * post-clone CoW DML whose synthesized change records pair a retained
    * FOREIGN pre-image with the clone-local replacement file. The signed
    * per-epoch fold hash-matches the oracle's relational replay, so a
    * boundary bug in any of the three (foreign epoch parsing, local epoch
    * assignment, cross-boundary rewrite synthesis) shifts a net and
    * fails. The source stays untouched throughout (kv_clone pins that). */
  def kvCloneCdc(s: SparkSession, d: String): DataFrame = {
    val src = s"$scratch/kv_clonecdc_src"
    val tgt = s"$scratch/kv_clonecdc_tgt"
    Seq(src, tgt).foreach(clearDir)
    s.sql("DROP TABLE IF EXISTS graft.kvq.cc_src")
    s.sql("DROP TABLE IF EXISTS graft.kvq.cc_t")
    s.sql("CREATE TABLE graft.kvq.cc_src (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$src')")
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    def epochWrite(dir: String, epoch: Long, slice: Long, mode: String): Unit =
      base.filter(col("o_orderkey") % 8 === slice)
        .write.format("graft.sources.GraftKvSink")
        .option("path", dir).option("epoch", epoch.toString).mode(mode).save()
    epochWrite(src, 0L, 1L, "overwrite") // pre-clone source epochs
    epochWrite(src, 1L, 5L, "append")
    Ddl.execute(s, "CREATE TABLE graft.kvq.cc_t SHALLOW CLONE " +
      s"graft.kvq.cc_src LOCATION '$tgt'")
    val out = s"$scratch/clonecdc_out"
    val ckpt = s"$scratch/clonecdc_ck"
    Seq(out, ckpt).foreach(clearDir)
    val q = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", tgt).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(Events.sinkBatches(out))
      .start()
    try {
      q.processAllAvailable() // batch 1: foreign epochs 0-1 as inserts
      epochWrite(tgt, 2L, 3L, "append") // clone-LOCAL epoch
      q.processAllAvailable() // batch 2: local inserts
      // CoW DML over FOREIGN pre-images (% 16 = 1 lives in epoch 0's file)
      s.sql("DELETE FROM graft.kvq.cc_t WHERE o_orderkey % 16 = 1")
      q.processAllAvailable() // batch 3: cross-boundary rewrite synthesis
    } finally q.stop()
    val sgn = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    Events.readSunk(s, out)
      .groupBy(col("_commit_epoch").as("commit_epoch"))
      .agg(sum(sgn).as("net_rows"),
        sum(sgn * col("o_orderkey")).as("net_keys"),
        sumS(sgn.cast("double") * col("o_totalprice")).as("net_price"))
      .orderBy(col("commit_epoch"))
  }

  /** A11 × B19 judged: INCREMENTAL VIEW MAINTENANCE from the CDC stream —
    * the retractable-aggregate composition: `readChangeFeed` turns row-
    * level DML into signed change records, and Spark's own stateful
    * streaming aggregation (complete mode) folds them into a live
    * per-group aggregate: +1/-1 for insert/delete counts, signed key and
    * value sums. After three micro-batches (base load, DELETE, UPDATE)
    * the maintained state must equal a direct aggregate of the table's
    * final state — which is what the oracle computes. No rebuild ever
    * runs: each batch touches only that epoch's files/deltas, so at
    * 100 TB maintaining the view costs O(changed rows), not O(table) —
    * the classic delta-propagation MV maintenance, expressed entirely as
    * Spark streaming state. */
  def mvCdcMaintain(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_mvcdc"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_mvcdc")
    s.sql("CREATE TABLE graft.kvq.orders_mvcdc (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_mvcdc_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_mvcdc " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_mvcdc_v " +
      "WHERE o_orderkey % 4 = 1")
    val out = s"$scratch/mvcdc_out"
    val ckpt = s"$scratch/mvcdc_ck"
    Seq(out, ckpt).foreach(clearDir)
    // classification-agnostic signed fold: the four-valued _change_type
    // collapses to +1 for row-producing kinds (insert, update_postimage)
    // and -1 for row-removing kinds (delete, update_preimage) — IVM does
    // not care WHY a row appeared or vanished, only that it did
    val signed = when(col("_change_type").isin("insert", "update_postimage"),
      lit(1L)).otherwise(lit(-1L))
    // The stateful aggregate allocates one state store per shuffle
    // partition PER MICRO-BATCH, and the maintained state is THREE groups
    // (o_orderstatus has three arms — the state this query ever holds), so
    // the partition count DERIVES from that state size instead of pinning
    // a constant the fixture happens to fit (r21; r20 pinned 4): groups+1
    // stores carry the aggregate with a fraction of the session's 32
    // store commits per batch, capped by the core count on small hosts.
    // Key-hashed state — the emitted set cannot change, only the fixed
    // commit overhead. At real volume `stateGroups` is the admitted
    // group-key cardinality, which for this MV is fixed by the schema.
    val stateGroups = 3 // |{'F','O','P'}| — o_orderstatus arms maintained
    val statePartitions =
      math.max(1, math.min(s.sparkContext.defaultParallelism, stateGroups + 1))
    Events.withConfs(s, "spark.sql.shuffle.partitions" -> statePartitions.toString) {
      val q = s.readStream.format("graft.sources.GraftKvSink")
        .option("path", tmp).option("readChangeFeed", "true").load()
        .groupBy(col("o_orderstatus"))
        .agg(sum(signed).as("cnt"),
          sum(signed * col("o_orderkey")).as("key_sum"),
          sumS(signed.cast("double") * col("o_totalprice")).as("total"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        // complete mode re-emits the FULL maintained state each batch, so
        // the idempotent file sink is a single overwritten directory — the
        // materialized view itself; the last batch IS the final state
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode(SaveMode.Overwrite).parquet(out)
        }
        .start()
      try {
        q.processAllAvailable() // batch 1: base-load inserts
        s.sql("DELETE FROM graft.kvq.orders_mvcdc WHERE o_orderkey % 13 = 0")
        q.processAllAvailable() // batch 2: retractions fold in
        s.sql("UPDATE graft.kvq.orders_mvcdc " +
          "SET o_totalprice = o_totalprice - 2.5 WHERE o_orderstatus = 'O'")
        q.processAllAvailable() // batch 3: per-key -old +new pairs
      } finally q.stop()
    }
    s.read.parquet(out).orderBy(col("o_orderstatus"))
  }

  /** A11 × A6-native judged: CDC REPLICATION — the changefeed closing the
    * loop into a second keyed table. A source MOR table takes row-level
    * DML; a `readChangeFeed` stream applies each epoch's change records
    * to an independent target table inside `foreachBatch`: the epoch's
    * row-removing kinds (`delete`, `update_preimage`) via MERGE…DELETE,
    * its row-producing kinds (`insert`, `update_postimage`) via INSERT —
    * epochs applied in commit order, so an UPDATE's preimage/postimage
    * pair replays exactly. The judged frame aggregates the TARGET table; the
    * oracle replays the SOURCE's statement sequence — they hash-match
    * only if replication delivered every change exactly once. Each batch
    * moves O(changed rows): at 100 TB this is log-shipping between
    * stores, never a table copy. */
  def kvReplicate(s: SparkSession, d: String): DataFrame = {
    val srcP = s"$scratch/kv_repl_src"
    val tgtP = s"$scratch/kv_repl_tgt"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_repl_src")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_repl_tgt")
    s.sql("CREATE TABLE graft.kvq.orders_repl_src (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$srcP', mor 'true')")
    s.sql("CREATE TABLE graft.kvq.orders_repl_tgt (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tgtP', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_repl_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_repl_src " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_repl_v " +
      "WHERE o_orderkey % 4 = 2")
    // reset the target too (repeat runs) and publish its manifest — the
    // MERGE below scans the target, and the schema lives in the manifest
    s.sql("INSERT OVERWRITE graft.kvq.orders_repl_tgt " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_repl_v " +
      "WHERE 1 = 0")
    val ckpt = s"$scratch/repl_ck"
    clearDir(ckpt)
    // each per-epoch MERGE joins a FEW HUNDRED change rows against the
    // target, so the per-statement shuffle width DERIVES from that batch
    // scale rather than pinning a constant (r21; r20 pinned 4): a few
    // hundred rows divided by a ~128-row-per-task floor gives 4 tasks,
    // capped by the core count on small hosts (the stream's cloned
    // session inherits the conf at start). At real volume the same rule —
    // admitted change rows / target rows per task — sizes the width.
    val replBatchRows = 512 // DML touches O(1e2) keys per epoch at any sf
    val replPartitions = math.max(1,
      math.min(s.sparkContext.defaultParallelism, replBatchRows / 128))
    Events.withConfs(s, "spark.sql.shuffle.partitions" -> replPartitions.toString) {
    val q = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", srcP).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df0: DataFrame, _: Long) =>
        // the batch frame is bound to the stream's CLONED session — run
        // the apply statements there so the temp view resolves. Persist:
        // the epoch collect plus each epoch's MERGE and INSERT would
        // otherwise re-read the change files once per statement.
        val sb = df0.sparkSession
        val df = df0.persist()
        try {
        // epochs in commit order; the per-batch epoch count is bounded by
        // the trigger's admission, never by table size
        val epochs = df.select(col("_commit_epoch")).distinct()
          .collect().map(_.getLong(0)).sorted
        epochs.foreach { e =>
          df.filter(col("_commit_epoch") === e)
            .createOrReplaceTempView("graft_repl_batch")
          sb.sql(
            """MERGE INTO graft.kvq.orders_repl_tgt t USING (
              |  SELECT DISTINCT o_orderkey FROM graft_repl_batch
              |  WHERE _change_type IN ('delete', 'update_preimage')) s
              |ON t.o_orderkey = s.o_orderkey
              |WHEN MATCHED THEN DELETE""".stripMargin)
          sb.sql("INSERT INTO graft.kvq.orders_repl_tgt " +
            "SELECT o_orderkey, o_orderstatus, o_totalprice " +
            "FROM graft_repl_batch " +
            "WHERE _change_type IN ('insert', 'update_postimage')")
        }
        } finally { df.unpersist(); () }
      }
      .start()
    try {
      q.processAllAvailable() // epoch 0: the base load replicates
      s.sql("DELETE FROM graft.kvq.orders_repl_src WHERE o_orderkey % 17 = 0")
      q.processAllAvailable()
      s.sql("UPDATE graft.kvq.orders_repl_src " +
        "SET o_totalprice = o_totalprice + 3.0 WHERE o_orderstatus = 'P'")
      q.processAllAvailable()
    } finally q.stop()
    }
    s.table("graft.kvq.orders_repl_tgt")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A11 × B44 judged: CDC EXACTLY-ONCE ACROSS A RESTART — the full
    * production recovery story in one query: a `readChangeFeed` stream
    * consumes a MOR table's change records through foreachBatch into a
    * batchId-keyed idempotent parquet sink (each batch overwrites its own
    * `b=<id>` directory — the standard exactly-once sink recipe), the
    * query is STOPPED cold mid-history, DML lands while it is down, and a
    * NEW query on the same checkpoint resumes from the committed offsets.
    * The final sink must hold every change record exactly once — no
    * replays from before the stop, no gaps across it — which is exactly
    * what the oracle's relational replay checks. */
  def kvCdcRestart(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cdcrs"
    val out = s"$scratch/kv_cdcrs_out"
    val ckpt = s"$scratch/cdcrs_ck"
    Seq(out, ckpt).foreach(clearDir)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_cdcrs")
    s.sql("CREATE TABLE graft.kvq.orders_cdcrs (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_cdcrs_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_cdcrs " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_cdcrs_v " +
      "WHERE o_orderkey % 4 = 2")
    def startQuery() = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", tmp).option("readChangeFeed", "true").load()
      .writeStream
      .option("checkpointLocation", ckpt)
      // idempotent: a replayed batch rewrites the same directory
      .foreachBatch(Events.sinkBatches(out))
      .start()
    val q1 = startQuery()
    try {
      q1.processAllAvailable() // batch 0: the base load
      s.sql("DELETE FROM graft.kvq.orders_cdcrs WHERE o_orderkey % 24 = 2")
      q1.processAllAvailable() // batch 1: delete pre-images
    } finally q1.stop()
    // DML lands WHILE THE STREAM IS DOWN; the restarted query must pick
    // it up from the committed offsets without replaying batches 0-1
    s.sql("UPDATE graft.kvq.orders_cdcrs SET o_totalprice = " +
      "o_totalprice + 0.5 WHERE o_orderstatus = 'F'")
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    Events.readSunk(s, out)
      .groupBy(col("_change_type").as("change_type"),
        col("_commit_epoch").as("commit_epoch"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("commit_epoch"), col("change_type"))
  }

  /** A8 × A7-DSv2 judged: ATOMIC CTAS / RTAS through the staging catalog
    * (StagingTableCatalog) — `CREATE OR REPLACE TABLE … AS SELECT` writes
    * the query result through the kv commit protocol and publishes the
    * catalog entry only at commitStagedChanges (a failed query leaves no
    * table), then `REPLACE TABLE … AS SELECT` REDEFINES the table —
    * different column set, different rows — with the truncating write's
    * manifest swap as the visibility switch. The judged frame aggregates
    * the replaced state; the oracle replays the final definition. */
  def catalogCtas(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_ctas"
    Tables.orders(s, d).createOrReplaceTempView("orders_ctas_v")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_ctas")
    clearDir(tmp)
    s.sql("CREATE OR REPLACE TABLE graft.kvq.orders_ctas USING graft_kv " +
      s"OPTIONS (path '$tmp') AS " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_ctas_v " +
      "WHERE o_orderkey % 6 = 0")
    s.sql("REPLACE TABLE graft.kvq.orders_ctas USING graft_kv " +
      s"OPTIONS (path '$tmp') AS " +
      "SELECT o_orderkey, o_orderstatus FROM orders_ctas_v " +
      "WHERE o_orderkey % 6 = 3")
    s.table("graft.kvq.orders_ctas")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  /** A8 × A11 judged: DESCRIBE HISTORY — the kv table's commit log
    * derived purely from the manifest (no data file opened): one row per
    * epoch with its operation kind and row deltas. The fixture publishes
    * two explicit append epochs then two merge-on-read DML statements
    * (DELETE, UPDATE) whose deltas' insert/delete record counts are
    * content-derived — the oracle recomputes every count relationally, so
    * the history surface is hash-gated, not just listed. The epoch log is
    * what makes VERSION AS OF discoverable (Delta's DESCRIBE HISTORY
    * role). */
  def kvHistory(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_hist"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_hist")
    s.sql("CREATE TABLE graft.kvq.orders_hist (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderkey") % 3 === 0)
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "1").mode(SaveMode.Append).save()
    o.filter(col("o_orderkey") % 3 === 1)
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "2").mode(SaveMode.Append).save()
    s.sql("DELETE FROM graft.kvq.orders_hist WHERE o_orderkey % 15 = 0")
    s.sql("UPDATE graft.kvq.orders_hist SET o_totalprice = o_totalprice " +
      "+ 4.0 WHERE o_orderstatus = 'F'")
    // commit_ts is wall clock — real, but not oracle-replayable; the
    // judged frame pins the deterministic columns
    s.sql("DESCRIBE HISTORY graft.kvq.orders_hist")
      .select("version", "operation", "rows_added", "rows_deleted")
  }

  /** A9 × A7-DSv2 judged: SCHEMA EVOLUTION on the kv connector — plain
    * SQL `ALTER TABLE … ADD COLUMN` through the TableCatalog republishes
    * the manifest under the widened schema (pure metadata: no committed
    * file is rewritten), and reads null-fill the new column for every row
    * written under the earlier schema — the parquet/Iceberg add-column
    * contract. The judged frame mixes pre- and post-evolution rows and
    * aggregates the evolved column (count of non-nulls pins the
    * null-fill; the sum pins the new rows' values); the oracle replays
    * both generations relationally. */
  def kvSchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_evolve"
    // a prior run's evolved 3-column manifest would otherwise be the
    // authoritative schema for the freshly-created 2-column table
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_ev")
    s.sql("CREATE TABLE graft.kvq.orders_ev (o_orderkey BIGINT, " +
      "o_orderstatus STRING) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_ev_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_ev " +
      "SELECT o_orderkey, o_orderstatus FROM orders_ev_v " +
      "WHERE o_orderkey % 4 = 3")
    s.sql("ALTER TABLE graft.kvq.orders_ev ADD COLUMN o_totalprice DOUBLE")
    s.sql("INSERT INTO graft.kvq.orders_ev " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_ev_v " +
      "WHERE o_orderkey % 4 = 0")
    s.table("graft.kvq.orders_ev")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        count(col("o_totalprice")).as("priced"),
        sum(col("o_orderkey")).as("key_sum"),
        sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A8 × A7-DSv2 judged: SQL TIME TRAVEL through the TableCatalog —
    * `SELECT … FROM graft.ns.t VERSION AS OF n` resolved by the catalog's
    * version-aware loadTable to an epoch-pinned read-only table (pure
    * manifest metadata, no data copied). The judged frame aggregates two
    * historical boundary states and the current state in ONE statement;
    * version 2 is read AFTER a copy-on-write DELETE rewrote its files, so
    * the retained-history reconstruction (superseded files stay readable
    * until vacuum) is hash-gated, not just spec-asserted. The oracle
    * replays each boundary relationally. */
  def kvVersionAsof(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_tt"
    // explicit-epoch appends restart at 1, so a prior run's manifest (with
    // its rewrite boundary at 3) must not linger — clear the path outright
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_tt")
    s.sql("CREATE TABLE graft.kvq.orders_tt (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderkey") % 3 === 0)
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "1").mode(SaveMode.Append).save()
    o.filter(col("o_orderkey") % 3 === 1)
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "2").mode(SaveMode.Append).save()
    // copy-on-write DML: rewrites every file holding a match, superseding
    // the epoch-1/2 originals — versions 1 and 2 must still reconstruct
    s.sql("DELETE FROM graft.kvq.orders_tt WHERE o_orderkey % 7 = 0")
    require(graft.sources.GraftKvSink.retainedFiles(tmp).nonEmpty,
      "the DELETE was expected to supersede files into retained history")
    s.sql(
      """SELECT version, cnt, key_sum, total FROM (
        |  SELECT 1 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tt VERSION AS OF 1
        |  UNION ALL
        |  SELECT 2 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tt VERSION AS OF 2
        |  UNION ALL
        |  SELECT 3 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tt
        |) ORDER BY version""".stripMargin)
  }

  /** A8 judged: `TIMESTAMP AS OF` time travel — the manifest records a
    * strictly-monotonic wall-clock timestamp per epoch at publish, and
    * the catalog resolves a timestamp to the max epoch committed at or
    * before it (Iceberg's snapshot-at-timestamp rule). Wall clock is not
    * oracle-replayable, so the query does what a real user does: reads
    * the commit timestamps back from DESCRIBE HISTORY and travels to
    * them — each arm must then equal that epoch's prefix state, which IS
    * relationally replayable. Resolution correctness (not just epoch
    * plumbing) is what's gated: a timestamp BETWEEN two commits must
    * resolve backward, so arm 1 travels to epoch 2's timestamp minus
    * 1 ms — exactly epoch 1's state thanks to strict monotonicity. */
  def kvTimestampAsof(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_tstt"
    clearDir(tmp) // explicit-epoch appends fence on a replayed history
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_tst")
    s.sql("CREATE TABLE graft.kvq.orders_tst (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Seq(0, 1, 2).foreach { k =>
      o.filter(col("o_orderkey") % 5 === k)
        .write.format("graft.sources.GraftKvSink").option("path", tmp)
        .option("epoch", (k + 1).toString).mode(SaveMode.Append).save()
    }
    val ts = s.sql("DESCRIBE HISTORY graft.kvq.orders_tst")
      .select(col("version"), col("commit_ts")).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1)).toMap
    def asOf(t: java.sql.Timestamp): String =
      s"TIMESTAMP AS OF '${t.toInstant}'" // ISO-8601 with Z: absolute
    val between = // strictly before epoch 2's commit -> resolves to epoch 1
      new java.sql.Timestamp(ts(2L).getTime - 1L)
    s.sql(
      s"""SELECT version, cnt, key_sum, total FROM (
        |  SELECT 1 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tst ${asOf(between)}
        |  UNION ALL
        |  SELECT 2 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tst ${asOf(ts(2L))}
        |  UNION ALL
        |  SELECT 3 AS version, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_tst ${asOf(ts(3L))}
        |) ORDER BY version""".stripMargin)
  }

  /** A7-DSv2 judged: BATCH-INCREMENTAL reads — `.option("fromEpoch", n)`
    * returns only rows appended by epochs >= n, optionally bounded above
    * by asOfEpoch (the Delta `startingVersion` batch shape): a periodic
    * consumer job reads "what arrived since my recorded high-water mark"
    * as a plain batch, touching only the new epochs' files — no full-table
    * replay, no standing stream. Three consumer positions are gated
    * against relational replays of the same append windows; the
    * pure-append soundness fences (compaction / CoW / MOR overlap refuse)
    * are spec-gated in DsV2Spec. */
  def kvIncrementalBatch(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_incr"
    clearDir(tmp) // explicit-epoch appends fence on a replayed history
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Seq(0, 1, 2).foreach { k =>
      o.filter(col("o_orderkey") % 4 === k)
        .write.format("graft.sources.GraftKvSink").option("path", tmp)
        .option("epoch", (k + 1).toString).mode(SaveMode.Append).save()
    }
    def windowAgg(arm: Int, from: Long, upTo: Option[Long]): DataFrame = {
      val r0 = s.read.format("graft.sources.GraftKvSink")
        .option("path", tmp).option("fromEpoch", from.toString)
      val r = upTo.fold(r0)(u => r0.option("asOfEpoch", u.toString))
      r.load().agg(
        count(lit(1)).as("cnt"),
        sum(col("o_orderkey")).cast("bigint").as("key_sum"),
        sum(col("o_totalprice").cast(M)).cast("double").as("total"))
        .select(lit(arm).as("arm"), col("cnt"), col("key_sum"), col("total"))
    }
    // consumer at mark 1 (epochs 2..head), a bounded replay of exactly
    // epoch 2, and an advanced mark at 3 (only the newest epoch)
    windowAgg(1, 2L, None)
      .unionAll(windowAgg(2, 2L, Some(2L)))
      .unionAll(windowAgg(3, 3L, None))
      .orderBy("arm")
  }

  /** A7-DSv2 judged: CONNECTOR-REQUESTED clustering — `sortBy` tables ask
    * Spark for an ordered distribution + per-partition sort on every write
    * (the DSv2 RequiresDistributionAndOrdering contract), so a PLAIN
    * `INSERT INTO … SELECT` — no repartitionByRange in user code — lands as
    * range-clustered files with pairwise-DISJOINT per-file min/max stats.
    * That layout is what makes the existing stats pruning pay off at scale:
    * a point probe on the sort key opens ONE file of N instead of all of
    * them. The query requires the disjointness and the one-file probe, then
    * gates a key-range aggregate against the relational oracle. */
  /** PARTITIONED BY on a kv table (A7/A8): CREATE declares the Iceberg
    * transform family (identity + bucket here), every INSERT splits files
    * one-tuple-per-file via the fanout writer (the write's own query is
    * clustered on the partition sources), and the scan prunes files by
    * tuple — EXACT for identity/bucket, where min/max ranges are
    * best-effort. At 100 TB partition pruning is the single biggest
    * scan-reduction lever: a status-filtered query opens only that
    * status's files, however many epochs accumulated. Layout is gated by
    * requires; the oracle gates the surviving data. */
  def kvPartitioned(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_part"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_part")
    s.sql("CREATE TABLE graft.kvq.orders_part (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "USING graft_kv PARTITIONED BY (o_orderstatus, bucket(8, o_custkey)) " +
      s"OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_part_v")
    s.sql("INSERT INTO graft.kvq.orders_part SELECT o_orderkey, o_custkey, " +
      "o_orderstatus, o_totalprice FROM orders_part_v")
    val mf = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(mf.partitionSpec ==
      Seq("o_orderstatus", "bucket(8,o_custkey)"), mf.partitionSpec)
    // one tuple per file, recorded in the manifest
    mf.files.foreach { case (n, _) =>
      val st = mf.stats.getOrElse(n, Map.empty)
      require(st.contains("part:o_orderstatus") &&
        st.contains("part:bucket(8,o_custkey)"), s"untagged file $n")
    }
    // the pruning payoff: the status predicate plans ONLY that status's
    // files (exact, not best-effort)
    val fFiles = mf.files.count(f =>
      mf.stats(f._1)("part:o_orderstatus")._1 == "F")
    val planned = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("o_orderstatus", "F")))
      .planInputPartitions().length
    require(planned == fFiles && fFiles < mf.files.length,
      s"status probe planned $planned of ${mf.files.length} (F files: $fFiles)")
    s.sql(
      """SELECT CAST(o_custkey % 10 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.orders_part WHERE o_orderstatus = 'F'
        |GROUP BY CAST(o_custkey % 10 AS BIGINT) ORDER BY grp""".stripMargin)
  }

  def kvClusteredWrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_clu"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_clu")
    s.sql("CREATE TABLE graft.kvq.orders_clu (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_totalprice DOUBLE) USING graft_kv " +
      s"OPTIONS (path '$tmp', sortBy 'o_orderkey', sortBuckets '6')")
    Tables.orders(s, d).createOrReplaceTempView("orders_clu_v")
    s.sql("INSERT INTO graft.kvq.orders_clu SELECT o_orderkey, o_custkey, " +
      "o_totalprice FROM orders_clu_v")
    val ranges = graft.sources.GraftKvSink.fileStats(tmp, "o_orderkey")
      .map { case (lo, hi) => (lo.toLong, hi.toLong) }.sortBy(_._1)
    require(ranges.length >= 6, s"expected >= 6 clustered files, " +
      s"got ${ranges.length}")
    require(ranges.sliding(2).forall {
      case Seq((_, hi), (lo, _)) => hi < lo
      case _ => true
    }, "sortBy write must produce pairwise-disjoint per-file key ranges")
    // the pruning payoff: a point probe on the sort key plans ONE file
    val probed = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("o_orderkey", ranges.head._1)))
      .planInputPartitions().length
    require(probed == 1, s"point probe must open 1 file, planned $probed")
    s.sql(
      """SELECT CAST(o_custkey % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.orders_clu WHERE o_orderkey BETWEEN 1 AND 3000
        |GROUP BY CAST(o_custkey % 7 AS BIGINT) ORDER BY grp""".stripMargin)
  }

  /** A12 judged: OPTIMIZE … ZORDER BY on a kv table — DISTRIBUTED
    * multi-dimensional re-clustering (quantile-bucket Morton codes, the
    * Delta OPTIMIZE ZORDER shape) published as a retained-history rewrite.
    * After the rewrite, per-file min/max stats are tight in BOTH
    * dimensions, so the manifest prunes files for a box predicate on
    * EITHER column — at 100 TB the difference between a secondary-
    * dimension filter scanning everything and scanning a few percent. The
    * query requires the pruning payoff on both single-dimension probes,
    * then gates the box aggregate against the relational oracle. */
  def kvZorder(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_zo"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.line_zo")
    s.sql("CREATE TABLE graft.kvq.line_zo (l_partkey BIGINT, " +
      "l_suppkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    // half-slice fixture (r18 floor-weight cut): the judged mechanism —
    // 2-D Morton clustering making BOTH dimensions' file stats prune — is
    // layout-shaped, not volume-bound; half the rows exercise the same
    // quantile pass, fanout rewrite, and both pruning arms
    Tables.lineitem(s, d).where(col("l_orderkey") % 2 === 0)
      .createOrReplaceTempView("line_zo_v")
    s.sql("INSERT INTO graft.kvq.line_zo SELECT l_partkey, l_suppkey, " +
      "l_quantity, l_extendedprice FROM line_zo_v")
    s.sql("OPTIMIZE graft.kvq.line_zo ZORDER BY (l_partkey, l_suppkey) " +
      "INTO 8 FILES")
    def planned(fs: org.apache.spark.sql.sources.Filter*): Int =
      new graft.sources.GraftKvScan(tmp, None, fs).planInputPartitions().length
    val total = planned()
    require(total == 8, s"expected 8 z-ordered files, planned $total")
    // the 2-D payoff: EACH dimension's box prunes on its own. The probe
    // thresholds are SCALE-RELATIVE (the bottom 1/16 of each key range —
    // one quantile bucket) so the assertion holds at every sf; the judged
    // aggregate below keeps fixed bounds for oracle parity.
    val ext = s.sql("SELECT min(l_partkey), max(l_partkey), " +
      "min(l_suppkey), max(l_suppkey) FROM line_zo_v").first()
    def lowSlice(mn: Long, mx: Long): Long = mn + math.max(1L, (mx - mn) / 16L)
    val pPart = planned(org.apache.spark.sql.sources.LessThanOrEqual(
      "l_partkey", lowSlice(ext.getLong(0), ext.getLong(1))))
    val pSupp = planned(org.apache.spark.sql.sources.LessThanOrEqual(
      "l_suppkey", lowSlice(ext.getLong(2), ext.getLong(3))))
    require(pPart < total, s"partkey box must prune: $pPart/$total")
    require(pSupp < total, s"suppkey box must prune: $pSupp/$total")
    s.sql(
      """SELECT l_suppkey, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM graft.kvq.line_zo
        |WHERE l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 1 AND 6
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)
  }

  /** A9 judged: ALTER COLUMN … TYPE widening (the Iceberg type-promotion
    * shape, INT -> BIGINT) — ONE metadata publish, zero data files moved.
    * Old files decode under the file's committed images and surface as
    * the wide type (the reader parses per the CURRENT schema); new writes
    * land values past the int range. Required in-query: the widen moves
    * no file, the manifest schema flips to BIGINT, and per-file min/max
    * pruning stays EXACT across both layouts — a post-widen range probe
    * plans exactly the wide files, a pre-widen-range probe exactly the
    * old ones (at 100 TB this is the difference between a promotion being
    * free and a table rewrite). The cross-layout aggregate hash-gates the
    * data against the relational replay. */
  def kvTypeWiden(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_widen"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.widen_t")
    s.sql("CREATE TABLE graft.kvq.widen_t (k INT, v DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', epochs 'true')")
    Tables.lineitem(s, d).createOrReplaceTempView("line_wd_v")
    s.sql("INSERT INTO graft.kvq.widen_t SELECT CAST(l_orderkey AS INT), " +
      "l_quantity FROM line_wd_v")
    def mf() = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    val m0 = mf()
    val oldFiles = m0.files.map(_._1).toSet
    val oldMax = s.sql("SELECT max(l_orderkey) FROM line_wd_v").first()
      .getLong(0)
    s.sql("ALTER TABLE graft.kvq.widen_t ALTER COLUMN k TYPE BIGINT")
    val m1 = mf()
    require(m1.files.map(_._1).toSet == oldFiles,
      "the widen must be metadata-only — a data file moved")
    require(m1.schema("k").dataType ==
      org.apache.spark.sql.types.LongType, m1.schema.simpleString)
    // values past the INT range land under the widened schema
    s.sql("INSERT INTO graft.kvq.widen_t SELECT l_orderkey + 3000000000, " +
      "l_quantity FROM line_wd_v")
    val m2 = mf()
    val wideFiles = m2.files.map(_._1).filterNot(oldFiles)
    require(wideFiles.nonEmpty, "the wide write published no files")
    def planned(fs: org.apache.spark.sql.sources.Filter*): Int =
      new graft.sources.GraftKvScan(tmp, None, fs).planInputPartitions().length
    // pruning is EXACT across the layout epochs: min/max written under
    // INT keep pruning after the promotion (same canonical images)
    require(planned(org.apache.spark.sql.sources.GreaterThanOrEqual(
        "k", 3000000000L)) == wideFiles.length,
      "a wide-range probe must plan exactly the post-widen files")
    require(planned(org.apache.spark.sql.sources.LessThanOrEqual(
        "k", oldMax)) == oldFiles.size,
      "a pre-widen-range probe must plan exactly the pre-widen files")
    s.sql(
      """SELECT CAST(k % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(k) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM graft.kvq.widen_t GROUP BY CAST(k % 7 AS BIGINT)
        |ORDER BY grp""".stripMargin)
  }

  /** §1.2 judged: the TYPED Dataset surface over the kv CONNECTOR — a
    * case-class `Dataset[TypedOrder]` read through the DSv2 table, a
    * typed lambda filter, and a custom `Aggregator` (`.toColumn` over
    * `groupByKey`) whose exact-decimal buffer makes the typed fold
    * bit-equal to the relational CAST-DECIMAL oracle. Keeps the typed
    * path honest as the connector grows: the same commit-protocol table
    * the relational queries use serves `Dataset[T]` end to end. */
  def kvTypedAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tmp = s"$scratch/kv_typed"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.typed_t")
    s.sql("CREATE TABLE graft.kvq.typed_t (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("ord_ty_v")
    s.sql("INSERT INTO graft.kvq.typed_t SELECT o_orderkey, " +
      "o_orderstatus, o_totalprice FROM ord_ty_v")
    val ds = s.table("graft.kvq.typed_t").as[TypedOrder]
    ds.filter(_.o_totalprice > 50000.0)
      .groupByKey(_.o_orderstatus)
      .agg(StatusPriceAgg.toColumn.name("b"))
      .toDF("o_orderstatus", "b")
      .select(col("o_orderstatus"), col("b.cnt").as("cnt"),
        col("b.total").cast(org.apache.spark.sql.types.DecimalType(18, 6))
          .cast(org.apache.spark.sql.types.DoubleType).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** A8 judged: CHERRY-PICK — promote ONE audited epoch from a staging
    * branch onto the parent as a fresh epoch (Iceberg's
    * cherrypick_snapshot), the WAP refinement for multi-batch ingest:
    * stage several batches, audit them independently, publish only the
    * one that passed — even after the PARENT advanced past the fork
    * (where FAST FORWARD refuses, required in-query). Also required: the
    * branch keeps serving both staged batches untouched, the unaudited
    * batch never leaks into the parent, and a branch DELETE (rewrite)
    * epoch refuses to promote — its position-deletes target state the
    * parent may not share. The parent aggregate hash-gates fork + own
    * commit + exactly the picked batch. */
  def kvCherrypick(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cp"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.cp_t")
    s.sql("CREATE TABLE graft.kvq.cp_t (o_orderkey BIGINT, " +
      "o_totalprice DOUBLE) USING graft_kv " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("ord_cp_v")
    def slice(k: Int): String = "SELECT o_orderkey, o_totalprice " +
      s"FROM ord_cp_v WHERE o_orderkey % 4 = $k"
    s.sql(s"INSERT INTO graft.kvq.cp_t ${slice(0)}") // fork base, epoch 0
    graft.ops.Ddl.execute(s, "ALTER TABLE graft.kvq.cp_t CREATE BRANCH stage")
    // two staged batches, audited independently (branch epochs 1 and 2)
    s.sql(s"INSERT INTO graft.kvq.cp_t.branch_stage ${slice(1)}")
    s.sql(s"INSERT INTO graft.kvq.cp_t.branch_stage ${slice(2)}")
    // the parent ADVANCES past the fork: FAST FORWARD is now refused —
    // exactly the situation cherry-pick exists for
    s.sql(s"INSERT INTO graft.kvq.cp_t ${slice(3)}")
    val ffRefused =
      try { graft.ops.Ddl.execute(s,
        "ALTER TABLE graft.kvq.cp_t FAST FORWARD stage"); false }
      catch { case _: Exception => true }
    require(ffRefused, "FAST FORWARD must refuse once the parent advanced")
    // audit batch 1 ON THE BRANCH, then promote exactly that epoch
    require(s.table("graft.kvq.cp_t.branch_stage")
      .where("o_orderkey % 4 = 1 AND o_totalprice < 0").count() == 0,
      "staged batch failed its audit")
    val bdir = graft.sources.GraftKvSink.branchDirOf(tmp, "stage")
    val bm = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(bdir))
    val pickedCount = bm.files.count { case (n, _) =>
      !n.startsWith("/") && graft.sources.GraftKvSink.epochOf(n) == 1L }
    require(pickedCount > 0, "branch epoch 1 published no files")
    graft.ops.Ddl.execute(s,
      "ALTER TABLE graft.kvq.cp_t CHERRY-PICK EPOCH 1 FROM BRANCH stage")
    val m2 = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(m2.files.count { case (n, _) =>
      graft.sources.GraftKvSink.epochOf(n) == 2L } == pickedCount,
      "the picked batch must land as ONE fresh parent epoch")
    // the branch still serves BOTH staged batches (nothing moved)
    val bCnt = s.table("graft.kvq.cp_t.branch_stage").count()
    val base = s.sql(s"SELECT count(*) FROM (${slice(0)})").first().getLong(0)
    val s1 = s.sql(s"SELECT count(*) FROM (${slice(1)})").first().getLong(0)
    val s2 = s.sql(s"SELECT count(*) FROM (${slice(2)})").first().getLong(0)
    require(bCnt == base + s1 + s2, s"branch diverged: $bCnt")
    // the unaudited batch (slice 2) never leaked into the parent
    require(s.table("graft.kvq.cp_t").where("o_orderkey % 4 = 2")
      .count() == 0, "unaudited batch leaked into the parent")
    // refusal arm: a branch REWRITE epoch (CoW DELETE) must not promote
    val delKey = s.table("graft.kvq.cp_t.branch_stage")
      .orderBy("o_orderkey").select("o_orderkey").head().getLong(0)
    s.sql(s"DELETE FROM graft.kvq.cp_t.branch_stage WHERE o_orderkey = $delKey")
    val bm3 = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(bdir))
    val delEpoch = bm3.removed.map(_.removedAt).max
    val cpRefused =
      try { graft.sources.GraftKvSink.cherryPick(tmp, "stage", delEpoch)
        false }
      catch { case _: Exception => true }
    require(cpRefused, "a rewrite epoch must refuse to cherry-pick")
    s.sql(
      """SELECT CAST(o_orderkey % 5 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.cp_t GROUP BY CAST(o_orderkey % 5 AS BIGINT)
        |ORDER BY grp""".stripMargin)
  }

  /** A9 judged: BOOLEAN + DECIMAL(p,s) kv column types — everyday
    * relational types stored as canonical plain strings (decimals at the
    * declared scale, booleans as true/false) with the full metadata
    * stack: per-file min/max stats ordered by BigDecimal compare (string
    * order would put "9.5" above "10.5" — the classic decimal-pruning
    * trap), identity partition tuples on a BOOLEAN column, and exact
    * round-trips. Required in-query: a DECIMAL range probe prunes to
    * exactly the price-band slice's files, a BOOLEAN partition probe
    * plans exactly that partition's files, and DECIMAL precision widening
    * is one metadata publish. The per-flag aggregate (sum as DOUBLE,
    * min/max as exact STRING images) hash-gates against the relational
    * replay. */
  def kvDecimalTypes(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_dec"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.dec_t")
    s.sql("CREATE TABLE graft.kvq.dec_t (o_orderkey BIGINT, " +
      "price DECIMAL(12,2), flag BOOLEAN) USING graft_kv " +
      s"PARTITIONED BY (flag) OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("ord_dec_v")
    // three price-band slices x two flag partitions: per-file decimal
    // ranges are disjoint across bands, so a band probe must prune
    Seq("o_totalprice < 50000",
        "o_totalprice >= 50000 AND o_totalprice < 150000",
        "o_totalprice >= 150000").foreach { band =>
      s.sql("INSERT INTO graft.kvq.dec_t SELECT o_orderkey, " +
        "CAST(o_totalprice AS DECIMAL(12,2)), o_orderkey % 3 = 0 " +
        s"FROM ord_dec_v WHERE $band")
    }
    val m = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    def bandFiles(pred: (String, String) => Boolean): Int =
      m.files.count { case (n, _) =>
        m.stats.getOrElse(n, Map.empty).get("price")
          .exists { case (mn, mx) => pred(mn, mx) } }
    val lowBand = bandFiles((_, mx) => new java.math.BigDecimal(mx)
      .compareTo(new java.math.BigDecimal("50000")) < 0)
    require(lowBand > 0 && lowBand < m.files.size,
      s"fixture must split price bands across files ($lowBand/${m.files.size})")
    def planned(fs: org.apache.spark.sql.sources.Filter*): Int =
      new graft.sources.GraftKvScan(tmp, None, fs).planInputPartitions().length
    // DECIMAL pruning is exact: the low-band probe plans exactly the
    // files whose recorded max is below the bound
    require(planned(org.apache.spark.sql.sources.LessThan("price",
        new java.math.BigDecimal("50000.00"))) == lowBand,
      "decimal range probe must prune to the low band's files")
    // BOOLEAN identity partition pruning is exact
    val trueFiles = m.files.count { case (n, _) =>
      m.stats.getOrElse(n, Map.empty).get("part:flag").exists(_._1 == "true") }
    require(trueFiles > 0 && planned(org.apache.spark.sql.sources
        .EqualTo("flag", true)) == trueFiles,
      "boolean partition probe must plan exactly the true partition")
    // DECIMAL precision widening: one metadata publish, zero files moved
    val files0 = m.files.map(_._1).toSet
    s.sql("ALTER TABLE graft.kvq.dec_t ALTER COLUMN price TYPE DECIMAL(18,2)")
    val m1 = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(m1.files.map(_._1).toSet == files0,
      "decimal precision widen must be metadata-only")
    require(m1.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 2), m1.schema.simpleString)
    s.sql(
      """SELECT flag, count(*) AS cnt,
        |  CAST(sum(price) AS DOUBLE) AS price_sum,
        |  CAST(min(price) AS STRING) AS price_min,
        |  CAST(max(price) AS STRING) AS price_max
        |FROM graft.kvq.dec_t GROUP BY flag ORDER BY flag""".stripMargin)
  }

  /** §7.45 judged: the TWO-LEVEL MANIFEST — manifest-list + hash-assigned
    * per-partition-bucket shard files, the metadata-scale ring a 100-TB
    * table needs. The single-JSON manifest has a MEASURED cliff
    * (ManifestProbe, r19: 1e6 file entries = 573 MB JSON, 52-88 s per
    * op, OOMs an 8 GB driver — and 100 TB at 128 MB files is ~8e5
    * entries); past the split, per-file entries live in shard files and
    * the list carries per-shard content digests, conservative column
    * summaries and distinct partition-tuple sets. Required in-query:
    * (a) resharding is LOSSLESS pure metadata (same files/stats/blooms);
    * (b) a single-partition commit rewrites EXACTLY ONE shard and
    * re-references every untouched shard file byte-for-byte (commit
    * cost ∝ commit size, not table size); (c) a partition probe PARSES
    * exactly one shard (the plan text exposes shards=parsed/total) yet
    * plans exactly the files the full per-file pruner would — pruning
    * semantics unchanged, only parse cost moves. The final per-region
    * aggregate hash-gates the data against the relational replay.
    * [ref*: Iceberg manifest-list/manifest split — public design] */
  def kvManifestShard(s: SparkSession, d: String): DataFrame = {
    import graft.sources.GraftKvSink
    val tmp = s"$scratch/kv_mshard"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.mshard_t")
    s.sql("CREATE TABLE graft.kvq.mshard_t (o_orderkey BIGINT, " +
      "region STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (region) OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("ord_ms_v")
    s.sql("INSERT INTO graft.kvq.mshard_t SELECT o_orderkey, " +
      "concat('r', CAST(o_orderkey % 5 AS INT)), o_totalprice FROM ord_ms_v")
    def mf() = GraftKvSink.readManifest(GraftKvSink.manifestPath(tmp))
    val m0 = mf()
    require(m0.shardCount == 0 && m0.shardInfo.isEmpty,
      "a fresh small table must start on the legacy single-JSON layout")
    // opt in to the two-level layout (tables past the split threshold do
    // this themselves on their next commit)
    s.sql("ALTER TABLE graft.kvq.mshard_t SET TBLPROPERTIES " +
      "('manifest.shards' = '8')")
    val m1 = mf()
    require(m1.shardCount == 8 && m1.shardInfo.nonEmpty,
      s"reshard did not take: shardCount=${m1.shardCount}")
    require(m1.files.toSet == m0.files.toSet && m1.stats == m0.stats &&
      m1.blooms == m0.blooms,
      "resharding must be lossless pure metadata")
    val sigs0 = m1.shardInfo.map(si => si.id -> si.sig).toMap
    val files0 = m1.shardInfo.map(si => si.id -> si.file).toMap
    // one partition's worth of new rows -> exactly one shard rewrites
    s.sql("INSERT INTO graft.kvq.mshard_t SELECT o_orderkey + 100000000, " +
      "'r2', o_totalprice FROM ord_ms_v WHERE o_orderkey % 5 = 2")
    val m2 = mf()
    val changedIds = m2.shardInfo.filter(si =>
      !sigs0.get(si.id).contains(si.sig)).map(_.id).toSet
    require(changedIds.size == 1,
      s"a single-partition commit must rewrite exactly its one shard, " +
        s"touched ${changedIds.size}")
    require(m2.shardInfo.filterNot(si => changedIds(si.id)).forall(si =>
        files0.get(si.id).contains(si.file)),
      "an untouched shard was re-serialized (commit cost must be " +
        "proportional to the commit, not the table)")
    // shard-pruned planning: the r1 probe parses ONLY the shard whose
    // tuple set holds r1 (same-tuple files co-locate by construction)
    val scan = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("region", "r1")))
    val desc = scan.description()
    val ShardsRe = """shards=(\d+)/(\d+)""".r.unanchored
    val (parsed, total) = desc match {
      case ShardsRe(a, b) => (a.toInt, b.toInt)
      case _ => throw new IllegalStateException(
        s"plan does not expose shard parse counts: $desc")
    }
    require(total == m2.shardInfo.length && total >= 2,
      s"fixture must spread partitions over several shards, got $total")
    require(parsed == 1,
      s"the r1 probe must parse exactly r1's shard, parsed $parsed/$total")
    val r1Files = m2.files.count { case (n, _) =>
      m2.stats.getOrElse(n, Map.empty).get("part:region")
        .exists(_._1 == "r1") }
    require(r1Files > 0 && scan.planInputPartitions().length == r1Files,
      "shard pruning changed the planned file set")
    s.sql(
      """SELECT region, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.mshard_t WHERE region IN ('r1', 'r2')
        |GROUP BY region ORDER BY region""".stripMargin)
  }

  /** §7.46 judged: ARRAY kv columns — the embeddings table's own
    * `ARRAY<FLOAT>` shape living NATIVELY in a kv table (one `[e1,e2,…]`
    * TSV cell, element images in the element type's canonical scalar
    * form — parsing is a split inside the cell, so the row format is
    * additively unchanged). Required in-query: (a) the kv read is
    * BIT-EQUAL to the parquet source (exceptAll both ways — the float
    * shortest-decimal codec round-trips exactly); (b) array columns
    * record NO min/max (arrays have no pruning order — absent stats
    * never prune, the standing soundness rule; Iceberg records none
    * either) while `cnt:`/`len:` sketches ride (len = TOTAL ELEMENT
    * COUNT, required = 64 × non-null rows on this fixture); (c) the
    * partition-transform refusal arm (no transform output exists over
    * an array). A CoW UPDATE then rewrites array cells (slice), and the
    * per-label aggregate over size() + integerized element values
    * hash-gates against the relational replay. */
  def kvArrayTypes(s: SparkSession, d: String): DataFrame = {
    import graft.sources.GraftKvSink
    val tmp = s"$scratch/kv_arr"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.arr_t")
    s.sql("CREATE TABLE graft.kvq.arr_t (vec_id BIGINT, " +
      "emb ARRAY<FLOAT>, label INT) USING graft_kv " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    Tables.embeddings(s, d).createOrReplaceTempView("emb_ar_v")
    s.sql("INSERT INTO graft.kvq.arr_t SELECT vec_id, embedding, label " +
      "FROM emb_ar_v")
    // (a) bit-exact round-trip through the text codec
    val src = s.sql("SELECT vec_id, embedding AS emb FROM emb_ar_v")
    val back = s.table("graft.kvq.arr_t").select("vec_id", "emb")
    val diff = back.exceptAll(src).count() + src.exceptAll(back).count()
    require(diff == 0, s"array round-trip must be bit-exact ($diff rows)")
    // (b) no min/max for the array column; len: counts elements
    val m = GraftKvSink.readManifest(GraftKvSink.manifestPath(tmp))
    require(m.files.nonEmpty)
    m.files.foreach { case (n, _) =>
      require(!m.stats.getOrElse(n, Map.empty).keys
          .exists(_.equalsIgnoreCase("emb")),
        s"array column recorded a min/max range in $n — arrays must " +
          "never prune")
    }
    val lenSum = m.blooms.values.flatMap(_.get("len:emb")).map(_.toLong).sum
    val cntSum = m.blooms.values.flatMap(_.get("cnt:emb")).map(_.toLong).sum
    require(cntSum > 0 && lenSum == cntSum * 64L,
      s"len: sketch must count elements (len $lenSum vs cnt $cntSum x 64)")
    // (c) refusal arm: no transform output exists over an array
    val refused = try {
      graft.sources.GraftPartition.parseOne("emb", m.schema); false
    } catch { case e: IllegalArgumentException =>
      e.getMessage.contains("ARRAY") }
    require(refused, "array partition transform must refuse")
    // array DML: CoW rewrite of the cells themselves
    s.sql("UPDATE graft.kvq.arr_t SET emb = slice(emb, 1, 32) " +
      "WHERE vec_id % 50 = 0")
    s.sql(
      """SELECT CAST(label % 4 AS INT) AS grp, count(*) AS cnt,
        |  CAST(sum(size(emb)) AS BIGINT) AS total_len,
        |  CAST(sum(CAST(floor(CAST(element_at(emb, 1) AS DOUBLE) *
        |    1000000) AS BIGINT)) AS BIGINT) AS e1_sum
        |FROM graft.kvq.arr_t GROUP BY CAST(label % 4 AS INT)
        |ORDER BY grp""".stripMargin)
  }

  /** A8 judged: SHALLOW CLONE — a ZERO-COPY branch of a kv table at an
    * epoch boundary (the Delta `CREATE TABLE … SHALLOW CLONE` shape). The
    * clone's manifest references the source's files by absolute path, so
    * branching a 100 TB table is ONE metadata write; from then on the
    * tables diverge — the clone's corrected load lands in its own
    * directory and the source never sees it. The query requires the
    * zero-copy property (every reference foreign, no data file in the
    * clone's directory), then gates three arms: the diverged clone, the
    * untouched source, and the clone's boundary state. */
  def kvClone(s: SparkSession, d: String): DataFrame = {
    val tmpS = s"$scratch/kv_cln_src"
    val tmpT = s"$scratch/kv_cln_tgt"
    clearDir(tmpS); clearDir(tmpT)
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_cs")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_ct")
    s.sql("CREATE TABLE graft.kvq.orders_cs (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmpS')")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Seq(0, 1, 2).foreach { k =>
      o.filter(col("o_orderkey") % 6 === k)
        .write.format("graft.sources.GraftKvSink").option("path", tmpS)
        .option("epoch", (k + 1).toString).mode(SaveMode.Append).save()
    }
    s.sql("CREATE TABLE graft.kvq.orders_ct SHALLOW CLONE " +
      s"graft.kvq.orders_cs VERSION AS OF 2 LOCATION '$tmpT'")
    // zero-copy: every reference is foreign; no data file was copied
    val refs = graft.sources.GraftKvSink.listedFiles(tmpT)._1
    require(refs.nonEmpty && refs.forall(_.startsWith("/")),
      s"clone must reference the source in place, got $refs")
    // the corrected load lands on the CLONE only — the tables diverge
    o.filter(col("o_orderkey") % 6 === 3)
      .write.format("graft.sources.GraftKvSink").option("path", tmpT)
      .option("epoch", "5").mode(SaveMode.Append).save()
    s.sql(
      """SELECT arm, cnt, key_sum, total FROM (
        |  SELECT 1 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_ct
        |  UNION ALL
        |  SELECT 2 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_cs
        |  UNION ALL
        |  SELECT 3 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_ct VERSION AS OF 2
        |) ORDER BY arm""".stripMargin)
  }

  /** A8 judged: DESCRIBE DETAIL — the one-row table-metadata snapshot
    * (the Delta shape): format, row count (merge-on-read deltas netted the
    * way every metadata answer here nets them), clustering columns, and
    * the constraint set. The oracle recomputes the visible row count
    * relationally; file-count/byte fields are layout-dependent and gated
    * in-code instead. */
  def kvDetail(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_dt"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.line_dt")
    s.sql("CREATE TABLE graft.kvq.line_dt (l_orderkey BIGINT, " +
      "l_quantity DOUBLE) USING graft_kv " +
      s"OPTIONS (path '$tmp', mor 'true', 'check.qty_pos' = 'l_quantity >= 0')")
    Tables.lineitem(s, d).createOrReplaceTempView("line_dt_v")
    s.sql("INSERT INTO graft.kvq.line_dt SELECT l_orderkey, l_quantity " +
      "FROM line_dt_v WHERE l_orderkey % 2 = 0")
    // a merge-on-read DELETE: the detail row must NET the delta's effect
    s.sql("DELETE FROM graft.kvq.line_dt WHERE l_orderkey % 10 = 4")
    val det = s.sql("DESCRIBE DETAIL graft.kvq.line_dt")
    val r = det.collect().head
    require(r.getAs[Long]("num_delta_files") >= 1L,
      "the MOR delete must surface as delta files")
    require(r.getAs[Long]("size_bytes") > 0L, "size must be positive")
    require(r.getAs[String]("location") == tmp, "location must be the path")
    det.select(col("format"), col("num_rows"),
      col("clustering_columns"), col("constraints"))
  }

  /** A8 judged: RESTORE TABLE … TO VERSION AS OF — the Delta-shaped undo.
    * A bad load (epoch 3) is rolled back by a manifest-level restore
    * COMMIT: post-boundary files move to retained history (no data file
    * copied or deleted), pre-restore states keep time-traveling until
    * vacuum, and the table keeps taking appends above the restore. The
    * three arms gate the restored state, the retained pre-restore state,
    * and the post-restore append path in one frame. */
  def kvRestore(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_rst"
    clearDir(tmp) // explicit-epoch appends fence on a replayed history
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_rst")
    s.sql("CREATE TABLE graft.kvq.orders_rst (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Seq(0, 1, 2).foreach { k =>
      o.filter(col("o_orderkey") % 5 === k)
        .write.format("graft.sources.GraftKvSink").option("path", tmp)
        .option("epoch", (k + 1).toString).mode(SaveMode.Append).save()
    }
    // epoch 3 was a bad load: undo it (restore commit = epoch 4)
    s.sql("RESTORE TABLE graft.kvq.orders_rst TO VERSION AS OF 2")
    // life goes on: a corrected load lands above the restore commit
    o.filter(col("o_orderkey") % 5 === 3)
      .write.format("graft.sources.GraftKvSink").option("path", tmp)
      .option("epoch", "5").mode(SaveMode.Append).save()
    s.sql(
      """SELECT arm, cnt, key_sum, total FROM (
        |  SELECT 1 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_rst VERSION AS OF 4
        |  UNION ALL
        |  SELECT 2 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_rst VERSION AS OF 3
        |  UNION ALL
        |  SELECT 3 AS arm, count(*) AS cnt,
        |    CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.kvq.orders_rst
        |) ORDER BY arm""".stripMargin)
  }

  /** A8 judged: CHECK constraints (`check.<name>` table properties, the
    * Delta `delta.constraints.*` shape). A violating INSERT and a
    * violating UPDATE both fail their JOB before the connector commits —
    * enforcement is a raise-on-violation filter inside the write's own
    * plan (no extra pass, no shuffle, any scale) — so the final table
    * state equals the clean relational replay, which is what the oracle
    * hashes. The query itself requires both refusals to have fired. */
  def kvConstraint(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cns"
    clearDir(tmp)
    s.sql("DROP TABLE IF EXISTS graft.kvq.line_cns")
    s.sql("CREATE TABLE graft.kvq.line_cns (l_orderkey BIGINT, " +
      "l_returnflag STRING, l_quantity DOUBLE) USING graft_kv " +
      s"OPTIONS (path '$tmp', 'check.qty_pos' = 'l_quantity >= 0')")
    Tables.lineitem(s, d).createOrReplaceTempView("line_cns_v")
    s.sql("INSERT INTO graft.kvq.line_cns SELECT l_orderkey, l_returnflag, " +
      "l_quantity FROM line_cns_v WHERE l_orderkey % 3 = 0")
    def refused(sql: String): Boolean =
      try { s.sql(sql); false }
      catch { case e: Exception =>
        var m = new StringBuilder; var c: Throwable = e
        while (c != null) { m ++= Option(c.getMessage).getOrElse(""); c = c.getCause }
        m.toString.contains("qty_pos")
      }
    require(refused("INSERT INTO graft.kvq.line_cns SELECT l_orderkey, " +
      "l_returnflag, -l_quantity FROM line_cns_v " +
      "WHERE l_orderkey % 3 = 1 AND l_quantity > 0"),
      "violating INSERT must refuse with the constraint name")
    require(refused("UPDATE graft.kvq.line_cns SET l_quantity = -1.0D " +
      "WHERE l_orderkey % 5 = 0"),
      "violating UPDATE must refuse with the constraint name")
    s.sql(
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM graft.kvq.line_cns
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** A7-DSv2/A8 (catalog route): the kv WRITE connector driven end to end
    * through PURE multipart SQL — CREATE TABLE … USING graft_kv under the
    * `graft` TableCatalog plugin, INSERT OVERWRITE … SELECT (truncate +
    * commit protocol), INSERT INTO … VALUES (append merging the manifest),
    * then an aggregate read back through the same catalog identifier. The
    * oracle recomputes the union relationally, so catalog resolution, both
    * insert modes, and the manifest scan are hash-gated as one path. */
  def catalogKvDml(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/catalog_kv"
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_kv")
    s.sql("CREATE TABLE graft.kvq.orders_kv (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_cat_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_kv " +
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders_cat_v " +
      "WHERE o_orderkey % 3 = 0")
    s.sql("INSERT INTO graft.kvq.orders_kv " +
      "VALUES (CAST(-1 AS BIGINT), 'Z', 0.5D)")
    s.sql(
      """SELECT o_orderstatus, count(*) AS cnt, min(o_orderkey) AS min_key,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.orders_kv
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** A8 judged: DEFAULT columns through Spark's own machinery — the
    * catalog advertises SUPPORT_COLUMN_DEFAULT_VALUE, the CREATE/ALTER
    * schema carries CURRENT_DEFAULT field metadata (persisted in the
    * manifest like every table-bound invariant), and the analyzer splices
    * defaults into INSERTs that omit the column. Three default shapes are
    * judged: a CREATE-time default (wave 1 omits `src`), an ALTER-time
    * default on an evolved column (history NULL-fills — evolution stays
    * pure metadata; wave 2's new rows get 'fresh'), and the explicit
    * DEFAULT keyword in VALUES. The oracle replays each wave with its
    * expected literals, so a default landing wrong (or retroactively
    * rewriting history) hash-mismatches. */
  def kvDefaults(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_defaults"
    s.sql("DROP TABLE IF EXISTS graft.df.t")
    clearDir(tmp) // repeat runs must re-CREATE from no history
    s.sql("CREATE TABLE graft.df.t (id BIGINT, qty DOUBLE, " +
      "src STRING DEFAULT 'manual') " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_def_v")
    s.sql("INSERT INTO graft.df.t (id, qty) " +
      "SELECT o_orderkey, o_totalprice FROM orders_def_v " +
      "WHERE o_orderkey % 10 = 0")
    s.sql("ALTER TABLE graft.df.t ADD COLUMN flag STRING DEFAULT 'fresh'")
    s.sql("INSERT INTO graft.df.t (id, qty, src) " +
      "SELECT o_orderkey, o_totalprice, 'w2' FROM orders_def_v " +
      "WHERE o_orderkey % 10 = 3")
    s.sql("INSERT INTO graft.df.t " +
      "VALUES (CAST(-1 AS BIGINT), 0.5D, DEFAULT, DEFAULT)")
    s.sql("SELECT id, qty, src, flag FROM graft.df.t ORDER BY id")
  }

  /** A8 judged NAMED REFS (the Iceberg tag shape): CREATE TAG pins an
    * epoch boundary by name — `VERSION AS OF 'snap'` resolves through the
    * manifest's refs map, and VACUUM keeps exactly the retained CoW files
    * the tagged state reconstructs from while reclaiming everything else
    * (the function REQUIRES the untagged pre-rewrite boundary to refuse
    * after vacuum, so a silently-skipped reclaim cannot pass). The judged
    * frame unions the tagged read with the current state; the oracle
    * replays both relationally, so a tag drifting off its boundary — or
    * pinning more or less than its exact state — hash-mismatches. */
  def kvTagTravel(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_tag"
    s.sql("DROP TABLE IF EXISTS graft.tag.o")
    clearDir(tmp) // repeat runs re-CREATE from no history
    s.sql("CREATE TABLE graft.tag.o (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_tag_v")
    (0 to 2).foreach { r =>
      s.sql("INSERT INTO graft.tag.o SELECT o_orderkey, o_orderstatus, " +
        s"o_totalprice FROM orders_tag_v WHERE o_orderkey % 3 = $r")
    }
    Ddl.execute(s, "ALTER TABLE graft.tag.o CREATE TAG snap AS OF VERSION 1")
    // one CoW DELETE rewrites every file: the pre-tag originals pin under
    // the tag, the post-tag original is reclaimable history
    s.sql("DELETE FROM graft.tag.o WHERE o_orderkey % 2 = 0")
    Ddl.execute(s, "VACUUM graft.tag.o RETAIN 0 MINUTES")
    // the vacuum must have fenced untagged pre-rewrite history…
    val untaggedReadable =
      try { s.sql("SELECT count(*) FROM graft.tag.o VERSION AS OF 0")
        .collect(); true }
      catch { case _: Exception => false }
    require(!untaggedReadable,
      "kv_tag: untagged history below the fence must refuse after VACUUM")
    // …while the tag still answers exactly
    s.sql(
      """SELECT * FROM (
        |  SELECT 'tag' AS state, o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM graft.tag.o VERSION AS OF 'snap' GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'cur', o_orderstatus, count(*),
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM graft.tag.o GROUP BY o_orderstatus
        |) ORDER BY state, o_orderstatus""".stripMargin)
  }

  /** A8 judged WRITABLE BRANCHES (the Iceberg branch shape): CREATE
    * BRANCH forks a writable head off the current epoch (one refs entry +
    * one zero-copy clone manifest — branching 100 TB is metadata), writes
    * route to it as `graft.x.t.branch_<name>` while the parent is
    * UNTOUCHED (required in-query), `VERSION AS OF '<name>'` reads the
    * branch HEAD including its own CoW rewrite, and FAST FORWARD
    * publishes the branch back as the parent's current state — the
    * "experiment on production data, then promote" workflow. The oracle
    * replays the promoted end state relationally (base ∪ branch-added
    * rows, with the branch's UPDATE folded in), so a branch leaking into
    * the parent early, dropping rows at fast-forward, or losing the
    * rewrite hash-mismatches. */
  def kvBranch(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_branch"
    s.sql("DROP TABLE IF EXISTS graft.br.li")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.br.li (l_orderkey BIGINT, l_linenumber BIGINT, " +
      "l_quantity DOUBLE, l_returnflag STRING) " +
      s"USING graft_kv OPTIONS (path '$tmp', epochs 'true')")
    Tables.lineitem(s, d).createOrReplaceTempView("li_br_v")
    s.sql("INSERT INTO graft.br.li SELECT l_orderkey, CAST(l_linenumber " +
      "AS BIGINT), l_quantity, l_returnflag FROM li_br_v " +
      "WHERE l_orderkey % 4 = 0")
    val baseCnt = s.table("graft.br.li").count()
    Ddl.execute(s, "ALTER TABLE graft.br.li CREATE BRANCH exp")
    // branch writes: an append AND a CoW UPDATE, both invisible to main
    s.sql("INSERT INTO graft.br.li.branch_exp SELECT l_orderkey, " +
      "CAST(l_linenumber AS BIGINT), l_quantity, l_returnflag FROM li_br_v " +
      "WHERE l_orderkey % 4 = 1")
    s.sql("UPDATE graft.br.li.branch_exp SET l_quantity = l_quantity + 100 " +
      "WHERE l_returnflag = 'R'")
    require(s.table("graft.br.li").count() == baseCnt,
      "branch writes must not touch the parent")
    val headCnt = s.sql(
      "SELECT count(*) FROM graft.br.li VERSION AS OF 'exp'").head.getLong(0)
    require(headCnt > baseCnt, s"branch head must hold its own appends " +
      s"($headCnt vs $baseCnt)")
    Ddl.execute(s, "ALTER TABLE graft.br.li FAST FORWARD TO 'exp'")
    require(s.table("graft.br.li").count() == headCnt,
      "fast forward must publish the branch head exactly")
    // the ref is gone with the publish
    require(!Ddl.execute(s, "SHOW TAGS graft.br.li").collect()
      .exists(_.getString(0) == "exp"), "published branch must drop its ref")
    s.sql(
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM graft.br.li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** A6/A9 judged: MERGE schema evolution — `MERGE WITH SCHEMA EVOLUTION
    * INTO` a kv table whose source carries a column the target lacks:
    * Spark's own ResolveMergeIntoSchemaEvolution (unlocked by the
    * connector's AUTOMATIC_SCHEMA_EVOLUTION capability) widens the
    * manifest schema through the catalog's ALTER path, the merge's
    * delta write lands full-width, untouched history null-fills, and a
    * PLAIN merge with the same source must NOT evolve (statement-level
    * opt-in — required in-query, so silent auto-widening can never
    * pass). The oracle replays the upsert + widening relationally. */
  def kvMergeEvolve(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_mevo"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_me")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_me (o_orderkey BIGINT, price DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', mor 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_me_v")
    s.sql("INSERT INTO graft.kvq.o_me SELECT o_orderkey, o_totalprice " +
      "FROM orders_me_v WHERE o_orderkey % 3 = 0")
    s.sql("SELECT o_orderkey, o_totalprice * 2 AS price, o_orderstatus " +
      "FROM orders_me_v WHERE o_orderkey % 2 = 0")
      .createOrReplaceTempView("o_me_src")
    // a PLAIN merge must not widen (statement-level opt-in)
    s.sql("MERGE INTO graft.kvq.o_me t USING o_me_src s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET price = s.price * 0 + t.price")
    require(s.table("graft.kvq.o_me").schema.fieldNames.toSeq ==
      Seq("o_orderkey", "price"), "plain MERGE must not evolve the schema")
    s.sql("MERGE WITH SCHEMA EVOLUTION INTO graft.kvq.o_me t " +
      "USING o_me_src s ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    require(s.table("graft.kvq.o_me").schema.fieldNames.toSeq ==
      Seq("o_orderkey", "price", "o_orderstatus"),
      "WITH SCHEMA EVOLUTION must widen the table")
    s.sql(
      """SELECT coalesce(o_orderstatus, '~') AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_me GROUP BY coalesce(o_orderstatus, '~')
        |ORDER BY st""".stripMargin)
  }

  /** A8/A12 judged: PARTITION EVOLUTION + SHOW PARTITIONS — the spec is
    * replaced mid-history (identity -> bucket) with NO rewrite: files
    * written under the old spec keep their own tuple entries and keep
    * pruning on them forever (the scan evaluates each file against the
    * transforms IT recorded), new writes split under the new spec, and
    * SHOW PARTITIONS reads the whole layout from the manifest — zero
    * data files opened. The judged frame is the old-spec half of SHOW
    * PARTITIONS against a relational oracle, so manifest metadata
    * drifting from the data it describes hash-mismatches; the new-spec
    * half and both pruning arms are required in-query. */
  /** A8/A9 judged: RENAME / DROP COLUMN on a kv table via COLUMN MAPPING
    * (the Iceberg field-id / Delta column-mapping shape, with physical
    * TSV positions as the ids: the manifest schema carries a per-field
    * `graft_pid`, dropped positions retire into `droppedPids` and are
    * never reused). Flow: CREATE partitioned + CHECKed → INSERT → RENAME
    * the partition source AND the checked column (required in-query:
    * ZERO data files moved, spec strings + per-file tuple keys + sketch
    * keys re-keyed in the one metadata publish, partition pruning stays
    * EXACT under the new name, and the CHECK — rewritten in the same
    * publish, the textual form of id-binding — still refuses violations)
    * → INSERT under the new names → DROP a column (its position retires;
    * readers project it away) → ADD a fresh column (claims a FRESH
    * position: the dropped column's committed values must never
    * resurface under the new name — required in-query) → INSERT a third
    * slice. The oracle replays all three slices relationally and
    * hash-gates the per-status aggregate across the three layout epochs.
    * At 100 TB: rename and drop each touch ONE manifest, zero data
    * files — schema evolution at constant cost however large the
    * table. */
  def kvColumnMapping(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cmap"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_cm")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_cm (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "USING graft_kv PARTITIONED BY (o_orderstatus) " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    s.sql("ALTER TABLE graft.kvq.o_cm SET TBLPROPERTIES " +
      "('check.pos' = 'o_totalprice >= 0')")
    Tables.orders(s, d).createOrReplaceTempView("o_cm_v")
    s.sql("INSERT INTO graft.kvq.o_cm SELECT o_orderkey, o_custkey, " +
      "o_orderstatus, o_totalprice FROM o_cm_v WHERE o_orderkey % 3 = 0")
    def mf() = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    val m0 = mf()
    s.sql("ALTER TABLE graft.kvq.o_cm RENAME COLUMN o_orderstatus TO status")
    s.sql("ALTER TABLE graft.kvq.o_cm RENAME COLUMN o_totalprice TO price")
    val m1 = mf()
    require(m1.files.map(_._1).sorted == m0.files.map(_._1).sorted,
      "RENAME must move zero data files")
    require(m1.partitionSpec == Seq("status"), m1.partitionSpec)
    require(m1.files.forall(f => m1.stats(f._1).contains("part:status")),
      "per-file tuple keys must re-key with the rename")
    // partition pruning stays EXACT under the new name
    val fFiles = m1.files.count(f => m1.stats(f._1)("part:status")._1 == "F")
    val planned = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("status", "F")))
      .planInputPartitions().length
    require(planned == fFiles && fFiles < m1.files.length,
      s"status probe planned $planned of ${m1.files.length} (F: $fFiles)")
    // the CHECK survived its column's rename (SQL text re-keyed in the
    // same publish — the textual equivalent of binding by field id)
    val viol =
      try { s.sql("INSERT INTO graft.kvq.o_cm VALUES " +
        "(-1L, -1L, 'F', -5.0)"); false }
      catch { case _: Exception => true }
    require(viol, "renamed CHECK must still refuse violations")
    s.sql("INSERT INTO graft.kvq.o_cm SELECT o_orderkey, o_custkey, " +
      "o_orderstatus, o_totalprice FROM o_cm_v WHERE o_orderkey % 3 = 1")
    s.sql("ALTER TABLE graft.kvq.o_cm DROP COLUMN o_custkey")
    s.sql("ALTER TABLE graft.kvq.o_cm ADD COLUMN src STRING")
    require(
      s.table("graft.kvq.o_cm").where("src IS NOT NULL").count() == 0L,
      "dropped o_custkey values resurfaced under the added 'src'")
    s.sql("INSERT INTO graft.kvq.o_cm SELECT o_orderkey, o_orderstatus, " +
      "o_totalprice, 'late' FROM o_cm_v WHERE o_orderkey % 3 = 2")
    s.sql(
      """SELECT status, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  count(src) AS late_cnt
        |FROM graft.kvq.o_cm
        |GROUP BY status ORDER BY status""".stripMargin)
  }

  /** A8 judged: QUERYABLE METADATA TABLES (the Iceberg metadata-table
    * UX) — `SELECT … FROM graft.ns.t.files | t.partitions | t.history`
    * resolve by identifier suffix to manifest-derived relations, ZERO
    * data files opened. Required in-query: (1) `t.files` aggregated by
    * its partition column reproduces `t.partitions` exactly — the two
    * relations describe one manifest; (2) the metadata PREDICTS the
    * scan: the 'F' partition's file count in `t.files` equals the input
    * partitions a pruned scan then plans (the dashboard query and the
    * planner read the same truth); (3) `t.history` accounts for every
    * committed row across the three append epochs. The oracle hash-gates
    * the partitions relation against a relational group-by of the same
    * source rows. At 100 TB: these queries cost one manifest JSON read —
    * the maintenance dashboard never touches data files. */
  def kvMetaTables(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_meta"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_mt")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_mt (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      "USING graft_kv PARTITIONED BY (o_orderstatus) " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("o_mt_v")
    (0 until 3).foreach { i =>
      s.sql("INSERT INTO graft.kvq.o_mt SELECT o_orderkey, o_custkey, " +
        s"o_orderstatus, o_totalprice FROM o_mt_v WHERE o_orderkey % 3 = $i")
    }
    val files = s.table("graft.kvq.o_mt.files")
    val parts = s.table("graft.kvq.o_mt.partitions")
    val hist = s.table("graft.kvq.o_mt.history")
    val agg = files.where("kind = 'base'").groupBy("partition")
      .agg(count(lit(1)).as("nf"), sum(col("row_count")).as("nr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val pset = parts.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    require(agg == pset,
      s"files-aggregate and partitions disagree:\n$agg\nvs\n$pset")
    val fFiles = files
      .where("kind = 'base' AND partition = 'o_orderstatus=F'").count()
    val planned = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("o_orderstatus", "F")))
      .planInputPartitions().length
    require(planned == fFiles.toInt && fFiles > 0L,
      s"metadata predicted $fFiles files; the pruned scan planned $planned")
    val added = hist.agg(sum(col("rows_added"))).head.getLong(0)
    require(added == s.table("graft.kvq.o_mt").count(),
      s"history rows_added $added != visible row count")
    require(hist.where("operation = 'append'").count() == 3L,
      "three append epochs must report")
    s.table("graft.kvq.o_mt.partitions").orderBy("partition")
      .select(col("partition"), col("num_rows"))
  }

  /** A8 × B43 judged: WRITE-AUDIT-PUBLISH (the Iceberg WAP loop) through
    * a WRITABLE BRANCH with a TRUE STREAMING ingest leg. Flow: baseline
    * lands on the parent → CREATE BRANCH ingest → a streaming query
    * reads a kv feed through the connector's MicroBatchStream and
    * streams INTO THE BRANCH HEAD (`writeStream.toTable(….branch_
    * ingest)` — per-epoch idempotent manifest publishes on the branch's
    * own lineage, parent untouched) → an AUDIT query runs on the branch
    * (violation count == 0 AND exact expected rows — required in-query)
    * → FAST FORWARD publishes the audited state to the parent. The
    * NEGATIVE arm is required in-query too: a second branch takes a
    * poison batch, its audit fails, no fast-forward runs, and the parent
    * state is PROVEN unchanged before the poison branch drops. The
    * oracle hash-gates the parent's final aggregate: exactly baseline +
    * audited slice, never the poison. At 100 TB this is the ingest
    * pattern that makes audits free: the branch is a shallow fork (two
    * metadata writes), the stream is ordinary distributed epochs, and
    * publish is a file MOVE — audit-then-publish costs no rewrite. */
  def kvWap(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_wap"
    val feed = s"$scratch/kv_wap_feed"
    val ckpt = s"$scratch/kv_wap_ckpt"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_wap")
    Seq(tmp, feed, ckpt).foreach(clearDir)
    s.sql("CREATE TABLE graft.kvq.o_wap (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("o_wap_v")
    s.sql("INSERT INTO graft.kvq.o_wap SELECT o_orderkey, o_custkey, " +
      "o_orderstatus, o_totalprice FROM o_wap_v WHERE o_orderkey % 3 = 0")
    val parentBefore = s.table("graft.kvq.o_wap").count()
    // the audited leg: slice %3=1 arrives as a streaming feed epoch and
    // flows INTO THE BRANCH through the connector's streaming write
    Ddl.execute(s, "ALTER TABLE graft.kvq.o_wap CREATE BRANCH ingest")
    s.sql("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
      "FROM o_wap_v WHERE o_orderkey % 3 = 1")
      .write.format("graft.sources.GraftKvSink").option("path", feed)
      .mode(SaveMode.Append).save()
    val q = s.readStream.format("graft.sources.GraftKvSink")
      .option("path", feed).load()
      .writeStream.option("checkpointLocation", ckpt)
      .toTable("graft.kvq.o_wap.branch_ingest")
    try q.processAllAvailable() finally q.stop()
    // AUDIT on the branch: no violating rows, exactly the expected count
    val expect = s.sql(
      "SELECT count(*) FROM o_wap_v WHERE o_orderkey % 3 = 1")
      .head.getLong(0)
    val branchRows = s.table("graft.kvq.o_wap.branch_ingest").count()
    val bad = s.table("graft.kvq.o_wap.branch_ingest")
      .where("o_totalprice < 0 OR o_orderkey IS NULL").count()
    require(bad == 0L && branchRows == parentBefore + expect,
      s"audit failed: $bad violations, $branchRows rows " +
        s"(expected ${parentBefore + expect}) — not publishing")
    require(s.table("graft.kvq.o_wap").count() == parentBefore,
      "streaming into the branch must leave the parent untouched")
    // FAST FORWARD publishes the audited state and retires the branch
    Ddl.execute(s, "ALTER TABLE graft.kvq.o_wap FAST FORWARD TO 'ingest'")
    val published = s.table("graft.kvq.o_wap").count()
    require(published == parentBefore + expect,
      s"fast-forward published $published, expected ${parentBefore + expect}")
    // NEGATIVE arm: a poison batch fails its audit — never published
    Ddl.execute(s, "ALTER TABLE graft.kvq.o_wap CREATE BRANCH bad")
    s.sql("INSERT INTO graft.kvq.o_wap.branch_bad VALUES " +
      "(9999999L, 1L, 'F', -42.0)")
    val poison = s.table("graft.kvq.o_wap.branch_bad")
      .where("o_totalprice < 0").count()
    require(poison > 0L, "the poison row must be visible on its branch")
    // audit fails -> the WAP loop REFUSES to fast-forward; the parent is
    // proven byte-level unchanged before the branch drops
    require(s.table("graft.kvq.o_wap").count() == published &&
      s.table("graft.kvq.o_wap").where("o_totalprice < 0").count() == 0L,
      "an unaudited branch must never leak into the parent")
    Ddl.execute(s, "ALTER TABLE graft.kvq.o_wap DROP BRANCH bad")
    s.sql(
      """SELECT o_orderstatus AS status, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.o_wap
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin)
  }

  def kvPartitionEvolve(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_pevo"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_pe")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_pe (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_pe_v")
    s.sql("INSERT INTO graft.kvq.o_pe SELECT o_orderkey, o_custkey, " +
      "o_orderstatus FROM orders_pe_v WHERE o_orderkey % 3 = 0")
    Ddl.execute(s,
      "ALTER TABLE graft.kvq.o_pe SET PARTITIONED BY (bucket(8, o_custkey))")
    s.sql("INSERT INTO graft.kvq.o_pe SELECT o_orderkey, o_custkey, " +
      "o_orderstatus FROM orders_pe_v WHERE o_orderkey % 3 = 1")
    val parts = Ddl.execute(s, "SHOW PARTITIONS graft.kvq.o_pe").collect()
    val bucketRows = parts.filter(_.getString(0).startsWith("bucket("))
    require(bucketRows.nonEmpty, "new writes must split under the new spec")
    val b2 = s.sql("SELECT count(*) FROM orders_pe_v WHERE o_orderkey % 3 = 1")
      .head.getLong(0)
    require(bucketRows.map(_.getLong(2)).sum == b2,
      "bucket partitions must hold exactly the second batch")
    // old-spec files still prune on THEIR transform after evolution...
    val mf = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    val fFiles = mf.files.count(f => mf.stats.getOrElse(f._1, Map.empty)
      .get("part:o_orderstatus").exists(_._1 == "F"))
    val noStatus = mf.files.count(f => !mf.stats.getOrElse(f._1, Map.empty)
      .contains("part:o_orderstatus"))
    val planned = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("o_orderstatus", "F")))
      .planInputPartitions().length
    require(planned == fFiles + noStatus && fFiles + noStatus < mf.files.length,
      s"status probe planned $planned, want $fFiles old-spec F files + " +
        s"$noStatus new-spec files of ${mf.files.length}")
    // ...and new-spec files prune on the bucket residue
    val probeKey = s.sql("SELECT o_custkey FROM orders_pe_v " +
      "WHERE o_orderkey % 3 = 1 LIMIT 1").head.getLong(0)
    val b = graft.sources.GraftPartition.bucketOf(probeKey.toString, 8).toString
    val bFiles = mf.files.count { f =>
      val st = mf.stats.getOrElse(f._1, Map.empty)
      st.get("part:bucket(8,o_custkey)").forall(_._1 == b)
    }
    val planned2 = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.EqualTo("o_custkey", probeKey)))
      .planInputPartitions().length
    require(planned2 <= bFiles && bFiles < mf.files.length,
      s"bucket probe planned $planned2, residue-class bound $bFiles " +
        s"of ${mf.files.length}")
    import s.implicits._
    parts.filter(_.getString(0).startsWith("o_orderstatus="))
      .map(r => (r.getString(0), r.getLong(2))).toSeq
      .toDF("partition", "num_rows").orderBy(col("partition"))
  }

  /** A6/A7 judged: PARTITION OVERWRITE — the two INSERT OVERWRITE shapes
    * every lakehouse pipeline leans on at scale. Static (`PARTITION
    * (o_orderstatus = 'F')` — the Delta replaceWhere contract): commit
    * classifies every current file by its recorded tuple (wholly
    * replaced / wholly kept; unclassifiable refuses) and the writer
    * guard refuses rows outside the region, so replacing a partition of
    * a 100 TB table is one atomic manifest swap over exactly that
    * partition's files. Dynamic (partitionOverwriteMode=dynamic):
    * replaces exactly the partitions the incoming tuples name. Both
    * preserve pre-overwrite states as retained history (required
    * in-query via VERSION AS OF). The oracle replays untouched/halved/
    * shifted populations relationally, so a partition leaking through —
    * or the wrong partition replaced — hash-mismatches. */
  def kvPartitionOverwrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_po"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_po")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_po (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_po_v")
    s.sql("INSERT INTO graft.kvq.o_po SELECT o_orderkey, o_orderstatus, " +
      "o_totalprice FROM orders_po_v")
    val total = s.table("graft.kvq.o_po").count()
    // static: replace the F partition with halved prices
    s.sql("INSERT OVERWRITE graft.kvq.o_po PARTITION (o_orderstatus = 'F') " +
      "SELECT o_orderkey, o_totalprice * 0.5 FROM orders_po_v " +
      "WHERE o_orderstatus = 'F'")
    // dynamic: the incoming data names only the O partition
    s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try s.sql("INSERT OVERWRITE graft.kvq.o_po SELECT o_orderkey, " +
      "o_orderstatus, o_totalprice + 1000 FROM orders_po_v " +
      "WHERE o_orderstatus = 'O'")
    finally s.conf.unset("spark.sql.sources.partitionOverwriteMode")
    // both overwrites preserved the pre-overwrite state as history
    require(s.sql("SELECT count(*) FROM graft.kvq.o_po VERSION AS OF 0")
      .head.getLong(0) == total,
      "pre-overwrite state must stay time-travelable")
    s.sql(
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_po GROUP BY o_orderstatus ORDER BY st""".stripMargin)
  }

  /** A2/A7 judged: STORAGE-PARTITIONED JOIN — two kv tables partitioned
    * on the same identity column report KeyGroupedPartitioning (one scan
    * partition per tuple, HasPartitionKey), and under
    * spark.sql.sources.v2.bucketing.enabled Spark joins them with NO
    * exchange on either side — the Iceberg SPJ shape, the single biggest
    * shuffle eliminator for co-partitioned 100-TB fact/dim layouts. The
    * zero-exchange plan is REQUIRED in-query (with broadcast and AQE
    * pinned off during the assertion); the oracle replays the enriching
    * join relationally, so co-location can never trade away a row. */
  def kvSpj(s: SparkSession, d: String): DataFrame = {
    val t1 = s"$scratch/kv_spj_f"
    val t2 = s"$scratch/kv_spj_d"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_spj")
    s.sql("DROP TABLE IF EXISTS graft.kvq.s_spj")
    clearDir(t1); clearDir(t2)
    s.sql("CREATE TABLE graft.kvq.o_spj (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$t1')")
    s.sql("CREATE TABLE graft.kvq.s_spj (o_orderstatus STRING, " +
      "st_cnt BIGINT) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$t2')")
    Tables.orders(s, d).createOrReplaceTempView("orders_spj_v")
    s.sql("INSERT INTO graft.kvq.o_spj SELECT o_orderkey, o_orderstatus, " +
      "o_totalprice FROM orders_spj_v")
    s.sql("INSERT INTO graft.kvq.s_spj SELECT o_orderstatus, " +
      "CAST(count(*) AS BIGINT) FROM orders_spj_v GROUP BY o_orderstatus")
    val prev = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.graft.planning.preserveDataGrouping",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> s.conf.getOption(k))
    Seq("spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.graft.planning.preserveDataGrouping" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
      .foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val plan = s.table("graft.kvq.o_spj")
        .join(s.table("graft.kvq.s_spj"), "o_orderstatus")
        .queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        "co-partitioned join must plan with NO exchange:\n" + plan)
    } finally prev.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    s.sql(
      """SELECT a.o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(a.o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(max(b.st_cnt) AS BIGINT) AS st_cnt,
        |  CAST(sum(CAST(a.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_spj a JOIN graft.kvq.s_spj b
        |  ON a.o_orderstatus = b.o_orderstatus
        |GROUP BY a.o_orderstatus ORDER BY st""".stripMargin)
  }

  /** A2/A7 judged: BUCKET-transform STORAGE-PARTITIONED JOIN — the
    * fact⋈fact shape identity partitioning cannot serve (the join key's
    * cardinality is the table's): both tables PARTITIONED BY
    * (bucket(16, key)), the catalog exposes the routing function
    * (FunctionCatalog + canonical-named bound `bucket`), the scans
    * report KeyGroupedPartitioning over the bucket ordinals, and Spark
    * joins them with NO exchange on either side — at 100 TB the
    * difference between shuffling both fact tables and reading them
    * co-located. The zero-exchange plan is REQUIRED in-query (broadcast
    * and AQE pinned off during the assertion); the oracle replays the
    * join relationally, so co-location can never trade away a row. */
  def kvSpjBucket(s: SparkSession, d: String): DataFrame = {
    val t1 = s"$scratch/kv_spjb_o"
    val t2 = s"$scratch/kv_spjb_l"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_sb")
    s.sql("DROP TABLE IF EXISTS graft.kvq.l_sb")
    clearDir(t1); clearDir(t2)
    s.sql("CREATE TABLE graft.kvq.o_sb (o_orderkey BIGINT, " +
      "o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (bucket(16, o_orderkey)) OPTIONS (path '$t1')")
    s.sql("CREATE TABLE graft.kvq.l_sb (l_orderkey BIGINT, " +
      "l_quantity DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (bucket(16, l_orderkey)) OPTIONS (path '$t2')")
    Tables.orders(s, d).createOrReplaceTempView("orders_sb_v")
    Tables.lineitem(s, d).createOrReplaceTempView("li_sb_v")
    s.sql("INSERT INTO graft.kvq.o_sb SELECT o_orderkey, o_totalprice " +
      "FROM orders_sb_v")
    s.sql("INSERT INTO graft.kvq.l_sb SELECT l_orderkey, l_quantity " +
      "FROM li_sb_v")
    val confs = Seq("spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.graft.planning.preserveDataGrouping",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val prev = confs.map(k => k -> s.conf.getOption(k))
    Seq("true", "true", "-1", "false").zip(confs).foreach {
      case (v, k) => s.conf.set(k, v) }
    try {
      val plan = s.table("graft.kvq.o_sb")
        .join(s.table("graft.kvq.l_sb"),
          col("o_orderkey") === col("l_orderkey"))
        .queryExecution.executedPlan.toString
      require(plan.contains("SortMergeJoin") && !plan.contains("Exchange"),
        "co-bucketed fact join must plan with NO exchange:\n" + plan)
    } finally prev.foreach { case (k, v) =>
      v.fold(s.conf.unset(k))(s.conf.set(k, _)) }
    s.sql(
      """SELECT CAST(o_orderkey % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_sb JOIN graft.kvq.l_sb
        |  ON o_orderkey = l_orderkey
        |GROUP BY CAST(o_orderkey % 7 AS BIGINT) ORDER BY grp""".stripMargin)
  }

  /** A6 judged: PARTITION-ALIGNED METADATA DELETE — `DELETE FROM t WHERE
    * <partition predicate>` on a partitioned kv table drops whole files
    * by their recorded tuples in ONE manifest publish: no row read, no
    * row rewritten (required in-query: the file count shrinks by exactly
    * the matching partition's files and NOTHING is added — a CoW rewrite
    * would write replacements), with the dropped files retained for time
    * travel. A misaligned predicate in the same query routes to the
    * row-level rewrite — correctness never depends on alignment, only
    * cost does. The oracle replays both deletes relationally. */
  def kvPartitionDelete(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_pdel"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_pd")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_pd (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_pd_v")
    s.sql("INSERT INTO graft.kvq.o_pd SELECT o_orderkey, o_orderstatus, " +
      "o_totalprice FROM orders_pd_v")
    val before = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    val pFiles = before.files.count(f => before.stats.getOrElse(f._1,
      Map.empty).get("part:o_orderstatus").exists(_._1 == "P"))
    s.sql("DELETE FROM graft.kvq.o_pd WHERE o_orderstatus = 'P'")
    val after = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(after.files.length == before.files.length - pFiles &&
      after.removed.length == before.removed.length + pFiles,
      s"partition delete must drop exactly the P files and add none " +
        s"(${before.files.length} -> ${after.files.length}, P: $pFiles)")
    // the misaligned arm: a key predicate goes through the CoW rewrite
    s.sql("DELETE FROM graft.kvq.o_pd WHERE o_orderkey % 10 = 3")
    s.sql(
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_pd GROUP BY o_orderstatus ORDER BY st""".stripMargin)
  }

  /** A7-DSv2/A8 judged: kv HISTOGRAM statistics → the CBO. The manifest's
    * per-file sketches already feed ndv/min/max/nulls on every scan;
    * `ANALYZE TABLE … FOR COLUMNS` under
    * spark.sql.statistics.histogram.enabled adds table-level equi-height
    * histograms (sidecar, count-ratio staleness guard), surfaced through
    * DSv2 columnStats().histogram() so JoinEstimation multiplies
    * overlapping HOT bins out instead of assuming uniform — on a skewed
    * key, the difference between broadcasting a "small" join that is
    * actually enormous and planning it honestly. Both plan arms asserted
    * with a threshold derived from the plans' own estimates (the
    * histogram arm must KEEP the shuffle, the ndv-only arm must
    * broadcast); the hot join is only planned — the oracle gates the
    * cold-key join the analyst actually runs. */
  def kvCboHistogram(s: SparkSession, d: String): DataFrame = {
    val tmpA = s"$scratch/kv_cboh_a"
    s.sql("DROP TABLE IF EXISTS graft.kvq.cboh_a")
    clearDir(tmpA)
    s.sql("CREATE TABLE graft.kvq.cboh_a (ka BIGINT, ida BIGINT) " +
      s"USING graft_kv OPTIONS (path '$tmpA')")
    Tables.lineitem(s, d).createOrReplaceTempView("li_cboh_v")
    // the skew: 3/4 of the keys pile onto key 1. ONE table self-joined
    // (r18 floor-weight cut): the estimator contrast — per-bin hot-key
    // multiplication vs the uniform ndv formula — is identical for a
    // self-join, at half the ANALYZE cost and none of the second table's
    // build; the l_linenumber = 1 slice keeps one row per order (the
    // mechanism is skew SHAPE, not volume)
    s.sql("INSERT INTO graft.kvq.cboh_a SELECT CASE WHEN l_orderkey % 4 " +
      "<> 0 THEN CAST(1 AS BIGINT) ELSE l_orderkey END, " +
      "l_orderkey * 10 + CAST(l_linenumber AS BIGINT) FROM li_cboh_v " +
      "WHERE l_linenumber = 1")
    def ab(): DataFrame = s.table("graft.kvq.cboh_a").alias("l")
      .join(s.table("graft.kvq.cboh_a").alias("r"),
        col("l.ka") === col("r.ka"))
      .select(col("l.ka").as("ka"), col("l.ida").as("ida"),
        col("r.ida").as("idb"))
    val prevCbo = s.conf.getOption("spark.sql.cbo.enabled")
    val prevThr = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevHist = s.conf.getOption("spark.sql.statistics.histogram.enabled")
    val prevBins = s.conf.getOption("spark.sql.statistics.histogram.numBins")
    def restore(k: String, v: Option[String]): Unit =
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    val out = java.nio.file.Files.createTempDirectory("graft_kvcboh_out")
      .resolve("out").toString
    try {
      s.conf.set("spark.sql.cbo.enabled", "true")
      // arm 1: manifest ndv/min/max only — the uniform formula undercounts
      s.conf.set("spark.sql.statistics.histogram.enabled", "false")
      s.sql("ANALYZE TABLE graft.kvq.cboh_a COMPUTE STATISTICS FOR COLUMNS")
      val estNdv = ab().queryExecution.optimizedPlan.stats.sizeInBytes
      // arm 2: histograms — the hot bins multiply out per bin
      s.conf.set("spark.sql.statistics.histogram.enabled", "true")
      s.conf.set("spark.sql.statistics.histogram.numBins", "16")
      s.sql("ANALYZE TABLE graft.kvq.cboh_a COMPUTE STATISTICS FOR COLUMNS")
      val estHist = ab().queryExecution.optimizedPlan.stats.sizeInBytes
      require(estHist > 4 * estNdv,
        s"histograms did not surface the skew: ndv-est $estNdv vs " +
          s"hist-est $estHist")
      // threshold between the two estimates, derived from the plans
      // themselves so the contrast holds at every scale factor
      val thr = (estNdv + estHist) / 2
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      def q(): DataFrame = {
        val x = ab().alias("x")
        val y = ab().alias("y")
        x.join(y, col("x.ida") === col("y.ida"))
      }
      // assert on the OUTER ida-keyed join's own node line (the inner
      // ka=ka joins can be sort-merge in both arms regardless) — the
      // join-node line carries its keys, so "ida" pins the right one
      def idaJoin(plan: String, node: String): Boolean =
        plan.linesIterator.exists(l => l.contains(node) && l.contains("ida"))
      val planHist = q().queryExecution.executedPlan.toString
      require(idaJoin(planHist, "SortMergeJoin") &&
        !idaJoin(planHist, "BroadcastHashJoin"),
        s"hist-informed estimate ($estHist, thr $thr) must keep the " +
          "shuffle on the ida join:\n" + planHist)
      // drop the histograms: the same query now broadcasts the join
      s.conf.set("spark.sql.statistics.histogram.enabled", "false")
      s.sql("ANALYZE TABLE graft.kvq.cboh_a COMPUTE STATISTICS FOR COLUMNS")
      val planNdv = q().queryExecution.executedPlan.toString
      require(idaJoin(planNdv, "BroadcastHashJoin"),
        s"ndv-only estimate ($estNdv, thr $thr) must broadcast the ida " +
          "join:\n" + planNdv)
      // the oracle-gated result: the COLD-key join (the hot join above
      // is asserted at the plan level only — that is the point of skew)
      ab()
        .where(col("ka") =!= 1L)
        .groupBy((col("ka") % 5L).as("grp"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("ida")).cast("long").as("sa"),
          sum(col("idb")).cast("long").as("sb"))
        .orderBy(col("grp"))
        .write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      restore("spark.sql.cbo.enabled", prevCbo)
      restore("spark.sql.autoBroadcastJoinThreshold", prevThr)
      restore("spark.sql.statistics.histogram.enabled", prevHist)
      restore("spark.sql.statistics.histogram.numBins", prevBins)
    }
    s.read.parquet(out)
  }

  /** A12 judged: OPTIMIZE … WHERE — partition-scoped compaction, the
    * everyday maintenance command on a time-partitioned 100 TB table:
    * fold ONLY the named partitions' small files (here: the cold days
    * before a horizon, three append slices each), leaving the hot days'
    * layout untouched — data moved scales with the named partitions, not
    * the table. Required in-query: every pre-horizon day folds to ONE
    * file, every post-horizon day keeps its three, and the scoped fold
    * advances the retention fence only to the merged files' own max
    * epoch. The unfiltered per-day aggregate hash-gates bit-identical
    * reads across the fold. */
  def kvOptimizeWhere(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_optw"
    s.sql("DROP TABLE IF EXISTS graft.kvq.ev_ow")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.ev_ow (event_id BIGINT, " +
      "ts TIMESTAMP_NTZ, value DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (days(ts)) OPTIONS (path '$tmp', epochs 'true')")
    Tables.events(s, d).createOrReplaceTempView("events_ow_v")
    // three append slices: every day lands three small files — the
    // streaming-ingest layout OPTIMIZE exists to repair
    (0 until 3).foreach { i =>
      s.sql("INSERT INTO graft.kvq.ev_ow SELECT event_id, ts, value " +
        s"FROM events_ow_v WHERE event_id % 3 = $i")
    }
    def dayCounts(): Map[Long, Int] = {
      val m = graft.sources.GraftKvSink.readManifest(
        graft.sources.GraftKvSink.manifestPath(tmp))
      m.files.groupBy(f => m.stats(f._1)("part:days(ts)")._1.toLong)
        .map { case (k, v) => k -> v.size }
    }
    require(dayCounts().values.forall(_ == 3), "3 slices per day expected")
    // fold the cold days (before Jan 11 = epoch day 19733) only
    s.sql("OPTIMIZE graft.kvq.ev_ow " +
      "WHERE ts < TIMESTAMP_NTZ'2024-01-11 00:00:00'")
    val after = dayCounts()
    require(after.forall { case (day, n) =>
      if (day < 19733L) n == 1 else n == 3 },
      s"scoped fold must merge exactly the cold days: $after")
    val m1 = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(m1.compactedUpTo == 2L,
      s"fence must stop at the merged files' max epoch, is ${m1.compactedUpTo}")
    s.sql(
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS day,
        |  count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.ev_ow GROUP BY CAST(ts AS DATE)
        |ORDER BY day""".stripMargin)
  }

  /** A7-DSv2 judged: PARTITION-DISJOINT OPTIMISTIC CONCURRENCY — the
    * conflict matrix resolves at partition/file granularity (the Delta
    * rule): a write planned against snapshot V merges past a concurrent
    * commit whenever the two provably touched DIFFERENT regions (replaced
    * files intact, concurrently-added files contradicted by their
    * partition tuples/stats), and refuses when they overlap (phantoms).
    * At 100 TB this is the difference between "one maintenance job per
    * table" and "one per partition": jobs deleting yesterday and
    * compacting last month never queue behind each other. Deterministic
    * in-query interleaving: a replaceWhere overwrite of the O region is
    * PLANNED (snapshot captured), the F partition is dropped by a
    * concurrent metadata DELETE, then the O overwrite commits — required
    * to MERGE; a second overwrite of P planned before a row lands in P is
    * required to REFUSE. The oracle replays both surviving deletes
    * relationally. */
  def kvDisjointCommit(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_disjoint"
    s.sql("DROP TABLE IF EXISTS graft.kvq.o_dj")
    clearDir(tmp)
    s.sql("CREATE TABLE graft.kvq.o_dj (o_orderkey BIGINT, " +
      "o_orderstatus STRING, o_totalprice DOUBLE) USING graft_kv " +
      s"PARTITIONED BY (o_orderstatus) OPTIONS (path '$tmp', epochs 'true')")
    Tables.orders(s, d).createOrReplaceTempView("orders_dj_v")
    s.sql("INSERT INTO graft.kvq.o_dj SELECT o_orderkey, o_orderstatus, " +
      "o_totalprice FROM orders_dj_v")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_orderstatus",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("o_totalprice",
        org.apache.spark.sql.types.DoubleType)))
    val one = new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    }
    def plannedDrop(status: String): graft.sources.GraftKvBatchWrite = {
      val w = new graft.sources.GraftKvBatchWrite(tmp, schema,
        replace = false, explicitEpoch = None,
        partSpec = Seq("o_orderstatus"),
        overwriteFilters = Some(Seq(
          org.apache.spark.sql.sources.EqualTo("o_orderstatus", status))))
      w.createBatchWriterFactory(one) // captures the optimistic snapshot
      w
    }
    // disjoint: O-region overwrite planned, F dropped concurrently, O
    // commits — MUST merge (both deletes land)
    val wO = plannedDrop("O")
    s.sql("DELETE FROM graft.kvq.o_dj WHERE o_orderstatus = 'F'")
    wO.commit(Array.empty)
    // overlap: P-region overwrite planned, a row lands IN P concurrently
    // — MUST refuse (the planned overwrite never saw that row)
    val wP = plannedDrop("P")
    s.sql("INSERT INTO graft.kvq.o_dj VALUES (CAST(-1 AS BIGINT), 'P', " +
      "CAST(0 AS DOUBLE))")
    val refused =
      try { wP.commit(Array.empty); false }
      catch { case _: IllegalStateException => true }
    require(refused, "overlapping partition overwrite must refuse")
    require(s.table("graft.kvq.o_dj")
      .where("o_orderstatus IN ('F', 'O')").count() == 0L,
      "both disjoint deletes must have landed")
    s.sql(
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM graft.kvq.o_dj WHERE o_orderkey >= 0
        |GROUP BY o_orderstatus ORDER BY st""".stripMargin)
  }

  /** A2/A8 judged: TEMPORAL (hidden) partitioning — `days(ts)` over a kv
    * TIMESTAMP column, the standard 100-TB fact-table layout. Three
    * claims, all required in-query: (1) every file records its UTC day
    * tuple; (2) the day-aligned retention DELETE ("drop everything
    * before Jan 11") is a PURE manifest edit — file count shrinks by
    * exactly the pre-horizon day files, nothing written; (3) a range
    * predicate on the RAW timestamp (no derived column anywhere) plans
    * only the in-range day files — Iceberg-style hidden partitioning,
    * where the query author never knows the table is partitioned. The
    * returned per-day aggregate carries min/max TIMESTAMPs, so the
    * micros-exact time-type round trip is hash-gated against the
    * oracle's replay of the retention predicate. */
  def kvTimePartition(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_time"
    s.sql("DROP TABLE IF EXISTS graft.kvq.ev_time")
    clearDir(tmp)
    // TIMESTAMP_NTZ: the events surface's naive dtype (Tables.events), so
    // the min/max timestamps hash exactly against the DuckDB oracle
    s.sql("CREATE TABLE graft.kvq.ev_time (event_id BIGINT, " +
      "ts TIMESTAMP_NTZ, user_id BIGINT, event_type STRING, value DOUBLE) " +
      "USING graft_kv PARTITIONED BY (days(ts)) " +
      s"OPTIONS (path '$tmp', epochs 'true')")
    Tables.events(s, d).createOrReplaceTempView("events_time_v")
    s.sql("INSERT INTO graft.kvq.ev_time SELECT event_id, ts, user_id, " +
      "event_type, value FROM events_time_v")
    val mf = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(mf.partitionSpec == Seq("days(ts)"), mf.partitionSpec)
    def dayOf(m: graft.sources.GraftKvSink.Manifest, n: String): Long =
      m.stats.getOrElse(n, Map.empty).getOrElse("part:days(ts)",
        throw new IllegalStateException(s"untagged file $n"))._1.toLong
    // day-aligned retention DELETE: epoch day 19733 = 2024-01-11T00:00Z
    val dropped = mf.files.count(f => dayOf(mf, f._1) < 19733L)
    s.sql("DELETE FROM graft.kvq.ev_time " +
      "WHERE ts < TIMESTAMP_NTZ'2024-01-11 00:00:00'")
    val after = graft.sources.GraftKvSink.readManifest(
      graft.sources.GraftKvSink.manifestPath(tmp))
    require(dropped > 0 && after.files.length == mf.files.length - dropped &&
      after.removed.length == mf.removed.length + dropped,
      s"retention DELETE must be metadata-only (${mf.files.length} -> " +
        s"${after.files.length}, expected to drop $dropped)")
    // hidden-partition pruning on the raw timestamp (day 19742 = Jan 20)
    val want = after.files.count(f => dayOf(after, f._1) >= 19742L)
    val planned = new graft.sources.GraftKvScan(tmp, None,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual("ts",
        java.time.LocalDateTime.parse("2024-01-20T00:00:00"))))
      .planInputPartitions().length
    require(planned == want && want < after.files.length,
      s"ts-range probe planned $planned of ${after.files.length} " +
        s"(in-range day files: $want)")
    s.sql(
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP_NTZ) AS day,
        |  count(*) AS cnt, min(ts) AS first_ts, max(ts) AS last_ts,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM graft.kvq.ev_time GROUP BY CAST(ts AS DATE)
        |ORDER BY day""".stripMargin)
  }

  /** A12 judged: COMPACTION round trip — two batch writes (append merging
    * the manifest), then `GraftKvSink.compact` rewrites every epoch-0 file
    * into one behind the atomic manifest swap, and the judged aggregate
    * reads the COMPACTED table. The oracle recomputes the union, so
    * "current reads are bit-identical across compaction" is hash-gated,
    * not just spec-asserted; the function also asserts the file count
    * collapsed so a silently skipped compaction cannot pass. */
  def kvCompact(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_compact"
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderkey") % 2 === 0)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode(SaveMode.Overwrite).save()
    o.filter(col("o_orderkey") % 2 === 1)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode(SaveMode.Append).save()
    graft.sources.GraftKvSink.compact(tmp, 0L)
    val kvFiles = Option(new java.io.File(tmp).list())
      .map(_.count(_.endsWith(".kv"))).getOrElse(0)
    require(kvFiles == 1, s"compaction left $kvFiles data files, expected 1")
    s.read.format("graft.sources.GraftKvSink").option("path", tmp).load()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("min_key"), max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** A5 judged: kv MANIFEST aggregate pushdown — ungrouped COUNT(*) and
    * MIN/MAX answered entirely from the manifest's per-file row counts and
    * stats ranges, zero data files opened (the function asserts the
    * pushed-agg scan is in the plan, so a silent fallback to a full scan
    * cannot pass). The oracle recomputes the same aggregates from the
    * source rows, hash-gating the metadata-only answers against the data. */
  def kvAggPushdown(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_agg"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 5 === 0)
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode(SaveMode.Overwrite).save()
    val res = s.read.format("graft.sources.GraftKvSink").option("path", tmp)
      .load()
      .agg(count(lit(1)).as("cnt"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        min(col("o_orderstatus")).as("min_st"),
        max(col("o_orderstatus")).as("max_st"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
    require(res.queryExecution.executedPlan.toString
        .contains("manifest row counts/stats"),
      "kv aggregate was not answered from the manifest:\n" +
        res.queryExecution.executedPlan.toString)
    res
  }

  /** A8/CBO judged: MANIFEST COLUMN STATS drive a broadcast decision with
    * NO hints. The kv scan surfaces per-column min/max (per-file range
    * fold) and an NDV estimate (union of the per-file HLL sketches) as
    * DSv2 column statistics; with `spark.sql.cbo.enabled` Spark's
    * FilterEstimation shrinks the selective dimension's estimated output
    * below the broadcast threshold and the join plans as BroadcastHashJoin
    * — the decision that matters most at 100 TB, where a size-only
    * estimate (bytes on disk) sees the unfiltered table and shuffles both
    * sides. Both arms are asserted: the stats-less baseline (CBO off,
    * size-only) must NOT broadcast, the column-stats plan MUST. The
    * result materializes under the live confs (the returned frame must
    * not re-plan after they are restored), and the oracle replays the
    * join + filter relationally — a hash match proves the broadcast plan
    * changed nothing but the wall clock. */
  def kvCboBroadcast(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_cbo"
    val out = s"$scratch/kv_cbo_out"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .write.format("graft.sources.GraftKvSink")
      .option("path", tmp).mode(SaveMode.Overwrite).save()
    // scale-relative selectivity: keep custkeys in the bottom 1/12 of the
    // observed range (the oracle replays the same floor(max/12) cutoff)
    val cut = math.floor(Tables.orders(s, d)
      .agg(max(col("o_custkey"))).head.getLong(0) / 12.0).toLong
    val prevCbo = s.conf.getOption("spark.sql.cbo.enabled")
    val prevThr = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    def restore(k: String, v: Option[String]): Unit =
      v.fold(s.conf.unset(k))(s.conf.set(k, _))
    def dimDf(): DataFrame =
      s.read.format("graft.sources.GraftKvSink").option("path", tmp).load()
        .filter(col("o_custkey") <= cut)
    def factDf(): DataFrame =
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
    try {
      // threshold sits BETWEEN the size-only estimates of BOTH join sides
      // and the column-stats estimate of the filtered dimension — derived
      // from the plans' own numbers so the contrast holds at every fixture
      // scale (a fixed threshold breaks across sf)
      s.conf.set("spark.sql.cbo.enabled", "false")
      def sizeOff(df: DataFrame): BigInt =
        df.queryExecution.optimizedPlan.stats.sizeInBytes
      val thr = (sizeOff(dimDf()).min(sizeOff(factDf())) * 4 / 5).max(BigInt(1))
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", thr.toString)
      def q(): DataFrame = factDf()
        .join(dimDf(), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"), sumS(col("l_quantity")).as("qty"))
      val baseline = q().queryExecution.executedPlan.toString
      require(!baseline.contains("BroadcastHashJoin"),
        s"stats-less baseline unexpectedly broadcast (threshold $thr):\n" +
          baseline)
      s.conf.set("spark.sql.cbo.enabled", "true")
      val res = q()
      val withStats = res.queryExecution.executedPlan.toString
      require(withStats.contains("BroadcastHashJoin"),
        "column stats did not flip the join to broadcast:\n" + withStats)
      res.write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      restore("spark.sql.cbo.enabled", prevCbo)
      restore("spark.sql.autoBroadcastJoinThreshold", prevThr)
    }
    s.read.parquet(out)
  }

  /** A10 (transparent half): the SECONDARY-INDEX REWRITE exercised through
    * pure DDL + a PLAIN query — `CREATE INDEX` through the SQL surface,
    * then an ordinary `filter(o_custkey IN …)` over the raw parquet that
    * the optimizer (plans.IndexRewriteRule) redirects to index probe +
    * broadcast key semi-join, with the residual price predicate staying a
    * plain filter. The oracle computes the same predicate full-scan, so a
    * hash match proves the index path reproduced full-scan semantics; the
    * `secondary_index` query beside it is the hand-written plan this rule
    * derives automatically. Same registration hygiene as mv_rewrite:
    * materialize under the live registration, then DROP INDEX. */
  def indexRewrite(s: SparkSession, d: String): DataFrame = {
    val out = s"$scratch/index_rewrite_out"
    if (Ddl.lookup("idxr_t").isDefined) Ddl.execute(s, "DROP TABLE idxr_t")
    if (graft.plans.IndexCatalog.named("idxr_ck").isDefined)
      Ddl.execute(s, "DROP INDEX idxr_ck")
    Ddl.execute(s,
      s"CREATE TABLE idxr_t MAPPED BY '$d/orders.parquet' KEYS (o_orderkey)")
    Ddl.execute(s, "CREATE INDEX idxr_ck ON idxr_t (o_custkey)")
    try indexRewriteFrame(s, d).write.mode(SaveMode.Overwrite).parquet(out)
    finally {
      Ddl.execute(s, "DROP INDEX idxr_ck")
      Ddl.execute(s, "DROP TABLE idxr_t")
    }
    s.read.parquet(out).orderBy(col("o_orderkey"))
  }

  /** A10 × A6 judged: INDEX MAINTENANCE UNDER NON-APPEND DML — CREATE
    * INDEX, then a DELETE (which stales the index and structurally vetoes
    * the rewrite), then REFRESH INDEX. The refresh SQUASHES the table's
    * replay into a materialized snapshot and rebuilds the index from it,
    * so the view becomes a single-parquet read the transparent rewrite
    * fires on again — the function asserts the semi-join is back in the
    * optimized plan of a TABLE read (not a direct base scan). The oracle
    * recomputes the predicate over the post-DELETE state full-scan,
    * hash-gating that squash + rebuilt index reproduce exact semantics. */
  def indexRewriteDml(s: SparkSession, d: String): DataFrame = {
    val out = s"$scratch/index_rewrite_dml_out"
    if (Ddl.lookup("idxd_t").isDefined) Ddl.execute(s, "DROP TABLE idxd_t")
    if (graft.plans.IndexCatalog.named("idxd_ck").isDefined)
      Ddl.execute(s, "DROP INDEX idxd_ck")
    Ddl.execute(s,
      s"CREATE TABLE idxd_t MAPPED BY '$d/orders.parquet' KEYS (o_orderkey)")
    Ddl.execute(s, "CREATE INDEX idxd_ck ON idxd_t (o_custkey)")
    try {
      Ddl.execute(s, "DELETE FROM idxd_t WHERE o_orderstatus = 'F'")
      Ddl.execute(s, "REFRESH INDEX idxd_ck")
      val q = s.table("idxd_t")
        .filter(col("o_custkey").isin(11L, 57L, 123L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      require(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "index rewrite did not fire on the squashed table read:\n" +
          q.queryExecution.optimizedPlan.toString.take(2000))
      q.write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      Ddl.execute(s, "DROP INDEX idxd_ck")
      Ddl.execute(s, "DROP TABLE idxd_t")
    }
    s.read.parquet(out).orderBy(col("o_orderkey"))
  }

  /** A10 × A7-DSv2 judged: CREATE INDEX on a KV CATALOG table — the
    * secondary-index machinery serving the connector world (previously
    * keyed MAPPED-BY tables only). `CREATE INDEX … KEY (o_orderkey)`
    * names the unique join key (kv tables declare none), the index
    * parquet is built value-sorted from the table's current state, and
    * the IndexDef records the manifest version it was built at. The
    * judged flow exercises the full lifecycle: build → a row-level DML
    * bumps the manifest version, so the rewrite STANDS DOWN (asserted: a
    * stale index must never serve a read — its keys include deleted
    * rows) → REFRESH INDEX rebuilds at the live version → the rewrite
    * fires again on a plain catalog-table read (asserted: LeftSemi in
    * the optimized plan). The oracle recomputes the predicate over the
    * post-DML state full-scan, hash-gating that the index path
    * reproduces exact semantics. At 100 TB: the probe reads O(matches)
    * index rows (value-sorted parquet min/max prunes), the matched keys
    * broadcast, and the kv scan's runtime V2 filtering does the point
    * gets — no full scan on an unsorted column. */
  def kvIndexRewrite(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/kv_ixr"
    val out = s"$scratch/kv_ixr_out"
    if (graft.plans.IndexCatalog.named("kvixr_ck").isDefined)
      Ddl.execute(s, "DROP INDEX kvixr_ck")
    s.sql("DROP TABLE IF EXISTS graft.kvq.orders_ixr")
    s.sql("CREATE TABLE graft.kvq.orders_ixr (o_orderkey BIGINT, " +
      "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
      s"USING graft_kv OPTIONS (path '$tmp')")
    Tables.orders(s, d).createOrReplaceTempView("orders_ixr_v")
    s.sql("INSERT OVERWRITE graft.kvq.orders_ixr " +
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice " +
      "FROM orders_ixr_v WHERE o_orderkey % 4 = 3")
    Ddl.execute(s,
      "CREATE INDEX kvixr_ck ON graft.kvq.orders_ixr (o_custkey) " +
        "KEY (o_orderkey)")
    try {
      def probe() = s.table("graft.kvq.orders_ixr")
        .filter(col("o_custkey").isin(11L, 57L, 123L))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      // DML bumps the manifest version: the index is stale and the
      // rewrite must stand down (serving it would drop nothing — worse,
      // it would also ADMIT deleted rows' keys; never trust a stale index)
      s.sql("DELETE FROM graft.kvq.orders_ixr WHERE o_orderkey % 20 = 3")
      require(!probe().queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "stale kv index must not rewrite reads after DML")
      Ddl.execute(s, "REFRESH INDEX kvixr_ck")
      val q = probe()
      require(q.queryExecution.optimizedPlan.toString.contains("LeftSemi"),
        "kv index rewrite did not fire on the refreshed catalog read:\n" +
          q.queryExecution.optimizedPlan.toString.take(2000))
      q.write.mode(SaveMode.Overwrite).parquet(out)
    } finally {
      Ddl.execute(s, "DROP INDEX kvixr_ck")
      s.sql("DROP TABLE graft.kvq.orders_ixr")
    }
    s.read.parquet(out).orderBy(col("o_orderkey"))
  }

  /** The lazy rewritten frame with its index registration LIVE — split out
    * so PlanSpec can assert the semi-join + index scan in the optimized
    * plan. Callers must drop the index afterwards (indexRewrite does). */
  def indexRewriteFrame(s: SparkSession, d: String): DataFrame =
    s.read.parquet(s"$d/orders.parquet")
      .filter(col("o_custkey").isin(11L, 57L, 123L) &&
        col("o_totalprice") > 1000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** A2/A3 (runtime half #2): runtime BLOOM-FILTER join pruning — the
    * row-level sibling of dynamic partition pruning, and the second modern
    * analogue of Astro's server-side predicate pushdown: Catalyst's
    * InjectRuntimeFilter builds a bloom filter from the dim side's
    * selectively-filtered join keys and plants a `might_contain` probe on
    * the fact scan, discarding non-joining fact rows BEFORE the shuffle. At
    * 100 TB (where the fact scan clears the 10 GB application-side default
    * threshold) this fires out of the box; at test scale the thresholds are
    * deliberately untouched for the judged run — identical results either
    * way — and PlanSpec re-plans this exact query with the thresholds
    * scaled to fixture size to assert the bloom probe appears and the
    * filtered plan stays hash-identical. */
  def bloomPrune(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#13" && col("p_size") <= 25),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_size"))
      .agg(count(lit(1)).as("cnt"), sumS(col("l_extendedprice")).as("revenue"))
      .orderBy(col("p_size"))

  /** A2 (runtime half): DYNAMIC partition pruning — the Spark analogue of
    * Astro's runtime critical-point region pruning. The fact side is the
    * year-partitioned orders export; the dim side's filter (label='target')
    * is NOT on the join key, so no static pruning is possible — Catalyst
    * plants a DynamicPruningSubquery on the fact scan (PlanSpec asserts
    * `dynamicpruning` in PartitionFilters) that evaluates the broadcast dim
    * at runtime and skips 5 of the 7 year directories before any fact I/O.
    * At 100 TB this is the difference between scanning the whole fact table
    * and scanning only the dim-selected partitions. The dim is written to
    * parquet (not a local relation) so its filter survives as a real scan
    * predicate for the DPP planner to see. */
  def dppPrune(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fact = s"$scratch/dpp_fact"
    val dimP = s"$scratch/dpp_dim"
    Tables.orders(s, d)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode(SaveMode.Overwrite).partitionBy("o_year").parquet(fact)
    (1992 to 1998).map(y => (y, if (y == 1995 || y == 1996) "target" else "other"))
      .toDF("dim_year", "label")
      .write.mode(SaveMode.Overwrite).parquet(dimP)
    s.read.parquet(fact)
      .join(s.read.parquet(dimP).filter(col("label") === "target"),
        col("o_year") === col("dim_year"))
      .groupBy(col("o_year").cast("int").as("o_year"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("o_year"))
  }

  /** A7/B8: bucketed co-located join — both sides written bucketed on the
    * join key (8 buckets, sorted within), so the join needs NO exchange on
    * either side (PlanSpec asserts it): the pre-shuffle is paid once at write
    * time and amortized over every subsequent join, the pattern that turns a
    * repeated 100 TB fact-fact join from a per-query shuffle into a scan.
    * Spark-native analogue of the reference's region-aligned storage. */
  def bucketedJoin(s: SparkSession, d: String): DataFrame = {
    val (ot, ct) = writeBucketed(s, d)
    s.table(ot)
      .join(s.table(ct), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  /** Registers the two bucketed tables for dataset `d` and returns their
    * names. Table names and paths are dataset-suffixed, and idempotence is
    * decided by the SESSION catalog (tableExists), not a JVM-global memo —
    * a memo would skip needed writes after a session change and could serve
    * one dataset's tables for another. */
  private[graft] def writeBucketed(s: SparkSession, d: String): (String, String) = {
    val sfx = java.lang.Integer.toHexString(d.hashCode)
    val (ot, ct) = (s"bkt_orders_$sfx", s"bkt_customer_$sfx")
    if (!s.catalog.tableExists(ot) || !s.catalog.tableExists(ct)) {
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$scratch/$ot").saveAsTable(ot)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
        .write.mode(SaveMode.Overwrite)
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$scratch/$ct").saveAsTable(ct)
    }
    (ot, ct)
  }

  /** B2: CSV ingest round-trip (Astro's bulk-load input format). Doubles
    * round-trip exactly through Java's shortest-decimal toString/parse; the
    * aggregate then hash-matches the parquet-sourced oracle. */
  def csvIngest(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/csv_ingest"
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(tmp)
    s.read.option("header", "true")
      .schema("o_orderkey LONG, o_orderstatus STRING, o_totalprice DOUBLE")
      .csv(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"),
        min(col("o_totalprice")).as("min_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** B1/B3 (columnar sink #2): ORC round trip — the second columnar format a
    * warehouse migration meets (Spark ships the ORC reader/writer natively,
    * same DSv2 scan machinery as parquet: column pruning, predicate pushdown
    * to ORC stripe stats, vectorized read). Write a pruned projection as
    * ORC, read it back with a stripe-prunable filter, aggregate; the oracle
    * aggregates the parquet source under the same filter, so the round trip
    * is lossless-gated exactly like the CSV/JSONL sinks. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/orc_roundtrip"
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"))
      .write.mode(SaveMode.Overwrite).orc(tmp)
    s.read.orc(tmp)
      .filter(col("l_quantity") >= 10)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sumS(col("l_quantity")).as("sum_qty"),
        sumS(col("l_extendedprice")).as("sum_price"),
        min(col("l_orderkey")).as("min_key"), max(col("l_orderkey")).as("max_key"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** A6 (upsert half): MERGE INTO semantics — the Spark-native analogue of
    * the reference's HBase Put, where writing a row with an existing rowkey
    * REPLACES it and a new rowkey inserts. Expressed as base FULL OUTER JOIN
    * updates on the key with update-wins coalesce: matched keys take the new
    * row, unmatched updates insert. One shuffle by key (or zero with
    * bucketed/co-partitioned storage, see bucketedJoin); the update batch is
    * derived deterministically from the base so the oracle replays it. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("price"))
    // insert keys are NEGATED base keys: guaranteed outside the (positive)
    // o_orderkey domain at EVERY scale factor — the old k+10000000 offset
    // collided with real orderkeys once TPC-H keygen passed 10M (SF >= 2),
    // silently turning modeled inserts into fan-out updates
    val updates = base.filter(col("k") % 7 === 0)
        .select(col("k"), lit("X").as("st"), (col("price") * 1.1).as("price"))
      .union(base.filter(col("k") % 13 === 0)
        .select((-col("k")).as("k"), lit("N").as("st"), col("price")))
    base.as("b").join(updates.as("u"), Seq("k"), "full")
      .select(coalesce(col("u.st"), col("b.st")).as("st"),
        coalesce(col("u.price"), col("b.price")).as("price"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("cnt"), sumS(col("price")).as("price_sum"))
      .orderBy(col("st"))
  }

  /** A6 (version compaction): HBase-style latest-cell-wins read — for each
    * (user_id, event_type) "rowkey × column" pair keep only the newest event
    * (max ts, ties broken by max event_id; event ids are unique so the
    * result is deterministic). ONE partial-aggregatable max over a
    * lexicographically ordered struct: map-side combine shrinks every
    * partition to its per-key frontier before the single shuffle — the shape
    * that compacts a 100-TB change log. A window row_number()=1 would sort
    * whole partitions for the same answer. */
  def versionCompact(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.event_id").as("event_id"), col("m.ts").as("ts"),
        col("m.value").as("value"))
      .orderBy(col("user_id"), col("event_type"))

  /** B3 (JSONL sink): newline-delimited-JSON export round trip — the
    * interchange format training-data pipelines actually ship (one JSON doc
    * per line, splittable, appendable). Write with the built-in json sink,
    * re-read with an explicit schema (schema inference would re-scan), then
    * aggregate; the oracle aggregates the source table directly, so the
    * round trip is correctness-gated like the parquet/CSV sinks. */
  def exportJsonl(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/export_jsonl"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode(SaveMode.Overwrite).json(tmp)
    s.read.schema("doc_id LONG, lang STRING, n_chars LONG").json(tmp)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("lang"))
  }

  /** B3-sharded: deterministic hash-sharded JSONL export + manifest — the
    * data-loader handoff a training pipeline actually ships: N shards keyed
    * by a content-independent md5 of the stable doc id (reshuffle-proof,
    * replayable in both engines), one directory per shard via partitionBy,
    * and a per-shard manifest (doc count, char sum, id range) the loader
    * validates against before training. Scale shape: the shard column is
    * the repartition key, so the write distributes by shard with no global
    * sort and each task writes exactly one shard's file; the manifest is a
    * map-side-combined aggregate over the RE-READ export (round-trip
    * correctness-gated like the other sinks). Shard count is 8 here; at
    * 100 TB it grows with loader parallelism — the plan is unchanged. */
  def exportSharded(s: SparkSession, d: String): DataFrame = {
    val tmp = s"$scratch/export_sharded"
    val shard = expr(
      "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 8")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"), shard.as("shard"))
      .repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard").json(tmp)
    s.read.schema("doc_id LONG, lang STRING, n_chars LONG, shard LONG").json(tmp)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("shard"))
  }

  /** A2 (runtime half #3): DSv2 RUNTIME FILTERING — the connector-level
    * sibling of dpp_prune/bloom_prune, and the third modern analogue of
    * Astro's runtime region pruning: after the dim side of a broadcast
    * join materializes, Spark hands the join keys to the scan
    * (SupportsRuntimeFiltering.filter), which narrows its key bounds to
    * the keys' envelope BEFORE planInputPartitions — so a 3-key join
    * against a petabyte key space scans the slices containing those keys,
    * not the table. DsV2Spec asserts `runtimeFilters: [...]` lands in the
    * executed plan and the unit-level bounds narrowing; this judged twin
    * hash-gates the results against the generator formula. */
  def dsv2RuntimePrune(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dimPath = s"$scratch/rtf_dim"
    Seq(100L, 2000L, 55555L, 60001L, 60002L).toDF("dk")
      .write.mode(SaveMode.Overwrite).parquet(dimPath)
    s.read.format("graft.sources.GraftRangeSource")
      .option("rows", "100000").option("slices", "16").load()
      .join(s.read.parquet(dimPath).filter(col("dk") >= 0), col("k") === col("dk"))
      .select(col("k"), col("v"), col("tag"))
      .orderBy(col("k"))
  }

  /** A8 deployment shape: the DSv2 TableCatalog plugin
    * (sources.GraftCatalog, spark.sql.catalog.graft) — a connector table
    * registered via CREATE TABLE ... USING graft_range and then read
    * through PURE multipart SQL, no format strings anywhere: the
    * analyzer-level catalog integration that was the reference's entry
    * point [ref*: …/hbase/HBaseCatalog.scala — mount empty, per SURVEY.md
    * §0]. Pushdown composes through the catalog route (CatalogSpec pins
    * keyBounds in the plan); this judged twin hash-gates the results. */
  def catalogTable(s: SparkSession, d: String): DataFrame = {
    if (graft.ops.Ddl.dsv2Get("cat.rng").isDefined)
      s.sql("DROP TABLE graft.cat.rng")
    s.sql("CREATE TABLE graft.cat.rng (k BIGINT, v BIGINT, tag STRING) " +
      "USING graft_range OPTIONS (rows '100000', slices '16')")
    s.sql("""SELECT tag, count(*) AS cnt, min(v) AS min_v, max(v) AS max_v,
            |       sum(v) AS sum_v
            |FROM graft.cat.rng
            |WHERE k BETWEEN 5000 AND 64999
            |GROUP BY tag ORDER BY tag""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsv2_runtime_prune" -> (dsv2RuntimePrune _),
    "catalog_table" -> (catalogTable _),
    "merge_upsert" -> (mergeUpsert _),
    "version_compact" -> (versionCompact _),
    "export_jsonl" -> (exportJsonl _),
    "export_sharded" -> (exportSharded _),
    "keyrange_scan" -> (keyrangeScan _),
    "secondary_index" -> (secondaryIndex _),
    "index_rewrite" -> (indexRewrite _),
    "kv_index_rewrite" -> (kvIndexRewrite _),
    "index_rewrite_dml" -> (indexRewriteDml _),
    "catalog_kv_dml" -> (catalogKvDml _),
    "schema_evolution" -> (schemaEvolution _),
    "kv_compact" -> (kvCompact _),
    "insert_select" -> (insertSelect _),
    "insert_values" -> (insertValues _),
    "bulkload_sorted_write" -> (bulkloadSortedWrite _),
    "csv_ingest" -> (csvIngest _),
    "bucketed_join" -> (bucketedJoin _),
    "partitioned_write" -> (partitionedWrite _),
    "dsv2_keyrange" -> (dsv2Keyrange _),
    "dsv2_agg_pushdown" -> (dsv2AggPushdown _),
    "dsv2_limit_pushdown" -> (dsv2LimitPushdown _),
    "dpp_prune" -> (dppPrune _),
    "orc_roundtrip" -> (orcRoundtrip _),
    "bloom_prune" -> (bloomPrune _),
    "zorder_layout" -> (zorderLayout _),
    "mv_incremental" -> (mvIncremental _),
    "mv_rewrite" -> (mvRewrite _),
    "kv_mv_rewrite" -> (kvMvRewrite _),
    "kv_agg_pushdown" -> (kvAggPushdown _),
    "kv_cbo_broadcast" -> (kvCboBroadcast _),
    "kv_defaults" -> (kvDefaults _),
    "kv_tag_travel" -> (kvTagTravel _),
    "kv_clone_cdc" -> (kvCloneCdc _),
    "kv_rowlevel_dml" -> (kvRowlevelDml _),
    "kv_concurrent_append" -> (kvConcurrentAppend _),
    "kv_mor_dml" -> (kvMorDml _),
    "kv_changefeed" -> (kvChangefeed _),
    "kv_cdc_stream" -> (kvCdcStream _),
    "kv_cdc_cow" -> (kvCdcCow _),
    "kv_cdc_restart" -> (kvCdcRestart _),
    "kv_history" -> (kvHistory _),
    "catalog_ctas" -> (catalogCtas _),
    "kv_schema_evolution" -> (kvSchemaEvolution _),
    "mv_cdc_maintain" -> (mvCdcMaintain _),
    "kv_replicate" -> (kvReplicate _),
    "kv_version_asof" -> (kvVersionAsof _),
    "kv_timestamp_asof" -> (kvTimestampAsof _),
    "kv_incremental_batch" -> (kvIncrementalBatch _),
    "kv_restore" -> (kvRestore _),
    "kv_constraint" -> (kvConstraint _),
    "kv_clustered_write" -> (kvClusteredWrite _),
    "kv_partitioned" -> (kvPartitioned _),
    "kv_branch" -> (kvBranch _),
    "kv_merge_evolve" -> (kvMergeEvolve _),
    "kv_partition_evolve" -> (kvPartitionEvolve _),
    "kv_column_mapping" -> (kvColumnMapping _),
    "kv_meta_tables" -> (kvMetaTables _),
    "kv_wap" -> (kvWap _),
    "kv_partition_overwrite" -> (kvPartitionOverwrite _),
    "kv_spj" -> (kvSpj _),
    "kv_spj_bucket" -> (kvSpjBucket _),
    "kv_partition_delete" -> (kvPartitionDelete _),
    "kv_time_partition" -> (kvTimePartition _),
    "kv_disjoint_commit" -> (kvDisjointCommit _),
    "kv_optimize_where" -> (kvOptimizeWhere _),
    "kv_cbo_histogram" -> (kvCboHistogram _),
    "kv_type_widen" -> (kvTypeWiden _),
    "kv_decimal_types" -> (kvDecimalTypes _),
    "kv_cherrypick" -> (kvCherrypick _),
    "kv_manifest_shard" -> (kvManifestShard _),
    "kv_array_types" -> (kvArrayTypes _),
    "kv_typed_agg" -> (kvTypedAgg _),
    "kv_zorder" -> (kvZorder _),
    "kv_clone" -> (kvClone _),
    "kv_detail" -> (kvDetail _),
    "kv_mv_ivm" -> (kvMvIvm _),
    "dsv2_sink" -> (dsv2Sink _))

  val oracles: Map[String, String] = Map(
    // two racing appends + the seed = the whole table, whatever the
    // commit order: the optimistic merge must lose nothing
    "kv_concurrent_append" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // batch-incremental consumer positions: fromEpoch=2 (keys %4 in 1,2),
    // the (2,2] window (%4 = 1), and fromEpoch=3 (%4 = 2) — each arm is
    // the relational replay of exactly that append window
    "kv_incremental_batch" ->
      """WITH w12 AS (SELECT o_orderkey, o_totalprice FROM orders
        |             WHERE o_orderkey % 4 IN (1, 2)),
        |w1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |       WHERE o_orderkey % 4 = 1),
        |w2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |       WHERE o_orderkey % 4 = 2)
        |SELECT CAST(1 AS INTEGER) AS arm, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM w12
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM w1
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM w2
        |ORDER BY arm""".stripMargin,
    // restore arms: the restore commit (epoch 4) = epochs 1-2 (%5 in 0,1),
    // the retained pre-restore state at epoch 3 (%5 in 0,1,2), and the
    // current state = restored boundary + the corrected load (%5 in 0,1,3)
    "kv_restore" ->
      """WITH v12 AS (SELECT o_orderkey, o_totalprice FROM orders
        |             WHERE o_orderkey % 5 IN (0, 1)),
        |v123 AS (SELECT o_orderkey, o_totalprice FROM orders
        |         WHERE o_orderkey % 5 IN (0, 1, 2)),
        |cur AS (SELECT o_orderkey, o_totalprice FROM orders
        |        WHERE o_orderkey % 5 IN (0, 1, 3))
        |SELECT CAST(1 AS INTEGER) AS arm, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM v12
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM v123
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM cur
        |ORDER BY arm""".stripMargin,
    // IVM: the rewritten-to-snapshot fold must equal the relational
    // replay of the UPDATE over the fact rows
    "kv_mv_ivm" ->
      """SELECT o_orderstatus,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(CASE WHEN o_orderkey % 8 = 1
        |   THEN o_totalprice + 100.0 ELSE o_totalprice END
        |   AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 4 = 1
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the detail row's deterministic fields: the visible row count nets
    // the MOR delete relationally; constraints and clustering are fixed
    "kv_detail" ->
      """SELECT 'graft_kv' AS format,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_orderkey % 2 = 0 AND l_orderkey % 10 <> 4) AS num_rows,
        |  '' AS clustering_columns, 'qty_pos' AS constraints""".stripMargin,
    // clone arms: the diverged clone (boundary epochs 1-2 = %6 in 0,1,
    // plus its own corrected load %6=3), the untouched source (%6 0,1,2),
    // and the clone's boundary state (%6 0,1)
    "kv_clone" ->
      """WITH cln AS (SELECT o_orderkey, o_totalprice FROM orders
        |             WHERE o_orderkey % 6 IN (0, 1, 3)),
        |src AS (SELECT o_orderkey, o_totalprice FROM orders
        |        WHERE o_orderkey % 6 IN (0, 1, 2)),
        |bnd AS (SELECT o_orderkey, o_totalprice FROM orders
        |        WHERE o_orderkey % 6 IN (0, 1))
        |SELECT CAST(1 AS INTEGER) AS arm, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM cln
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM src
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM bnd
        |ORDER BY arm""".stripMargin,
    // layout-independent: the z-ordered table holds exactly the inserted
    // rows, so the box-filter aggregate equals the relational replay
    "kv_zorder" ->
      """SELECT l_suppkey, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey % 2 = 0
        |  AND l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 1 AND 6
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    // both delete arms replayed relationally (P partition dropped whole,
    // then the key-suffix rows removed row-level)
    "kv_partition_delete" ->
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders WHERE o_orderstatus <> 'P' AND o_orderkey % 10 <> 3
        |GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    // the typed Aggregator fold replayed relationally (exact-decimal sum)
    "kv_typed_agg" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_totalprice > 50000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // fork slice + the parent's own commit + exactly the PICKED staged
    // batch (slice 1); the unaudited slice 2 must be absent
    "kv_cherrypick" ->
      """SELECT CAST(o_orderkey % 5 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey % 4 IN (0, 1, 3)
        |GROUP BY CAST(o_orderkey % 5 AS BIGINT) ORDER BY grp""".stripMargin,
    // both manifest layouts' committed rows replayed relationally: the
    // base load plus the post-split single-partition commit — the shard
    // mechanics (one-shard commits, shard-pruned parse) are required
    // in-query, the oracle hash-gates that no row moved or vanished
    "kv_manifest_shard" ->
      """WITH t AS (SELECT o_orderkey,
        |    concat('r', CAST(o_orderkey % 5 AS INT)) AS region,
        |    o_totalprice FROM orders
        |  UNION ALL SELECT o_orderkey + 100000000, 'r2', o_totalprice
        |  FROM orders WHERE o_orderkey % 5 = 2)
        |SELECT region, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM t WHERE region IN ('r1', 'r2')
        |GROUP BY region ORDER BY region""".stripMargin,
    // the array pipeline replayed relationally: base embeddings with the
    // sliced-cell DML mirrored (floor-integerized first elements make
    // the float sum order-independent and engine-exact)
    "kv_array_types" ->
      """WITH t AS (SELECT vec_id, label,
        |    CASE WHEN vec_id % 50 = 0 THEN embedding[1:32]
        |         ELSE embedding END AS emb
        |  FROM embeddings)
        |SELECT CAST(label % 4 AS INT) AS grp, count(*) AS cnt,
        |  CAST(sum(len(emb)) AS BIGINT) AS total_len,
        |  CAST(sum(CAST(floor(CAST(emb[1] AS DOUBLE) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS e1_sum
        |FROM t GROUP BY CAST(label % 4 AS INT)
        |ORDER BY grp""".stripMargin,
    // the per-flag aggregate replayed relationally: sum as DOUBLE,
    // min/max as exact decimal STRING images (dtype-stable both engines)
    "kv_decimal_types" ->
      """SELECT o_orderkey % 3 = 0 AS flag, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS price_sum,
        |  CAST(min(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
        |    AS price_min,
        |  CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
        |    AS price_max
        |FROM orders GROUP BY o_orderkey % 3 = 0 ORDER BY flag""".stripMargin,
    // both layout epochs replayed relationally: pre-widen ints union
    // post-widen longs, aggregated under the wide type
    "kv_type_widen" ->
      """WITH u AS (SELECT CAST(l_orderkey AS BIGINT) AS k,
        |    l_quantity AS v FROM lineitem
        |  UNION ALL SELECT l_orderkey + 3000000000, l_quantity
        |  FROM lineitem)
        |SELECT CAST(k % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(k) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM u GROUP BY CAST(k % 7 AS BIGINT) ORDER BY grp""".stripMargin,
    // the cold-key join replayed relationally (the hot arm is asserted
    // at the plan level inside the query — that is the point of skew)
    "kv_cbo_histogram" ->
      """WITH a AS (SELECT CASE WHEN l_orderkey % 4 <> 0 THEN 1
        |    ELSE l_orderkey END AS ka,
        |    l_orderkey * 10 + l_linenumber AS ida FROM lineitem
        |    WHERE l_linenumber = 1)
        |SELECT CAST(l.ka % 5 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(l.ida) AS BIGINT) AS sa, CAST(sum(r.ida) AS BIGINT) AS sb
        |FROM a l JOIN a r ON l.ka = r.ka WHERE l.ka <> 1
        |GROUP BY CAST(l.ka % 5 AS BIGINT) ORDER BY grp""".stripMargin,
    // the unfiltered per-day aggregate replays relationally, hash-gating
    // bit-identical reads across the scoped fold
    "kv_optimize_where" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
        |  count(*) AS cnt, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin,
    // both disjoint region-deletes replayed relationally (the overlap
    // arm's refused overwrite and fenced -1 row excluded by key > 0)
    "kv_disjoint_commit" ->
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders WHERE o_orderstatus NOT IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    // the retention horizon replayed relationally; min/max TIMESTAMP
    // columns hash-gate the micros-exact time round trip
    "kv_time_partition" ->
      """SELECT CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
        |  count(*) AS cnt, min(ts) AS first_ts, max(ts) AS last_ts,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM events WHERE ts >= TIMESTAMP '2024-01-11 00:00:00'
        |GROUP BY CAST(ts AS DATE) ORDER BY day""".stripMargin,
    // the co-bucketed fact join replayed relationally
    "kv_spj_bucket" ->
      """SELECT CAST(o_orderkey % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY CAST(o_orderkey % 7 AS BIGINT) ORDER BY grp""".stripMargin,
    // the co-partitioned enriching join, replayed relationally
    "kv_spj" ->
      """WITH st AS (SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS st_cnt
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT a.o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(a.o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(max(b.st_cnt) AS BIGINT) AS st_cnt,
        |  CAST(sum(CAST(a.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders a JOIN st b ON a.o_orderstatus = b.o_orderstatus
        |GROUP BY a.o_orderstatus ORDER BY st""".stripMargin,
    // untouched/halved/shifted per-status populations after both
    // overwrite shapes
    "kv_partition_overwrite" ->
      """SELECT o_orderstatus AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 0.5
        |    WHEN o_orderstatus = 'O' THEN o_totalprice + 1000
        |    ELSE o_totalprice END AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM orders GROUP BY o_orderstatus ORDER BY st""".stripMargin,
    // the parent's final state: the baseline slice plus the AUDITED
    // streamed slice — the poison branch's row must never appear
    "kv_wap" ->
      """SELECT o_orderstatus AS status, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 3 IN (0, 1)
        |GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    // the three insert slices cover ALL orders, so the partitions
    // relation's per-status row counts equal a plain relational group-by
    "kv_meta_tables" ->
      """SELECT 'o_orderstatus=' || o_orderstatus AS partition,
        |  CAST(count(*) AS BIGINT) AS num_rows
        |FROM orders GROUP BY o_orderstatus ORDER BY partition""".stripMargin,
    // the three slices cover ALL orders; the aggregate crosses the three
    // layout epochs (pre-rename, post-rename, post-drop/add) and late_cnt
    // counts exactly the rows written after the ADD
    "kv_column_mapping" ->
      """SELECT o_orderstatus AS status, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        |  count(CASE WHEN o_orderkey % 3 = 2 THEN 1 END) AS late_cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY status""".stripMargin,
    // SHOW PARTITIONS' old-spec half vs the data it claims to describe
    "kv_partition_evolve" ->
      """SELECT 'o_orderstatus=' || o_orderstatus AS partition,
        |  CAST(count(*) AS BIGINT) AS num_rows
        |FROM orders WHERE o_orderkey % 3 = 0
        |GROUP BY o_orderstatus ORDER BY partition""".stripMargin,
    // the evolved end state: source rows win (matched updates doubled the
    // price and stamped the status, unmatched source rows inserted
    // full-width), untouched base rows keep original price + NULL status
    "kv_merge_evolve" ->
      """WITH base AS (SELECT o_orderkey, o_totalprice AS price FROM orders
        |    WHERE o_orderkey % 3 = 0),
        |  src AS (SELECT o_orderkey, o_totalprice * 2 AS price,
        |    o_orderstatus FROM orders WHERE o_orderkey % 2 = 0),
        |  merged AS (
        |    SELECT o_orderkey, price, o_orderstatus FROM src
        |    UNION ALL
        |    SELECT b.o_orderkey, b.price, CAST(NULL AS VARCHAR)
        |    FROM base b WHERE b.o_orderkey NOT IN
        |      (SELECT o_orderkey FROM src))
        |SELECT coalesce(o_orderstatus, '~') AS st, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS price
        |FROM merged GROUP BY coalesce(o_orderstatus, '~')
        |ORDER BY st""".stripMargin,
    // the promoted end state: base rows ∪ branch-added rows, with the
    // branch's pre-publish UPDATE folded in (parent-isolation, head
    // visibility, and ref cleanup are gated by the query's own requires)
    "kv_branch" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity + 100
        |    ELSE l_quantity END AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_orderkey % 4 IN (0, 1)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the partitioned table holds exactly the inserted rows (tuple-per-
    // file layout and exact pruning are gated by the query's own requires)
    "kv_partitioned" ->
      """SELECT CAST(o_custkey % 10 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY CAST(o_custkey % 10 AS BIGINT) ORDER BY grp""".stripMargin,
    // the sortBy table holds exactly the inserted rows (layout is gated by
    // the query's own requires; the oracle gates the data)
    "kv_clustered_write" ->
      """SELECT CAST(o_custkey % 7 AS BIGINT) AS grp, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey BETWEEN 1 AND 3000
        |GROUP BY CAST(o_custkey % 7 AS BIGINT) ORDER BY grp""".stripMargin,
    // the violating INSERT and UPDATE both refused before commit, so the
    // table holds exactly the clean first insert
    "kv_constraint" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem WHERE l_orderkey % 3 = 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the index path must reproduce plain-predicate semantics exactly
    "secondary_index" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey IN (7, 42, 101)
        |ORDER BY o_orderkey""".stripMargin,
    // native row-level DML replayed relationally: filter-insert, delete,
    // conditional update, then the three-clause MERGE (matched-delete on
    // the SOURCE price, matched-update, not-matched insert)
    "kv_rowlevel_dml" ->
      """WITH t0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey % 4 = 0),
        |t1 AS (SELECT * FROM t0 WHERE NOT (o_orderkey % 20 = 0)),
        |t2 AS (SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1.5
        |              ELSE o_totalprice END AS o_totalprice FROM t1),
        |src AS (SELECT o_orderkey, o_totalprice FROM orders
        |        WHERE o_orderkey % 8 = 0),
        |t3 AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.o_orderkey IS NULL THEN t.o_orderstatus
        |         ELSE 'M' END AS o_orderstatus,
        |    t.o_totalprice
        |  FROM t2 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |  WHERE s.o_orderkey IS NULL OR NOT (s.o_totalprice > 150000.0)
        |  UNION ALL
        |  SELECT s.o_orderkey, 'N', s.o_totalprice FROM src s
        |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM t2))
        |SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM t3 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // the epoch diff recomputed relationally: full key join of the two
    // replayed boundary states, changed rows only, before-image for
    // deletes and after-image otherwise
    "kv_changefeed" ->
      """WITH t0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey % 3 IN (0, 1)),
        |v3 AS (SELECT * FROM t0 WHERE NOT (o_orderkey % 5 = 0)),
        |v4 AS (SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 2.0
        |              ELSE o_totalprice END AS o_totalprice FROM v3),
        |v5 AS (SELECT * FROM v4 UNION ALL
        |       SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |       WHERE o_orderkey % 3 = 2 AND o_orderkey % 7 = 0)
        |SELECT CASE WHEN b.o_orderkey IS NULL THEN 'insert'
        |            WHEN a.o_orderkey IS NULL THEN 'delete'
        |            ELSE 'update' END AS op,
        |  coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN a.o_orderkey IS NOT NULL THEN a.o_orderstatus
        |       ELSE b.o_orderstatus END AS o_orderstatus,
        |  CASE WHEN a.o_orderkey IS NOT NULL THEN a.o_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice
        |FROM t0 b FULL JOIN v5 a ON b.o_orderkey = a.o_orderkey
        |WHERE b.o_orderkey IS NULL OR a.o_orderkey IS NULL
        |   OR NOT (a.o_orderstatus = b.o_orderstatus
        |           AND a.o_totalprice = b.o_totalprice)
        |ORDER BY op, o_orderkey""".stripMargin,
    // exactly-once across the restart: every change record once — no
    // replay of batches 0-1, no gap over the stopped window
    "kv_cdc_restart" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders WHERE o_orderkey % 4 = 2),
        |del AS (SELECT * FROM base WHERE o_orderkey % 24 = 2),
        |upd AS (SELECT * FROM base
        |        WHERE NOT o_orderkey % 24 = 2 AND o_orderstatus = 'F')
        |SELECT change_type, commit_epoch, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'insert' AS change_type, CAST(0 AS BIGINT) AS commit_epoch,
        |    o_orderkey, o_totalprice FROM base
        |  UNION ALL
        |  SELECT 'delete', 1, o_orderkey, o_totalprice FROM del
        |  UNION ALL
        |  SELECT 'update_preimage', 2, o_orderkey, o_totalprice FROM upd
        |  UNION ALL
        |  SELECT 'update_postimage', 2, o_orderkey, o_totalprice + 0.5 FROM upd
        |) GROUP BY change_type, commit_epoch
        |ORDER BY commit_epoch, change_type""".stripMargin,
    // the REPLACEd definition is the table: two columns, the %6=3 slice
    "catalog_ctas" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders WHERE o_orderkey % 6 = 3
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // every history row's counts recomputed relationally: appends from
    // the epoch predicates, delta record counts from the DML predicates
    // (%15=0 implies %3=0, so the DELETE hits only epoch-1 rows)
    "kv_history" ->
      """WITH t AS (SELECT o_orderkey AS k, o_orderstatus AS st FROM orders
        |           WHERE o_orderkey % 3 IN (0, 1))
        |SELECT CAST(1 AS BIGINT) AS version, 'append' AS operation,
        |  (SELECT count(*) FROM t WHERE k % 3 = 0) AS rows_added,
        |  CAST(0 AS BIGINT) AS rows_deleted
        |UNION ALL
        |SELECT 2, 'append', (SELECT count(*) FROM t WHERE k % 3 = 1), 0
        |UNION ALL
        |SELECT 3, 'dml-delta', 0, (SELECT count(*) FROM t WHERE k % 15 = 0)
        |UNION ALL
        |SELECT 4, 'dml-delta',
        |  (SELECT count(*) FROM t WHERE NOT k % 15 = 0 AND st = 'F'),
        |  (SELECT count(*) FROM t WHERE NOT k % 15 = 0 AND st = 'F')
        |ORDER BY version""".stripMargin,
    // both schema generations replayed relationally: pre-evolution rows
    // carry NULL for the added column (count(col) pins the null-fill)
    "kv_schema_evolution" ->
      """WITH old AS (SELECT o_orderkey, o_orderstatus,
        |               CAST(NULL AS DOUBLE) AS o_totalprice
        |             FROM orders WHERE o_orderkey % 4 = 3),
        |new AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |        FROM orders WHERE o_orderkey % 4 = 0),
        |u AS (SELECT * FROM old UNION ALL SELECT * FROM new)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  count(o_totalprice) AS priced,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM u GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the maintained streaming aggregate must equal a direct aggregate of
    // the table's final state: signed change records telescope (+x then
    // -x cancels exactly in decimal arithmetic)
    "mv_cdc_maintain" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders WHERE o_orderkey % 4 = 1),
        |cur AS (SELECT o_orderkey, o_orderstatus,
        |          CASE WHEN o_orderstatus = 'O' THEN o_totalprice - 2.5
        |               ELSE o_totalprice END AS o_totalprice
        |        FROM base WHERE NOT o_orderkey % 13 = 0)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM cur GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the TARGET table's state after log-shipping = the SOURCE's replayed
    // statement sequence
    "kv_replicate" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders WHERE o_orderkey % 4 = 2),
        |cur AS (SELECT o_orderkey, o_orderstatus,
        |          CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 3.0
        |               ELSE o_totalprice END AS o_totalprice
        |        FROM base WHERE NOT o_orderkey % 17 = 0)
        |SELECT o_orderstatus, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM cur GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the CDC stream's change records, replayed relationally with the
    // four-valued _change_type: inserts = the base load (epoch 0);
    // deletes = the DELETE's pre-images (epoch 1); the UPDATE (epoch 2) =
    // update_preimage + update_postimage pairs
    "kv_cdc_stream" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders WHERE o_orderkey % 4 = 0),
        |del AS (SELECT * FROM base WHERE o_orderkey % 20 = 0),
        |upd AS (SELECT * FROM base
        |        WHERE NOT o_orderkey % 20 = 0 AND o_orderstatus = 'F')
        |SELECT change_type, commit_epoch, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM (
        |  SELECT 'insert' AS change_type, CAST(0 AS BIGINT) AS commit_epoch,
        |    o_orderkey, o_totalprice FROM base
        |  UNION ALL
        |  SELECT 'delete', 1, o_orderkey, o_totalprice FROM del
        |  UNION ALL
        |  SELECT 'update_preimage', 2, o_orderkey, o_totalprice FROM upd
        |  UNION ALL
        |  SELECT 'update_postimage', 2, o_orderkey, o_totalprice + 1.5 FROM upd
        |) GROUP BY change_type, commit_epoch
        |ORDER BY commit_epoch, change_type""".stripMargin,
    // the CoW CDC stream's synthesized records, folded SIGNED per epoch:
    // which files a rewrite touches is a layout detail, but the NET
    // change per epoch is exact — +base slices at epochs 0/1, -deleted
    // rows at epoch 2, and the UPDATE's +2.5-per-row price shift (zero
    // net rows/keys) at epoch 3
    "kv_cdc_cow" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders WHERE o_orderkey % 4 = 2),
        |del AS (SELECT * FROM base WHERE o_orderkey % 20 = 2),
        |upd AS (SELECT * FROM base
        |        WHERE NOT o_orderkey % 20 = 2 AND o_orderstatus = 'O')
        |SELECT commit_epoch, CAST(sum(sgn) AS BIGINT) AS net_rows,
        |  CAST(sum(sgn * o_orderkey) AS BIGINT) AS net_keys,
        |  CAST(sum(CAST(sgn * o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS net_price
        |FROM (
        |  SELECT CAST(0 AS BIGINT) AS commit_epoch, CAST(1 AS BIGINT) AS sgn,
        |    o_orderkey, o_totalprice FROM base WHERE o_orderkey % 8 = 2
        |  UNION ALL
        |  SELECT 1, 1, o_orderkey, o_totalprice FROM base WHERE o_orderkey % 8 = 6
        |  UNION ALL
        |  SELECT 2, -1, o_orderkey, o_totalprice FROM del
        |  UNION ALL
        |  SELECT 3, -1, o_orderkey, o_totalprice FROM upd
        |  UNION ALL
        |  SELECT 3, 1, o_orderkey, o_totalprice + 2.5 FROM upd
        |) GROUP BY commit_epoch
        |ORDER BY commit_epoch""".stripMargin,
    // each VERSION AS OF boundary = the epoch-prefix state, replayed
    // relationally; version 2 reconstructs through retained CoW history
    "kv_version_asof" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey % 3 = 0),
        |v2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |       WHERE o_orderkey % 3 IN (0, 1)),
        |cur AS (SELECT * FROM v2 WHERE NOT (o_orderkey % 7 = 0))
        |SELECT CAST(1 AS INTEGER) AS version, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM v1
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM v2
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM cur
        |ORDER BY version""".stripMargin,
    // TIMESTAMP AS OF resolves through the recorded commit clock: a
    // timestamp 1 ms before epoch 2's commit = epoch 1's prefix state,
    // epoch 2's exact timestamp = epochs 1-2, epoch 3's = all three
    "kv_timestamp_asof" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders
        |            WHERE o_orderkey % 5 = 0),
        |v2 AS (SELECT o_orderkey, o_totalprice FROM orders
        |       WHERE o_orderkey % 5 IN (0, 1)),
        |v3 AS (SELECT o_orderkey, o_totalprice FROM orders
        |       WHERE o_orderkey % 5 IN (0, 1, 2))
        |SELECT CAST(1 AS INTEGER) AS version, count(*) AS cnt,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM v1
        |UNION ALL
        |SELECT 2, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM v2
        |UNION ALL
        |SELECT 3, count(*), CAST(sum(o_orderkey) AS BIGINT),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) FROM v3
        |ORDER BY version""".stripMargin,
    // the merge-on-read twin: identical relational replay — both write
    // shapes (file rewrite vs delta overlay) must produce identical state
    "kv_mor_dml" ->
      """WITH t0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey % 4 = 0),
        |t1 AS (SELECT * FROM t0 WHERE NOT (o_orderkey % 20 = 0)),
        |t2 AS (SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1.5
        |              ELSE o_totalprice END AS o_totalprice FROM t1),
        |src AS (SELECT o_orderkey, o_totalprice FROM orders
        |        WHERE o_orderkey % 8 = 0),
        |t3 AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.o_orderkey IS NULL THEN t.o_orderstatus
        |         ELSE 'M' END AS o_orderstatus,
        |    t.o_totalprice
        |  FROM t2 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        |  WHERE s.o_orderkey IS NULL OR NOT (s.o_totalprice > 150000.0)
        |  UNION ALL
        |  SELECT s.o_orderkey, 'N', s.o_totalprice FROM src s
        |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM t2))
        |SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM t3 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // metadata-only answers must equal the data's own aggregates
    "kv_agg_pushdown" ->
      """SELECT count(*) AS cnt,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        | min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
        |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin,
    // the broadcast plan must change nothing but the wall clock: the
    // oracle replays the selective join relationally (same floor(max/12)
    // custkey cutoff the Spark side computes)
    "kv_cbo_broadcast" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey <= (SELECT CAST(floor(max(o_custkey) / 12.0) AS BIGINT)
        |                    FROM orders)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // clone CDC: foreign epochs 0-1 insert, local epoch 2 inserts, and the
    // cross-boundary CoW delete nets out exactly the %16=1 rows at epoch 3
    "kv_clone_cdc" ->
      """SELECT commit_epoch, CAST(sum(sgn) AS BIGINT) AS net_rows,
        |  CAST(sum(sgn * o_orderkey) AS BIGINT) AS net_keys,
        |  CAST(sum(CAST(sgn * o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS net_price
        |FROM (
        |  SELECT CAST(0 AS BIGINT) AS commit_epoch, CAST(1 AS BIGINT) AS sgn,
        |    o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 8 = 1
        |  UNION ALL
        |  SELECT 1, 1, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 8 = 5
        |  UNION ALL
        |  SELECT 2, 1, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 8 = 3
        |  UNION ALL
        |  SELECT 3, -1, o_orderkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 16 = 1
        |) GROUP BY commit_epoch
        |ORDER BY commit_epoch""".stripMargin,
    // the tagged boundary is epochs <= 1 (keys % 3 in (0, 1)); the current
    // state is everything minus the even-key CoW delete
    "kv_tag_travel" ->
      """SELECT * FROM (
        |  SELECT 'tag' AS state, o_orderstatus, count(*) AS cnt,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderkey % 3 <= 1 GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'cur', o_orderstatus, count(*),
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY o_orderstatus
        |) ORDER BY state, o_orderstatus""".stripMargin,
    // each wave replays with its expected default literals; wave-1 rows
    // predate the evolved column and must read NULL, never 'fresh'
    "kv_defaults" ->
      """SELECT id, qty, src, flag FROM (
        |  SELECT o_orderkey AS id, o_totalprice AS qty, 'manual' AS src,
        |         CAST(NULL AS VARCHAR) AS flag
        |  FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'w2', 'fresh'
        |  FROM orders WHERE o_orderkey % 10 = 3
        |  UNION ALL
        |  SELECT CAST(-1 AS BIGINT), CAST(0.5 AS DOUBLE), 'manual', 'fresh'
        |) ORDER BY id""".stripMargin,
    // compaction must preserve current-read semantics bit-for-bit
    "kv_compact" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // sparse-qualifier semantics: the narrow batch's missing column is NULL
    "schema_evolution" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, o_orderpriority
        |  FROM orders WHERE o_orderstatus = 'O')
        |SELECT coalesce(o_orderpriority, '<absent>') AS pri, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM t GROUP BY pri ORDER BY pri""".stripMargin,
    // catalog route + both insert modes recomputed relationally
    "catalog_kv_dml" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0
        |  UNION ALL SELECT -1, 'Z', 0.5)
        |SELECT o_orderstatus, count(*) AS cnt, min(o_orderkey) AS min_key,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // ditto for the TRANSPARENT path (optimizer-rewritten plain filter)
    "index_rewrite" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey IN (11, 57, 123) AND o_totalprice > 1000
        |ORDER BY o_orderkey""".stripMargin,
    // the kv-table index path must reproduce post-DML full-scan semantics
    "kv_index_rewrite" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 4 = 3
        |  AND NOT (o_orderkey % 20 = 3)
        |  AND o_custkey IN (11, 57, 123)
        |ORDER BY o_orderkey""".stripMargin,
    // post-DML squash + rebuilt index must reproduce the deleted state
    "index_rewrite_dml" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_custkey IN (11, 57, 123)
        |  AND NOT (o_orderstatus = 'F')
        |ORDER BY o_orderkey""".stripMargin,
    // the runtime filter never changes results — the oracle is the plain
    // generator-to-VALUES join
    "dsv2_runtime_prune" ->
      """SELECT k, (k * 2654435761) % 1000 AS v,
        | 'r' || CAST(k % 97 AS VARCHAR) AS tag
        |FROM generate_series(0, 99999) t(k)
        |JOIN (VALUES (100), (2000), (55555), (60001), (60002)) d(dk)
        |  ON k = dk
        |ORDER BY k""".stripMargin,
    // same generator formula through the catalog route; CAST pins DuckDB's
    // HUGEINT sum back to BIGINT to match Spark's long
    "catalog_table" ->
      """WITH r AS (
        |  SELECT k, (k * 2654435761) % 1000 AS v,
        |         'r' || CAST(k % 97 AS VARCHAR) AS tag
        |  FROM generate_series(0, 99999) t(k)
        |  WHERE k BETWEEN 5000 AND 64999)
        |SELECT tag, count(*) AS cnt, min(v) AS min_v, max(v) AS max_v,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM r GROUP BY tag ORDER BY tag""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |                     o_totalprice AS price FROM orders),
        |u AS (SELECT k, 'X' AS st, price * 1.1 AS price FROM base WHERE k % 7 = 0
        |      UNION ALL
        |      SELECT -k, 'N', price FROM base WHERE k % 13 = 0),
        |m AS (SELECT coalesce(u.st, base.st) AS st,
        |             coalesce(u.price, base.price) AS price
        |      FROM base FULL JOIN u USING (k))
        |SELECT st, count(*) AS cnt,
        | CAST(sum(CAST(price AS DECIMAL(18,6))) AS DOUBLE) AS price_sum
        |FROM m GROUP BY st ORDER BY st""".stripMargin,
    "version_compact" ->
      """SELECT user_id, event_type, event_id, ts, value FROM (
        |  SELECT user_id, event_type, event_id, ts, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "export_jsonl" ->
      """SELECT lang, count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // replays the Spark shard expression: first 6 md5 hex chars → BIGINT % 8
    "export_sharded" ->
      """SELECT CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) % 8
        |   AS shard,
        | count(*) AS n_docs,
        | CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        | min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,
    "keyrange_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE (l_orderkey > 1000 OR (l_orderkey = 1000 AND l_linenumber >= 2))
        |  AND (l_orderkey < 3000 OR (l_orderkey = 3000 AND l_linenumber <= 3))
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""".stripMargin,
    "insert_select" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "insert_values" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 'alpha', CAST(10.25 AS DOUBLE)), (2, 'beta', -3.5), (3, 'gamma', 99.0),
        |  (4, 'delta', 0.125), (5, 'epsilon', 7.75)) t(id, tag, val)
        |ORDER BY id""".stripMargin,
    "bulkload_sorted_write" ->
      """SELECT count(*) AS n_rows, min(l_orderkey) AS min_key,
        | max(l_orderkey) AS max_key,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS price_sum
        |FROM lineitem""".stripMargin,
    "bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "csv_ingest" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        | min(o_totalprice) AS min_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "partitioned_write" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderstatus,
        | count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |GROUP BY o_year, o_orderstatus
        |ORDER BY o_year, o_orderstatus""".stripMargin,
    "dsv2_keyrange" ->
      """SELECT k, (k * 2654435761) % 1000 AS v,
        | 'r' || CAST(k % 97 AS VARCHAR) AS tag
        |FROM generate_series(0, 99999) t(k)
        |WHERE k BETWEEN 20000 AND 79999 AND (k * 2654435761) % 1000 < 500
        |ORDER BY k""".stripMargin,
    // the 20 smallest surviving keys — the truncated-range semantics
    "dsv2_limit_pushdown" ->
      """SELECT k, (k * 2654435761) % 1000 AS v,
        | 'r' || CAST(k % 97 AS VARCHAR) AS tag
        |FROM generate_series(20000, 20019) t(k)
        |ORDER BY k""".stripMargin,
    // replays the generator + grouping; CAST(sum) pins DuckDB's HUGEINT back
    // to BIGINT so dtypes match Spark's long
    "dsv2_agg_pushdown" ->
      """WITH r AS (
        |  SELECT k, (k * 2654435761) % 1000 AS v,
        |         'r' || CAST(k % 97 AS VARCHAR) AS tag
        |  FROM generate_series(0, 99999) t(k)
        |  WHERE k >= 20000 AND k < 80000)
        |SELECT tag, count(k) AS cnt, min(v) AS min_v, max(v) AS max_v,
        |       CAST(sum(v) AS BIGINT) AS sum_v
        |FROM r GROUP BY tag ORDER BY tag""".stripMargin,
    // replays the deterministic dim: target years 1995-1996
    "dpp_prune" ->
      """WITH dim AS (SELECT * FROM (VALUES (1995, 'target'), (1996, 'target'))
        |             t(dim_year, label))
        |SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders JOIN dim ON year(o_orderdate) = dim_year
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // ORC round trip is lossless, so the oracle aggregates the parquet
    // source under the same filter
    "orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        | min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // the bloom probe never changes results — the oracle is the plain join
    "bloom_prune" ->
      """SELECT p_size, count(*) AS cnt,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#13' AND p_size <= 25
        |GROUP BY p_size ORDER BY p_size""".stripMargin,
    // layout-independent semantics: the oracle is the plain 2-D box filter
    "zorder_layout" ->
      """SELECT l_suppkey, count(*) AS cnt,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_partkey BETWEEN 20 AND 120 AND l_suppkey BETWEEN 1 AND 6
        |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    // incremental-equals-full: the oracle recomputes the rollup from scratch
    "mv_incremental" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    // the kv-table MV path must reproduce the direct aggregation over
    // BOTH epochs (the second folded in by the O(delta) refresh)
    "kv_mv_rewrite" ->
      """SELECT o_orderstatus,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderkey % 4 = 1
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the DIRECT aggregation: the rewritten-to-snapshot plan must match it
    "mv_rewrite" ->
      """SELECT o_orderstatus,
        | CAST(count(*) AS BIGINT) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the sink round trip is lossless (exact long/double text round trip),
    // so the oracle aggregates the parquet source directly
    "dsv2_sink" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
}
