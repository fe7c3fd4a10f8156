package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Window functions (SURVEY.md §2B rows B21–B23).
  *
  * Determinism: every window ORDER BY ends in a unique key so frames are
  * total-ordered; running sums aggregate in DECIMAL so the cumulative values
  * are exact (order-independent bitwise match with the DuckDB oracle).
  */
object Windows {

  /** B21: row_number / rank / dense_rank over a ties-rich bucket ordering. */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / 25000).cast(LongType))
    val det = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("bucket").desc, col("o_orderkey"))
    val ties = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("bucket").desc)
    o.select(col("o_orderpriority"), col("bucket"), col("o_orderkey"),
        row_number().over(det).as("rn"),
        rank().over(ties).as("rnk"),
        dense_rank().over(ties).as("drk"))
      .filter(col("rn") <= 10)
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** B22: lag / lead / first_value analytics per user timeline. */
  def windowLagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_v"),
        lead(col("value"), 1).over(w).as("next_v"),
        first(col("value")).over(w).as("first_v"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** B23: running + sliding frame aggregates (exact decimal accumulation). */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slide = base.rowsBetween(-3, 0)
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        sum(dec(col("value"))).over(cum).cast(DoubleType).as("running_sum"),
        sum(dec(col("value"))).over(slide).cast(DoubleType).as("sliding4_sum"),
        count(lit(1)).over(cum).as("running_cnt"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** B23 (RANGE form): value-distance frame — all same-customer orders within
    * 10k below the current price. RANGE frames depend only on the order
    * VALUE, so ties cannot reorder the result across engines. */
  def windowRangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      .rangeBetween(-10000L, 0L)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        count(lit(1)).over(w).as("n_band"),
        sum(dec(col("o_totalprice"))).over(w).cast(S).cast(DoubleType).as("band_sum"))
      .orderBy(col("o_orderkey"))
  }

  /** B21 extension: distribution functions — ntile / percent_rank / cume_dist
    * per (flag, quartile), computed by EXACT RANK ARITHMETIC instead of a
    * window sort. The r6 version partitioned a window by l_returnflag (3
    * distinct values), so one task sorted ~1/3 of the table at any scale —
    * a straggler at 100×. But the window's ORDER BY leads with l_quantity
    * under a total order, so every judged column is a function of (a) the
    * per-flag row count n and (b) the tiny (flag, quantity) histogram:
    *   - ntile(4) bucket k covers ranks (r_end(k−1), r_end(k)] with
    *     r_end(k) = k·(n div 4) + min(k, n mod 4) — the first (n mod 4)
    *     buckets get the extra row, SQL's ntile rule;
    *   - quantity is monotone in rank, so qty-at-rank-r = min qty whose
    *     cumulative count reaches r (histogram lookup, not a sort);
    *   - max_pr = (r_end−1)/(n−1), max_cd = r_end/n — percent_rank /
    *     cume_dist at the bucket's last rank, same IEEE division the
    *     engines perform.
    * Plan shape: ONE map-side-combined hash aggregate over lineitem; the
    * window/join that follow run on the ≤(3×50)-row histogram. The oracle
    * stays the ntile window form — the per-round hash match IS the proof
    * that the rank arithmetic reproduces the window semantics. */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    // running count over the ~50-value-per-flag histogram — not the table
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(wCum))
    val bounds = hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      .select(col("l_returnflag").as("f"), col("n"),
        explode(sequence(lit(1), lit(4))).as("quartile"))
      .withColumn("sz", expr("n div 4") +
        when(col("quartile") <= col("n") % 4, 1L).otherwise(0L))
      .filter(col("sz") > 0)
      .withColumn("r_end",
        col("quartile") * expr("n div 4") + least(col("quartile"), col("n") % 4))
      .withColumn("r_start", col("r_end") - col("sz") + 1)
    bounds.join(cum, col("f") === col("l_returnflag"))
      .groupBy(col("f"), col("quartile"), col("n"), col("sz"),
        col("r_start"), col("r_end"))
      .agg(
        min(when(col("cum") >= col("r_start"), col("l_quantity"))).as("min_qty"),
        min(when(col("cum") >= col("r_end"), col("l_quantity"))).as("max_qty"))
      .select(col("f").as("l_returnflag"), col("quartile").cast(IntegerType),
        col("sz").as("cnt"), col("min_qty"), col("max_qty"),
        when(col("n") > 1, (col("r_end") - 1).cast(DoubleType) /
          (col("n") - 1).cast(DoubleType)).otherwise(0.0).as("max_pr"),
        (col("r_end").cast(DoubleType) / col("n").cast(DoubleType)).as("max_cd"))
      .orderBy(col("l_returnflag"), col("quartile"))
  }

  /** B21 via the CUSTOM PHYSICAL OPERATOR (plans.TopK): top-3 orders per
    * priority class through the bounded-heap exec pair instead of the
    * window sort — the judged result must hash-match the stock
    * window-function oracle, so the operator's semantics are gated like
    * every built-in. (o_totalprice, o_orderkey) is a total order per
    * group, the determinism contract the heap requires. */
  def windowTopkHeap(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.perGroup(
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      Seq("o_orderpriority"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))

  /** B21/B24 via the same custom operator, GLOBAL form: top-50 orders by
    * price through partial per-partition heaps + one final heap behind an
    * AllTuples exchange — the `orderBy().limit(k)` shape with no sort
    * anywhere (PlanSpec asserts the plan). At 100 TB the exchange carries
    * ≤ k rows per input partition instead of feeding a TakeOrdered's
    * per-partition sorts. Hash-gated against the stock ORDER BY/LIMIT. */
  def windowTopkGlobal(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.global(
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Seq(("o_totalprice", false), ("o_orderkey", true)), 50)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_topk_heap" -> (windowTopkHeap _),
    "window_topk_global" -> (windowTopkGlobal _),
    "window_distribution" -> (windowDistribution _),
    "window_rank" -> (windowRank _),
    "window_laglead" -> (windowLagLead _),
    "window_running" -> (windowRunning _),
    "window_rangeframe" -> (windowRangeFrame _))

  val oracles: Map[String, String] = Map(
    // the custom heap operator vs the stock window-function formulation
    "window_topk_heap" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin,
    // the global heap pair vs the stock ORDER BY + LIMIT formulation
    "window_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "window_distribution" ->
      """SELECT l_returnflag, CAST(quartile AS INTEGER) AS quartile, count(*) AS cnt,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  max(pr) AS max_pr, max(cd) AS max_cd
        |FROM (SELECT l_returnflag, l_quantity,
        |        ntile(4)       OVER w AS quartile,
        |        percent_rank() OVER w AS pr,
        |        cume_dist()    OVER w AS cd
        |      FROM lineitem
        |      WINDOW w AS (PARTITION BY l_returnflag
        |                   ORDER BY l_quantity, l_orderkey, l_linenumber,
        |                            l_extendedprice, l_partkey, l_suppkey))
        |GROUP BY l_returnflag, quartile
        |ORDER BY l_returnflag, quartile""".stripMargin,
    "window_rank" ->
      """SELECT o_orderpriority, bucket, o_orderkey, CAST(rn AS INTEGER) AS rn,
        |  CAST(rnk AS INTEGER) AS rnk, CAST(drk AS INTEGER) AS drk FROM (
        |  SELECT o_orderpriority, bucket, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC, o_orderkey) AS rn,
        |    rank()       OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS rnk,
        |    dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY bucket DESC) AS drk
        |  FROM (SELECT o_orderpriority, o_orderkey,
        |          CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket FROM orders))
        |WHERE rn <= 10
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "window_laglead" ->
      """SELECT user_id, ts, event_id, value,
        |  lag(value, 1)  OVER w AS prev_v,
        |  lead(value, 1) OVER w AS next_v,
        |  first_value(value) OVER w AS first_v,
        |  value - lag(value, 1) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, ts, event_id""".stripMargin,
    "window_rangeframe" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  count(*) OVER w AS n_band,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w
        |       AS DECIMAL(38,6)) AS DOUBLE) AS band_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
        |             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "window_running" ->
      """SELECT user_id, ts, event_id, value,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER cum AS DOUBLE) AS running_sum,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER slide AS DOUBLE) AS sliding4_sum,
        |  count(*) OVER cum AS running_cnt
        |FROM events
        |WINDOW cum AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       slide AS (PARTITION BY user_id ORDER BY ts, event_id
        |                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts, event_id""".stripMargin)
}
