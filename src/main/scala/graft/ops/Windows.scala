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
    * (all rank-arithmetic: int ratios → bit-exact doubles). Reported as a
    * per-(flag, quartile) aggregate because lineitem has full-duplicate rows:
    * ntile splits ties across bucket boundaries in engine-dependent order,
    * but bucket counts and min/max/extremes over identical rows are
    * tie-invariant, so the aggregate hash-matches. */
  def windowDistribution(s: SparkSession, d: String): DataFrame = {
    val det = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_partkey"), col("l_suppkey"))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"),
        ntile(4).over(det).as("quartile"),
        percent_rank().over(det).as("pr"),
        cume_dist().over(det).as("cd"))
      .groupBy(col("l_returnflag"), col("quartile"))
      .agg(count(lit(1)).as("cnt"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        max(col("pr")).as("max_pr"),
        max(col("cd")).as("max_cd"))
      .orderBy(col("l_returnflag"), col("quartile"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "window_distribution" -> (windowDistribution _),
    "window_rank" -> (windowRank _),
    "window_laglead" -> (windowLagLead _),
    "window_running" -> (windowRunning _),
    "window_rangeframe" -> (windowRangeFrame _))

  val oracles: Map[String, String] = Map(
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
