package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Core relational surface (SURVEY.md §2B rows B4–B31).
  *
  * The reference (Astro, Spark-SQL-on-HBase) inherits all of these from stock
  * Catalyst by extending SQLContext [ref*: org.apache.spark.sql.hbase — mount
  * empty, public-knowledge citation per SURVEY.md §0]; we express them with the
  * Spark 4 DataFrame API and let Catalyst/AQE pick physical plans. Broadcast
  * hints mark dimension tables so the 100 TB plan keeps fact-table scans
  * shuffle-free where possible.
  */
object Relational {

  /** Flagship: TPC-H Q1-shaped pricing summary — scan→filter→agg→sort (B15/B16). */
  def q1Pricing(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val one = lit(1).cast(M4)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumS(col("l_quantity")).as("sum_qty"),
        sumS(col("l_extendedprice")).as("sum_base_price"),
        sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount")))).cast(S).cast(DoubleType).as("sum_disc_price"),
        sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))) * (one + dec4(col("l_tax")))).cast(S).cast(DoubleType).as("sum_charge"),
        avgD(col("l_quantity")).as("avg_qty"),
        avgD(col("l_extendedprice")).as("avg_price"),
        avgD(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Composite flagship #2 — TPC-H Q3 shape (shipping priority): selective
    * dim filter → two fact joins with date predicates on both sides → agg →
    * top-10 by revenue. Exercises the full filter-pushdown + join-order +
    * TakeOrdered pipeline in one user-shaped query. */
  def q3Shipping(s: SparkSession, d: String): DataFrame = {
    val cut = lit("1997-01-01").cast(TimestampType)
    val one = lit(1).cast(M4)
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < cut)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > cut)
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local supplier volume): the classic 6-table join-order
    * stress — customer⨝orders⨝lineitem⨝supplier with the customer-and-
    * supplier-share-a-nation constraint, nation⨝region as broadcast dims.
    * Scale notes: region/nation are tiny (broadcast), the c/o/l/s chain
    * shuffles on its equi-keys, and the date range reaches the parquet scan
    * as PushedFilters; the extra c_nationkey = s_nationkey equality rides
    * the supplier join — no second shuffle. Revenue uses the exact-decimal
    * money pipeline (dec4 products → S-sum → double) like q1/q3. */
  def q5SupplierVolume(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1996-01-01").cast(TimestampType)
    val hi = lit("1998-01-01").cast(TimestampType)
    val one = lit(1).cast(M4)
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q18 shape (large-volume orders): a HAVING-filtered aggregate as a
    * semi-join gate — orders whose lineitem quantity sum exceeds the bar,
    * re-joined to customer/lineitem for the top-20 report. Scale notes: the
    * gate is one map-combined groupBy on l_orderkey; the left-semi keeps the
    * orders stream narrow before the reporting join; the threshold compares
    * EXACT decimal sums (double sums would be order-dependent at the
    * boundary and could disagree with the oracle). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("qsum"))
      .filter(col("qsum") > lit(250))
      .select(col("l_orderkey").as("big_okey"))
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("big_okey"), "left_semi")
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sumS(col("l_quantity")).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q7 shape (volume shipping): directed trade between four fixed
    * trading-group nations by (supplier nation, customer nation, ship year).
    * The nation dims are pre-filtered to the group and BROADCAST, so
    * the supplier/customer joins prune most of both tables before the big
    * lineitem/orders equi-join shuffles; the cross-nation direction predicate
    * (supp ≠ cust) runs after the joins on the already-tiny stream.
    * Exact decimal revenue, like Q5. */
  def q7NationVolume(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val grp = Seq("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    val sn = Tables.nation(s, d).filter(col("n_name").isin(grp: _*))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val cn = Tables.nation(s, d).filter(col("n_name").isin(grp: _*))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.supplier(s, d)
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(Tables.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q14 shape (promotion effect): the revenue share of PROMO-type
    * parts in one ship month. The month filter reaches the lineitem scan as
    * PushedFilters; the part side joins on p_partkey (AQE broadcasts it at
    * bench scale); promo membership is a per-row CASE inside the aggregate,
    * not a second join. Both revenue sums are EXACT decimals; the share is
    * one IEEE division of the two (already-identical) doubles. */
  def q14PromoShare(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val rev = dec4(col("l_extendedprice")) * (one - dec4(col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)).cast(S).cast(DoubleType)
          .as("promo_revenue"),
        sum(rev).cast(S).cast(DoubleType).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .withColumn("promo_share",
        col("promo_revenue") * lit(100.0) / col("total_revenue"))
  }

  /** TPC-H Q4 shape (order priority checking): orders in one quarter that
    * have at least one SLOW lineitem (shipped >90 days after the order date
    * — the fixture has no commit/receipt dates, so ship lag stands in for
    * the late-delivery predicate), counted per priority. The EXISTS
    * decorrelates to a LEFT SEMI join whose condition spans both sides
    * (l_orderkey = o_orderkey AND l_shipdate > o_orderdate + 90 days): one
    * shuffle on the order key, no duplicate counting however many lines
    * qualify. The oracle keeps the correlated EXISTS form. */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val lo = lit("1997-01-01").cast(TimestampType)
    val hi = lit("1997-07-01").cast(TimestampType)
    val li = Tables.lineitem(s, d)
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lo && col("o_orderdate") < hi)
      .join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape (forecast revenue change): the canonical pure
    * scan→filter→agg — every predicate (ship year, discount band, quantity
    * cap) reaches the parquet scan as PushedFilters, then one exact-decimal
    * product sum. The simplest possible 100 TB query: no shuffle at all
    * beyond the final 1-row combine. */
  def q6Forecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType) &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec4(col("l_extendedprice")) * dec4(col("l_discount")))
        .cast(S).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q8 shape (national market share): of all ECONOMY-part revenue
    * sold into the AMERICA region over two years, the share supplied by one
    * nation, per order year. Part (pre-filtered) and the dim chain broadcast;
    * the supplier-nation membership is a per-row CASE inside the aggregate
    * (Q14's pattern), not a second pass. Share = one IEEE division of two
    * exact-decimal sums. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val rev = dec4(col("l_extendedprice")) * (one - dec4(col("l_discount")))
    val pf = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "AMERICA")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", rev)).cast(S)
          .cast(DoubleType).as("nation_volume"),
        sum(rev).cast(S).cast(DoubleType).as("total_volume"))
      .withColumn("mkt_share", col("nation_volume") / col("total_volume"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q10 shape (returned-item reporting): revenue lost to returns per
    * customer over one quarter — orders window filter, l_returnflag = 'R'
    * pushed to the lineitem scan, nation broadcast, top-20 by revenue. */
  def q10Returned(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("o_orderdate") < lit("1997-04-01").cast(TimestampType))
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R")
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q12 shape (shipping modes & priority): among SLOW lines (shipped
    * >365 days after the order — ship lag stands in for the missing
    * commit/receipt dates, and l_returnflag for the missing shipmode), the
    * split between critical- and normal-priority orders per flag class. The
    * two-way split is a conditional count inside ONE aggregate — the
    * canonical CASE-pivot over a join, no second scan. */
  def q12LatePriority(s: SparkSession, d: String): DataFrame = {
    val crit = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join so
    * zero-order customers survive with c_count = 0, then a second aggregate
    * over the counts — the classic two-level group-by histogram. count
    * (o_orderkey) (non-null only) implements the outer-join zero rule. */
  def q13OrderCounts(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 shape (top supplier): a 3-month revenue-per-supplier view,
    * then the supplier(s) achieving the maximum — aggregate→1-row max→
    * equality join back (broadcast), the view-plus-argmax pattern. The max
    * compares the exact-decimal-derived doubles both sides computed
    * identically, so float equality is deterministic here. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("mr"))
    rev.join(broadcast(mx), col("total_revenue") === col("mr"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q17 shape (small-quantity revenue): for one brand's small parts,
    * revenue from lines below 20% of that part's average quantity — the
    * correlated scalar subquery decorrelated into a per-part aggregate
    * joined back. The part filter broadcasts FIRST so both the aggregate
    * and the probe only touch that brand's lines. Threshold arithmetic is
    * the bit-exact avgD pipeline × 0.2. */
  def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val pf = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#11" && col("p_size") < 15)
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
    val qbar = li.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * avgD(col("l_quantity"))).as("qb"))
    li.join(qbar, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qb"))
      .agg((sumS(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicate): an
    * OR-of-ANDs across three (brand, size-range, quantity-range) arms. The
    * join key is shared by every arm, so Catalyst pushes the common
    * p_partkey equality into one broadcast join and evaluates the
    * disjunction as a single codegen'd filter — the classic test that an
    * optimizer doesn't fall back to a cross product on OR. */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val arm1 = col("p_brand") === "Brand#12" &&
      col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
    val arm2 = col("p_brand") === "Brand#15" &&
      col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
    val arm3 = col("p_brand") === "Brand#18" &&
      col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(arm1 || arm2 || arm3)
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount"))))
        .cast(S).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting): suppliers who were
    * the SOLE slow supplier (ship lag >180 days) on a multi-supplier order.
    * The classic form is lineitem × lineitem EXISTS + NOT EXISTS self-joins
    * — two extra shuffles of the biggest table. Here both quantifiers
    * collapse into ONE aggregate per order (count distinct suppliers, count
    * distinct slow suppliers, min slow supplier): EXISTS ⇔ n_supp > 1,
    * NOT-EXISTS-other-slow ⇔ n_late = 1, and the surviving order attributes
    * to its unique slow supplier. The oracle keeps the textbook
    * EXISTS/NOT EXISTS formulation over distinct (order, supplier) pairs —
    * the hash match proves the rewrite. */
  def q21Waiting(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
          .as("slow"))
    // Two-level aggregate instead of two COUNT(DISTINCT)s: the multi-distinct
    // plan Expands every lineitem row 3x before its shuffle; pre-grouping to
    // (order, supplier) needs no Expand, and the explicit repartition on
    // l_orderkey alone satisfies BOTH aggregates' distributions, so the whole
    // thing is ONE un-inflated shuffle (HashPartitioning(l_orderkey) clusters
    // (l_orderkey, l_suppkey) too).
    li.repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("slow")).as("slow"))
      .groupBy(col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_supp"),
        count(when(col("slow"), 1)).as("n_late"),
        min(when(col("slow"), col("l_suppkey"))).as("late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(Tables.supplier(s, d), col("late_supp") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(20)
  }

  /** TPC-H Q22 shape (global sales opportunity): customers in a code set
    * (c_nationkey mod 10 stands in for the missing phone country code) with
    * above-average positive balances and no RECENT orders — a 1-row
    * global-average broadcast, then an ANTI join against the date-restricted
    * orders slice, then per-code totals. "Idle" is defined as no orders on
    * or after 2000-07-01 (the fixture's orders run 1995-01..2001-08, so a
    * bare "no orders ever" anti-join is empty at every SF — the date window
    * keeps the Q22 anti-join shape while actually binding). The date filter
    * is pushed into the parquet scan, and the anti-join probe side shrinks
    * to the recent slice — strictly cheaper than classic Q22 at 100 TB. */
  def q22IdleBalance(s: SparkSession, d: String): DataFrame = {
    val codes = Seq(1, 3, 5, 7)
    val code = pmod(col("c_nationkey"), lit(10))
    val cust = Tables.customer(s, d).filter(code.isin(codes: _*))
    val bar = cust.filter(col("c_acctbal") > 0)
      .agg(avgD(col("c_acctbal")).as("ab"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-07-01").cast(TimestampType))
    cust.join(broadcast(bar))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(code.as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sumS(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q2 shape (min-cost supplier): the fixture has no partsupp table,
    * so the part↔supplier cost relation is DERIVED from lineitem — per
    * (partkey, suppkey) the minimum observed unit price stands in for
    * ps_supplycost. The Q2 essence is kept: a correlated min-cost subquery
    * per part (decorrelated into a groupBy + equality join back on
    * (part, min_cost)), a region restriction on the supplier side, a
    * selective part filter, and top-100 by supplier balance. Unit price is
    * one IEEE double division (correctly rounded, bit-identical across
    * engines) and min() selects from identical sets, so no decimal
    * scaffolding is needed. At 100 TB: the derived ps relation is one
    * map-combinable groupBy of the fact table; everything after runs on the
    * ~|parts|×|suppliers-per-part| aggregate, with nation/part dims
    * broadcast. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val ps = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val rs = ps
      .join(Tables.supplier(s, d), col("sk") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 0)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("pk"), col("sk"), col("cost"), col("s_name"),
        col("s_acctbal"))
    val mn = rs.groupBy(col("pk").as("mpk")).agg(min(col("cost")).as("mc"))
    val pf = Tables.part(s, d)
      .filter(col("p_type") === "STANDARD" && col("p_size") < 10)
    rs.join(mn, col("pk") === col("mpk") && col("cost") === col("mc"))
      .join(broadcast(pf), col("pk") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("sk").as("s_suppkey"),
        col("s_name"), col("s_acctbal"), col("cost").as("min_cost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(100)
  }

  /** TPC-H Q9 shape (product-type profit by nation and year): multi-fact
    * join lineitem⋈part⋈supplier⋈nation⋈orders with a LIKE part filter,
    * profit = revenue − cost aggregated per (nation, order-year). With no
    * partsupp in the fixture, supply cost is modeled as 10% of
    * p_retailprice per unit — the arithmetic shape (two decimal products
    * subtracted inside one sum) is exactly classic Q9's. Part/supplier/
    * nation are broadcast; the only shuffles are the lineitem⋈orders join
    * and the final small groupBy. */
  def q9ProfitByNation(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    val rev = dec4(col("l_extendedprice")) * (one - dec4(col("l_discount")))
    val cost = dec4(col("p_retailprice")) * dec4(col("l_quantity")) *
      lit(0.1).cast(M4)
    val pf = Tables.part(s, d).filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.lineitem(s, d)
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(rev - cost).cast(S).cast(DoubleType).as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock): per-part inventory value over
    * suppliers in one region, HAVING over a GLOBAL scalar subquery. The
    * classic fraction (0.0001/SF) is scale-dependent; here the threshold is
    * scale-invariant — parts whose value exceeds 2× the mean part value —
    * which keeps the decorrelation pattern (1-row global aggregate broadcast
    * back against every group) while binding at every SF. The threshold
    * compare runs in double (both sides cast from exact decimal sums, one
    * correctly-rounded multiply each — bit-identical cross-engine). */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val sf = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 1)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(s, d)
      .join(broadcast(sf), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(dec4(col("l_extendedprice")) * dec4(col("l_quantity")))
        .as("val"))
    val tot = v.agg(sum(col("val")).as("t"), count(lit(1)).as("n"))
    v.join(broadcast(tot))
      .filter(col("val").cast(DoubleType) * col("n") >
        lit(2) * col("t").cast(DoubleType))
      .select(col("pk").as("p_partkey"),
        col("val").cast(S).cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q16 shape (supplier relationship): distinct suppliers per part
    * (brand, type, size) bucket, excluding a brand/type, restricted to a
    * size set, minus suppliers on an exclusion list via NOT IN (here:
    * negative account balance stands in for the missing s_comment
    * complaints filter). The part↔supplier relation is the distinct
    * (l_partkey, l_suppkey) projection of lineitem. NOT IN over a non-null
    * key is a left-anti join — broadcast, since the exclusion list is tiny
    * by construction. */
  def q16SupplierCounts(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val pf = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    pairs
      .join(broadcast(excl), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (potential part promotion): the nested semi-join chain
    * — suppliers IN (pairs over parts IN (LIKE-filtered parts) whose 1997
    * shipped quantity exceeds a correlated per-part scalar) AND nation IN a
    * region. With no partsupp, "availqty > ½·shipped" becomes "this
    * supplier shipped >30% of the part's total 1997 volume" — the same
    * correlated-scalar-inside-IN decorrelation (per-part total joined back).
    * The quantity compare is exact: integer-scaled decimals on both sides
    * (q·10 > tq·3), no float thresholds. Semi joins all the way down — no
    * row multiplication anywhere. */
  def q20PromoSuppliers(s: SparkSession, d: String): DataFrame = {
    val qty = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(sum(dec(col("l_quantity"))).as("q"))
    val tot = qty.groupBy(col("pk").as("tpk")).agg(sum(col("q")).as("tq"))
    val pf = Tables.part(s, d).filter(col("p_name").like("%red%"))
      .select(col("p_partkey"))
    val hot = qty
      .join(broadcast(pf), col("pk") === col("p_partkey"), "left_semi")
      .join(tot, col("pk") === col("tpk"))
      .filter(col("q") * 10 > col("tq") * 3)
      .select(col("sk")).distinct()
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_regionkey") === 2)
        .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(hot, col("s_suppkey") === col("sk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** B15 extension — equi-width histogram of l_extendedprice in 20 global
    * buckets: the profiling/distribution shape every OLAP engine ships. Two
    * passes: a one-row global min/max (broadcast back), then ONE map-side-
    * combinable groupBy on the bucket id — no sort, no window, scales as a
    * pure count. Bucket arithmetic is plain IEEE ops (sub, mul, div, floor),
    * each individually correctly-rounded and therefore bit-identical across
    * engines; the max value clamps into the last bucket; exact decimal
    * value sums. */
  def aggHistogram(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
    val mm = li.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    li.join(broadcast(mm))
      .withColumn("bucket", least(
        floor((col("v") - col("mn")) * lit(20.0) / (col("mx") - col("mn"))),
        lit(19.0)).cast(IntegerType))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"), sumS(col("v")).as("v_sum"))
      .orderBy(col("bucket"))
  }

  /** B4/B7: projection with expressions, aliases, casts. */
  def projectExpr(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc_price"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("label"),
        floor(col("l_quantity")).cast(IntegerType).as("qty_int"),
        // judged as TIMESTAMP: a DATE column loads as pandas `object` cells
        // on the Spark side vs datetime64 from DuckDB — dtype mismatch
        dayNtz(col("l_shipdate")).as("ship_date"))
      // (l_orderkey, l_linenumber) is NOT unique in this data — order by the
      // full output row so duplicate keys cannot reorder across engines.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("disc_price"),
        col("label"), col("qty_int"), col("ship_date"))

  /** B5: comparison/BETWEEN/IN/LIKE/IS NULL/AND/OR/NOT predicates. */
  def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "P"))
      .filter(col("o_totalprice").between(50000d, 150000d))
      .filter(col("o_orderpriority").like("%URGENT%") || col("o_orderpriority").like("2-%"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType))
      .filter(nullif(col("o_orderstatus"), lit("X")).isNotNull)
      .filter(!(col("o_custkey") % 10 === 3))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))

  /** B6: CASE WHEN / coalesce / nullif. */
  def caseWhen(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        when(col("o_totalprice") >= 200000, lit("big"))
          .when(col("o_totalprice") >= 100000, lit("mid"))
          .otherwise(lit("small")).as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_f"),
        col("o_totalprice"))
      .groupBy(col("bucket"), col("status_f"))
      .agg(count(lit(1)).as("cnt"), sumS(col("o_totalprice")).as("total"))
      .orderBy(col("bucket"), col("status_f"))

  /** B8: inner equi-join (Catalyst picks hash/sort-merge; AQE may re-plan). */
  def joinInner(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
      .filter(col("o_totalprice") > 100000d)
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** B9: explicit broadcast of small dims — at 100 TB the fact side never shuffles. */
  def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), sumS(col("c_acctbal")).as("acctbal_sum"))
      .orderBy(col("r_name"), col("n_name"))

  /** B10: left outer join with null-aware aggregates. */
  def joinOuter(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        sumS(col("o_totalprice")).as("total_spent"))
      .orderBy(col("c_custkey"))

  /** B10 (full half): full outer join where BOTH sides have unmatched rows —
    * high-balance customers with no big order, and big orders from customers
    * below the balance bar. The join key survives via coalesce, so the output
    * key column is never null and totally orders the result. */
  def joinOuterFull(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_acctbal") > 9000d)
      .select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), sumS(col("o_totalprice")).as("big_total"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_name"), col("n_big"), col("big_total"))
      .orderBy(col("custkey"))
  }

  /** B20 (general form): explicit GROUPING SETS — finer than rollup/cube:
    * (region, nation) detail, region subtotal, and an orthogonal mktsegment
    * slice in one pass (one Expand node; one shuffle at cluster scale). */
  def aggGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(
        Seq(Seq(col("r_name"), col("n_name")), Seq(col("r_name")), Seq(col("c_mktsegment"))),
        col("r_name"), col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), sumS(col("c_acctbal")).as("acct_sum"),
        grouping_id().cast(IntegerType).as("gid"))
      .orderBy(col("r_name"), col("n_name"), col("c_mktsegment"), col("gid"))

  /** B11: left semi + left anti (EXISTS / NOT EXISTS). */
  def joinSemiAnti(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    val semi = cust.join(f, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(lit("has_f").as("kind"), col("c_custkey"))
    val anti = cust.join(f, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(lit("no_f").as("kind"), col("c_custkey"))
    semi.union(anti).orderBy(col("kind"), col("c_custkey"))
  }

  /** B12: theta (non-equi) join — broadcast nested loop on a small dim. */
  def joinTheta(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(col("n_name").as("a_nation"), col("n_regionkey").as("a_region"))
    val n2 = Tables.nation(s, d).select(col("n_name").as("b_nation"), col("n_regionkey").as("b_region"))
    n1.join(broadcast(n2), col("a_region") < col("b_region"))
      .orderBy(col("a_nation"), col("b_nation"))
  }

  /** B14: multi-way star join region→nation→customer→orders→lineitem. */
  def joinStar(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(M4)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(dec4(col("l_extendedprice")) * (one - dec4(col("l_discount")))).cast(S).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("o_year"))
  }

  /** B8-at-scale: skew-salted equi-join — the hot-key mitigation for a fact
    * table whose join-key distribution is Zipfian (the case AQE's skew
    * splitting handles reactively; salting is the proactive form that also
    * works mid-pipeline where AQE cannot re-plan). The dimension side
    * replicates each row across SALT buckets; the fact side derives its
    * bucket deterministically from l_linenumber, so a hot orderkey's rows
    * spread over SALT reducers instead of one. The aggregate is
    * salt-invariant, so the oracle is the PLAIN join — correctness-gating
    * the rewrite itself. */
  def joinSalted(s: SparkSession, d: String): DataFrame = {
    val SALT = 8
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"),
        pmod(col("l_linenumber"), lit(SALT)).as("salt"))
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("salt", explode(array((0 until SALT).map(lit(_)): _*)))
    li.join(ord,
        col("l_orderkey") === col("o_orderkey") && li("salt") === ord("salt"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sumS(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** B15/B16/B19: hash group-by with min/max/sum/avg/count + HAVING. */
  def aggGroupBy(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sumS(col("o_totalprice")).as("sum_price"),
        avgD(col("o_totalprice")).as("avg_price"))
      .filter(col("cnt") > 10)
      .orderBy(col("o_orderpriority"))

  /** B17: COUNT(DISTINCT …) (multiple distincts → Expand-based plan). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_part"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** B18: HLL approximate distinct — declared in queries, no DuckDB oracle
    * (approx result is engine-specific by design; exactness checked in unit
    * tests against exact counts with rsd tolerance). */
  def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx_part"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy(col("l_returnflag"))

  /** B18, oracle-checked twin: a DETERMINISTIC HyperLogLog sketch beside the
    * engine-native approx_count_distinct (which stays sanctioned-no-oracle:
    * its sketch is engine-specific). Flajolet et al.'s public algorithm with
    * every engine-divergence source removed:
    *  - register = first md5 byte (m = 256), rank = leading zero BITS of the
    *    next 52 bits + 1, derived purely from hex-string ops (ltrim + a
    *    nibble CASE) so both engines compute it character-identically;
    *  - the harmonic denominator Σ 2^(−M_j) is kept EXACT by scaling to
    *    integers: Σ 2^(40 − min(M_j, 40)) plus 2^40 per empty register fits
    *    in a BIGINT (≤ 2^48) — no order-dependent float summation;
    *  - the estimate α_m·m²·2^40 / S is one double expression written
    *    token-identically in both dialects (explicit double literals — an
    *    unsuffixed 0.7213 parses as DECIMAL in both engines);
    *  - no small/large-range correction (it needs ln, whose last-ulp
    *    behavior differs across libm builds) — omitted on BOTH sides, and
    *    the exact distinct count is judged alongside so the error is
    *    visible in the artifact.
    * Scale shape: one hash-aggregate to (flag, 256 registers), then
    * constant-size arithmetic — the same two-level combine a production
    * HLL does. */
  def aggHllDistinct(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("l_partkey").cast(StringType))
    val stripped = ltrim(substring(h, 3, 13), "0")
    val firstC = substring(stripped, 1, 1)
    val extra = when(firstC === "1", 3).when(firstC.isin("2", "3"), 2)
      .when(firstC.isin("4", "5", "6", "7"), 1).otherwise(0)
    val rank = when(length(stripped) === 0, lit(53))
      .otherwise((lit(13) - length(stripped)) * 4 + extra + 1)
    val regs = Tables.lineitem(s, d)
      .select(col("l_returnflag"), substring(h, 1, 2).as("reg"), rank.as("rank"))
      .groupBy(col("l_returnflag"), col("reg"))
      .agg(max(col("rank")).as("m"))
    val agg = regs.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("regs_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - least(m, 40) AS INT))"))
          .as("s_hit"))
      .withColumn("s_scaled",
        col("s_hit") + (lit(256L) - col("regs_hit")) * lit(1099511627776L))
      .withColumn("hll_est", expr(
        "0.7213D / (1.0D + 1.079D / 256.0D) * 65536.0D * 1099511627776.0D / CAST(s_scaled AS DOUBLE)"))
    val exact = Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_part"))
    agg.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("regs_hit"), col("s_scaled"),
        col("hll_est"), col("exact_part"))
      .orderBy(col("l_returnflag"))
  }

  /** B20: ROLLUP with grouping_id. */
  def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("cnt"), sumS(col("c_acctbal")).as("acct_sum"),
        grouping_id().cast(IntegerType).as("gid"))
      .orderBy(col("r_name"), col("n_name"))

  /** B24/B25: global multi-column sort + LIMIT → TakeOrderedAndProject. */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** B26: UNION ALL across heterogeneous sources. */
  def setUnion(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000d)
      .select(lit("cust").as("kind"), col("c_custkey").as("k"))
    val p = Tables.supplier(s, d).filter(col("s_acctbal") > 100d)
      .select(lit("supp").as("kind"), col("s_suppkey").as("k"))
    c.union(p).orderBy(col("kind"), col("k"))
  }

  /** B27/B28/B29: INTERSECT + EXCEPT (distinct set semantics). */
  def setIntersectExcept(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.part(s, d).filter(col("p_size") > 40).select(col("p_partkey").as("k"))
    val used = Tables.lineitem(s, d).select(col("l_partkey").as("k"))
    val both = parts.intersect(used).select(lit("both").as("kind"), col("k"))
    val only = parts.except(used).select(lit("part_only").as("kind"), col("k"))
    both.union(only).orderBy(col("kind"), col("k"))
  }

  /** B30: uncorrelated scalar subquery (broadcast the 1-row aggregate). */
  def subqueryScalar(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val mx = o.agg(max(col("o_totalprice")).as("max_price"))
    o.join(broadcast(mx))
      .filter(col("o_totalprice") > lit(0.9) * col("max_price"))
      .select(col("o_orderkey"), col("o_totalprice"),
        (col("o_totalprice") / col("max_price")).as("frac_of_max"))
      .orderBy(col("o_orderkey"))
  }

  /** B20: CUBE over two dims with grouping id. */
  def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), grouping_id().cast(IntegerType).as("gid"))
      .orderBy(col("r_name"), col("c_mktsegment"), col("gid"))

  /** Typed Dataset[T] surface: case-class encoder, typed filter, groupByKey +
    * mapGroups with an exact BigDecimal accumulator — same answer as the SQL
    * form (oracle), demonstrating the Dataset API end of the contract. */
  def typedPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .as[(Long, String, Double)]
    ds.filter(_._3 > 100000.0)
      .groupByKey(_._2)
      .mapGroups { (status, rows) =>
        var n = 0L
        var sum = java.math.BigDecimal.ZERO
        rows.foreach { r =>
          n += 1
          sum = sum.add(new java.math.BigDecimal(java.lang.Double.toString(r._3)))
        }
        (status, n, sum)
      }
      .toDF("o_orderstatus", "cnt", "total")
      .select(col("o_orderstatus"), col("cnt"), col("total").cast(S).cast(DoubleType).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** SQL-string entry point — the reference's primary surface (HBaseSQLContext
    * .sql / bin CLI [ref*: …/hbase/HBaseSQLParser.scala, public knowledge per
    * SURVEY.md §0]): temp views + spark.sql, same Catalyst pipeline. */
  def sqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  /** B30/B31 extension: correlated LATERAL subquery — per-customer top-2
    * orders via a dependent join (Catalyst decorrelates the LIMIT subquery
    * into a ranked window join under the hood). */
  def lateralTopn(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer_v c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 300
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin)
  }

  /** A8 extension: SQL SCRIPTING (Spark 4 `BEGIN … END` procedural blocks —
    * the standard SQL/PSM control-flow surface a SQL-first deployment drives
    * batch maintenance with). The block declares session variables, loops
    * over the five order-priority classes accumulating a count and the key
    * checksum of the heaviest class seen, and returns one result row; the
    * oracle recomputes both values relationally, so the variable/loop
    * semantics are hash-gated. Scale shape: each loop pass is one pushed
    * aggregate over the priority partition; nothing is collected beyond the
    * scalar variables the script itself defines. */
  def sqlScripting(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.scripting.enabled", "true")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    s.sql(
      """BEGIN
        |  DECLARE total BIGINT DEFAULT 0;
        |  DECLARE key_sum BIGINT DEFAULT 0;
        |  DECLARE pri INT DEFAULT 1;
        |  WHILE pri <= 5 DO
        |    SET total = total + (SELECT count(*) FROM orders_v
        |                         WHERE o_orderpriority LIKE pri || '-%');
        |    IF pri = 3 THEN
        |      SET key_sum = (SELECT sum(o_orderkey) FROM orders_v
        |                     WHERE o_orderpriority LIKE '3-%');
        |    END IF;
        |    SET pri = pri + 1;
        |  END WHILE;
        |  SELECT total AS priority_orders, key_sum AS medium_key_sum;
        |END""".stripMargin)
  }

  /** B30 extension: RECURSIVE CTE (Spark 4 `UnionLoop` — the iterative
    * fixpoint operator SQL:1999 standardized and DuckDB shares). The
    * hierarchy is implicit: parent(k) = floor(k/2) makes part keys a binary
    * tree, and every large part climbs to the root, so the query is a
    * transitive-closure walk whose depth histogram both engines must agree
    * on exactly. Scale shape: each iteration is one equality-free projection
    * over the frontier (no join against the base table after the anchor), so
    * the loop does O(log keyspace) tiny passes — the recursion depth is
    * bounded by the key width, not the row count. All arithmetic is integer
    * (floor(x/2.0) is exact for keys < 2^52). */
  def sqlRecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("part_v")
    s.sql(
      """WITH RECURSIVE anc(start_key, node, depth) AS (
        |  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0
        |  FROM part_v WHERE p_size >= 48
        |  UNION ALL
        |  SELECT start_key, CAST(floor(node / 2.0) AS BIGINT), depth + 1
        |  FROM anc WHERE node > 1)
        |SELECT depth, count(*) AS cnt, min(start_key) AS min_key,
        |       max(start_key) AS max_key
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** B30-rec extension: RECURSIVE CTE whose recursive step JOINS the
    * frontier against an EXPLICIT edge relation — the common real shape
    * (org charts, category trees, crawl graphs) that exercises UnionLoop's
    * join path, where sql_recursive_cte's step was projection-only. The
    * edge table is derived from part: child p_partkey → parent
    * floor(p_partkey/2) (the same implicit binary tree, now materialized
    * as rows); the walk ascends via `anc ⋈ edges ON child = node` until
    * the frontier leaves the key domain (parent 0 has no edge row).
    * Scale shape: each iteration is ONE equality join keyed on the edge's
    * child column — the frontier stays ≤ |anchor| because child is unique,
    * and depth is bounded by the key width. */
  def sqlRecursiveJoin(s: SparkSession, d: String): DataFrame = {
    Tables.part(s, d).createOrReplaceTempView("part_v")
    s.sql(
      """WITH RECURSIVE anc(start_key, node, depth) AS (
        |  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0
        |  FROM part_v WHERE p_size >= 48
        |  UNION ALL
        |  SELECT a.start_key, e.parent, a.depth + 1
        |  FROM anc a JOIN (
        |    SELECT CAST(p_partkey AS BIGINT) AS child,
        |           CAST(floor(p_partkey / 2.0) AS BIGINT) AS parent
        |    FROM part_v WHERE p_partkey > 1) e
        |  ON e.child = a.node)
        |SELECT depth, count(*) AS cnt, min(start_key) AS min_key,
        |       CAST(sum(node) AS BIGINT) AS node_sum
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
  }

  /** B15 extension: array aggregation — sorted collect_list is deterministic
    * (plain collect_list order is engine/partition-dependent; never judged).
    * The judged column is stringified: an ARRAY output column crashes the
    * driver's pandas canonicalization (unhashable ndarray cells). */
  def aggCollect(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 200)
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",",
          transform(sort_array(collect_list(col("l_linenumber"))),
            x => x.cast(StringType))).as("lines"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_orderkey"))

  /** B15 extension: exact median. Only the 0.5 quantile is judged: halving is
    * a power-of-two scale so both engines' interpolation forms agree bitwise;
    * other fractions interpolate with formula-dependent rounding. */
  def aggPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5D)").as("median_qty"),
        expr("percentile(l_extendedprice, 0.5D)").as("median_price"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  /** B15 extension: multi-quantile (0.25/0.5/0.75) by EXACT RANK SELECTION —
    * no interpolation: for quantile k/4 over n sorted values, report the
    * values at ranks floor((n−1)k/4)+1 and ceil((n−1)k/4)+1 (q_lo/q_hi; the
    * median of an even group is the pair, not their engine-rounded mean).
    * All rank arithmetic is integer, so the quantile judged here is free of
    * the interpolation-formula divergence that limits agg_percentile to 0.5.
    * Scale shape: value-at-rank comes from a cumulative count over the
    * (flag, quantity) HISTOGRAM (bounded distinct values), not a sort of
    * the table — one map-side-combined aggregate, then histogram-sized ops,
    * the same de-skew trick as window_distribution. The oracle computes the
    * same ranks from the DEFINITION (row_number over the full partition),
    * so the hash match proves the histogram rewrite. For unbounded-
    * cardinality columns (prices) the histogram is the table itself — there
    * you keep the engine percentile (agg_percentile) or distributed
    * selection. */
  def aggPercentileMulti(s: SparkSession, d: String): DataFrame = {
    val hist = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("c")).over(wCum))
    val bounds = hist.groupBy(col("l_returnflag")).agg(sum(col("c")).as("n"))
      .select(col("l_returnflag").as("f"), col("n"),
        explode(sequence(lit(1), lit(3))).as("k"))
      .withColumn("r_lo", expr("(n - 1) * k div 4") + 1)
      .withColumn("r_hi", expr("((n - 1) * k + 3) div 4") + 1)
    bounds.join(cum, col("f") === col("l_returnflag"))
      .groupBy(col("f"), col("k"), col("n"))
      .agg(min(when(col("cum") >= col("r_lo"), col("l_quantity"))).as("q_lo"),
        min(when(col("cum") >= col("r_hi"), col("l_quantity"))).as("q_hi"))
      .select(col("f").as("l_returnflag"), col("k").cast(IntegerType).as("k"),
        col("n").as("cnt"), col("q_lo"), col("q_hi"))
      .orderBy(col("l_returnflag"), col("k"))
  }

  /** B15/B33 extension: statistical moments — mean/variance/stddev per group
    * computed from EXACT decimal power sums (Σx, Σx²) cast to double at the
    * end. Spark's native var_samp/stddev merge float partials in partition
    * order (non-deterministic bits across runs/engines); power sums in
    * DECIMAL are order-independent and exact — x ≤ 6 dp so x² at scale 12
    * stays exact and far below the 38-digit cap at judged scale — and the
    * final double arithmetic mirrors the oracle token-for-token. */
  def aggStats(s: SparkSession, d: String): DataFrame = {
    val x = dec(col("o_totalprice"))
    val nD = col("n").cast(DoubleType)
    val varExpr = (col("sxx") - col("sx") * col("sx") / nD) / (nD - lit(1.0))
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(x * x).cast(DoubleType).as("sxx"))
      .select(col("o_orderstatus"), col("n"),
        (col("sx") / nD).as("mean"),
        varExpr.as("var_samp"),
        sqrt(greatest(varExpr, lit(0.0))).as("stddev"))
      .orderBy(col("o_orderstatus"))
  }

  /** B15 extension #2: CORRELATION / COVARIANCE — the two-variable moment
    * aggregates (covar_pop/covar_samp/corr) via the same exact-power-sum
    * technique agg_stats uses for variance: every sum accumulates in exact
    * decimal, casts to double once, and the final expressions are pure IEEE
    * arithmetic written token-identically in the oracle (sqrt is correctly
    * rounded per IEEE-754, unlike ln/exp which stay banned). sum(x²) is
    * rescaled to scale 4 before the double cast — quantity² is integral so
    * the rescale is exact, and it keeps the unscaled value under 2^53 where
    * decimal→double is correctly rounded in BOTH engines (at scale 8 it
    * would not be). Native corr()/covar_samp() would be one call but
    * accumulate in engine-specific float order — unjudgeable. */
  def aggCorr(s: SparkSession, d: String): DataFrame = {
    val x = dec4(col("l_quantity"))
    val y = dec4(col("l_discount"))
    val nD = col("n").cast(DoubleType)
    val cxy = col("sxy") - col("sx") * col("sy") / nD
    val cxx = col("sxx") - col("sx") * col("sx") / nD
    val cyy = col("syy") - col("sy") * col("sy") / nD
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * y).cast(DoubleType).as("sxy"),
        sum(x * x).cast(DecimalType(38, 4)).cast(DoubleType).as("sxx"),
        sum(y * y).cast(DoubleType).as("syy"))
      .select(col("l_returnflag"), col("n"),
        (cxy / nD).as("covar_pop"),
        (cxy / (nD - lit(1.0).cast(DoubleType))).as("covar_samp"),
        (cxy / sqrt(cxx * cyy)).as("corr"))
      .orderBy(col("l_returnflag"))
  }

  /** B15 extension #3: LINEAR-REGRESSION aggregates (REGR_SLOPE /
    * REGR_INTERCEPT of extendedprice over quantity per return flag) — the
    * third member of the moment-aggregate family, same exact-power-sum
    * recipe. The cross-product sum q·price is a 2-dp value accumulated at
    * scale 8; rescaling to scale 2 before the double cast is exact and
    * keeps the unscaled value under 2^53 even at 10× the judged scale. */
  def aggRegression(s: SparkSession, d: String): DataFrame = {
    val x = dec4(col("l_quantity"))
    val y = dec4(col("l_extendedprice"))
    val nD = col("n").cast(DoubleType)
    val slope = (col("sxy") - col("sx") * col("sy") / nD) /
      (col("sxx") - col("sx") * col("sx") / nD)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).cast(DoubleType).as("sx"),
        sum(y).cast(DoubleType).as("sy"),
        sum(x * y).cast(DecimalType(38, 2)).cast(DoubleType).as("sxy"),
        sum(x * x).cast(DecimalType(38, 4)).cast(DoubleType).as("sxx"))
      .select(col("l_returnflag"), col("n"),
        slope.as("slope"),
        (col("sy") / nD - slope * (col("sx") / nD)).as("intercept"))
      .orderBy(col("l_returnflag"))
  }

  /** B15 extension: MODE — most frequent value per group with a
    * deterministic tie-break (count desc, then value asc), expressed as
    * count + ranked window so both engines agree exactly (a native mode()
    * would tie-break engine-specifically). */
  def aggMode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("cnt"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_mode" -> (aggMode _),
    "agg_stats" -> (aggStats _),
    "q1_pricing" -> (q1Pricing _),
    "q3_shipping" -> (q3Shipping _),
    "q5_supplier_volume" -> (q5SupplierVolume _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q6_forecast" -> (q6Forecast _),
    "q7_nation_volume" -> (q7NationVolume _),
    "q8_market_share" -> (q8MarketShare _),
    "q10_returned" -> (q10Returned _),
    "q12_late_priority" -> (q12LatePriority _),
    "q13_order_counts" -> (q13OrderCounts _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_qty" -> (q17SmallQty _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q21_waiting" -> (q21Waiting _),
    "q22_idle_balance" -> (q22IdleBalance _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q9_profit_by_nation" -> (q9ProfitByNation _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q16_supplier_counts" -> (q16SupplierCounts _),
    "q20_promo_suppliers" -> (q20PromoSuppliers _),
    "agg_cube" -> (aggCube _),
    "agg_collect" -> (aggCollect _),
    "agg_percentile" -> (aggPercentile _),
    "agg_percentile_multi" -> (aggPercentileMulti _),
    "agg_hll_distinct" -> (aggHllDistinct _),
    "agg_corr" -> (aggCorr _),
    "agg_regression" -> (aggRegression _),
    "sql_surface" -> (sqlSurface _),
    "typed_pipeline" -> (typedPipeline _),
    "project_expr" -> (projectExpr _),
    "filter_pred" -> (filterPred _),
    "case_when" -> (caseWhen _),
    "join_inner" -> (joinInner _),
    "join_broadcast" -> (joinBroadcast _),
    "join_outer" -> (joinOuter _),
    "join_outer_full" -> (joinOuterFull _),
    "agg_groupingsets" -> (aggGroupingSets _),
    "join_semi_anti" -> (joinSemiAnti _),
    "join_theta" -> (joinTheta _),
    "join_star" -> (joinStar _),
    "join_salted" -> (joinSalted _),
    "agg_groupby" -> (aggGroupBy _),
    "agg_histogram" -> (aggHistogram _),
    "agg_distinct" -> (aggDistinct _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_rollup" -> (aggRollup _),
    "sort_limit" -> (sortLimit _),
    "set_union" -> (setUnion _),
    "set_intersect_except" -> (setIntersectExcept _),
    "subquery_scalar" -> (subqueryScalar _),
    "lateral_topn" -> (lateralTopn _),
    "sql_recursive_cte" -> (sqlRecursiveCte _),
    "sql_recursive_join" -> (sqlRecursiveJoin _),
    "sql_scripting" -> (sqlScripting _))

  val oracles: Map[String, String] = Map(
    "agg_stats" ->
      """WITH a AS (SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        |  -- one operand at precision 19 forces DuckDB onto the int128
        |  -- decimal kernel (18,6 is int64-backed and its square overflows);
        |  -- the exact product value is unchanged
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(19,6))
        |           * CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sxx
        |  FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  sx / CAST(n AS DOUBLE) AS mean,
        |  (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS var_samp,
        |  sqrt(greatest((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0),
        |                0.0)) AS stddev
        |FROM a ORDER BY o_orderstatus""".stripMargin,
    // exact decimal power sums -> one double cast each -> shared IEEE
    // expressions; sum(x^2) rescaled to scale 4 (exact: quantity is
    // integral) to keep the unscaled value under 2^53 for the double cast
    "agg_corr" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
        |           * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS sxy,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
        |                * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(l_discount AS DECIMAL(12,4))
        |           * CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS covar_pop,
        |  (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS covar_samp,
        |  (sxy - sx * sy / CAST(n AS DOUBLE))
        |    / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
        |           * (syy - sy * sy / CAST(n AS DOUBLE))) AS corr
        |FROM a ORDER BY l_returnflag""".stripMargin,
    // q*price is a 2-dp value: rescale its scale-8 sum to scale 2 (exact)
    // before the double cast, mirroring the Spark side token for token
    "agg_regression" ->
      """WITH a AS (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sy,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
        |                * CAST(l_extendedprice AS DECIMAL(12,4))) AS DECIMAL(38,2)) AS DOUBLE) AS sxy,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,4))
        |                * CAST(l_quantity AS DECIMAL(12,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)) AS slope,
        |  sy / CAST(n AS DOUBLE)
        |    - ((sxy - sx * sy / CAST(n AS DOUBLE)) / (sxx - sx * sx / CAST(n AS DOUBLE)))
        |      * (sx / CAST(n AS DOUBLE)) AS intercept
        |FROM a ORDER BY l_returnflag""".stripMargin,
    "agg_mode" ->
      """SELECT o_orderstatus, mode_priority, cnt FROM (
        |  SELECT o_orderstatus, o_orderpriority AS mode_priority, count(*) AS cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders GROUP BY o_orderstatus, o_orderpriority)
        |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "agg_collect" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines, count(*) AS cnt
        |FROM lineitem WHERE l_orderkey < 200
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "agg_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_extendedprice, 0.5) AS median_price,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_hll_distinct" ->
      """WITH r AS (
        |  SELECT l_returnflag, md5(CAST(l_partkey AS VARCHAR)) AS h FROM lineitem),
        |x AS (
        |  SELECT l_returnflag, substring(h, 1, 2) AS reg,
        |         ltrim(substring(h, 3, 13), '0') AS st FROM r),
        |k AS (
        |  SELECT l_returnflag, reg,
        |    CASE WHEN length(st) = 0 THEN 53
        |         ELSE (13 - length(st)) * 4 +
        |           (CASE WHEN st[1:1] = '1' THEN 3
        |                 WHEN st[1:1] IN ('2', '3') THEN 2
        |                 WHEN st[1:1] IN ('4', '5', '6', '7') THEN 1
        |                 ELSE 0 END) + 1 END AS rank
        |  FROM x),
        |regs AS (SELECT l_returnflag, reg, max(rank) AS m FROM k GROUP BY 1, 2),
        |agg AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS regs_hit,
        |    CAST(sum(CAST(1 AS BIGINT) << (40 - least(m, 40))) AS BIGINT) AS s_hit
        |  FROM regs GROUP BY 1),
        |e AS (SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_part
        |      FROM lineitem GROUP BY 1)
        |SELECT agg.l_returnflag, regs_hit,
        |  s_hit + (256 - regs_hit) * 1099511627776 AS s_scaled,
        |  CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256.0 AS DOUBLE))
        |    * CAST(65536.0 AS DOUBLE) * CAST(1099511627776.0 AS DOUBLE)
        |    / CAST(s_hit + (256 - regs_hit) * 1099511627776 AS DOUBLE) AS hll_est,
        |  exact_part
        |FROM agg JOIN e USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    // rank selection from the DEFINITION (row_number over the partition);
    // the Spark side derives the same ranks from the quantity histogram
    "agg_percentile_multi" ->
      """WITH r AS (SELECT l_returnflag, l_quantity,
        |             row_number() OVER (PARTITION BY l_returnflag
        |                                ORDER BY l_quantity) AS rn,
        |             count(*) OVER (PARTITION BY l_returnflag) AS n
        |           FROM lineitem),
        |ks AS (SELECT unnest([1, 2, 3]) AS k)
        |SELECT l_returnflag, CAST(k AS INTEGER) AS k, n AS cnt,
        |  min(CASE WHEN rn = (n - 1) * k // 4 + 1 THEN l_quantity END) AS q_lo,
        |  min(CASE WHEN rn = ((n - 1) * k + 3) // 4 + 1 THEN l_quantity END) AS q_hi
        |FROM r CROSS JOIN ks
        |GROUP BY l_returnflag, k, n
        |ORDER BY l_returnflag, k""".stripMargin,
    "agg_cube" ->
      """SELECT r_name, c_mktsegment, count(*) AS cnt,
        | CAST(GROUPING(r_name, c_mktsegment) AS INTEGER) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE (r_name, c_mktsegment)
        |ORDER BY r_name NULLS FIRST, c_mktsegment NULLS FIRST, gid""".stripMargin,
    "typed_pipeline" ->
      """SELECT o_orderstatus, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_totalprice > 100000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "sql_surface" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) * (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC NULLS LAST, o_orderdate, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_supplier_volume" ->
      """SELECT n_name,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC NULLS LAST, n_name""".stripMargin,
    "q14_promo_share" ->
      """SELECT
        | CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue,
        | count(*) AS n_items,
        | CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) END) AS DECIMAL(38,6)) AS DOUBLE) * 100.0
        |   / CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin,
    "q7_nation_volume" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
        |    l_extendedprice, l_discount
        |  FROM supplier
        |  JOIN lineitem ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE n1.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        |    AND n2.n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4')
        |    AND n1.n_name <> n2.n_name
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderdate, o_orderkey
        |LIMIT 20""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q6_forecast" ->
      """SELECT
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """SELECT o_year,
        | CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DECIMAL(38,6)) AS DOUBLE) AS nation_volume,
        | CAST(CAST(sum(vol) AS DECIMAL(38,6)) AS DOUBLE) AS total_volume,
        | CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DECIMAL(38,6)) AS DOUBLE)
        |   / CAST(CAST(sum(vol) AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |    n2.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) AS vol
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |  JOIN region ON n1.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "q10_returned" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC NULLS LAST, c_custkey
        |LIMIT 20""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q13_order_counts" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority <> '1-URGENT') o ON c_custkey = o_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin,
    "q15_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey),
        |m AS (SELECT max(total_revenue) AS mr FROM r)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM r JOIN m ON total_revenue = mr
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    "q17_small_qty" ->
      """WITH pf AS (SELECT p_partkey FROM part
        |            WHERE p_brand = 'Brand#11' AND p_size < 15),
        |li AS (SELECT l_partkey, l_quantity, l_extendedprice
        |       FROM lineitem JOIN pf ON l_partkey = p_partkey),
        |qb AS (SELECT l_partkey AS pk,
        |         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*)) AS qb
        |       FROM li GROUP BY l_partkey)
        |SELECT
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / 7.0 AS avg_yearly,
        | count(*) AS n_lines
        |FROM li JOIN qb ON l_partkey = pk
        |WHERE l_quantity < qb""".stripMargin,
    "q19_disjunctive" ->
      """SELECT
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        | count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#18' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_waiting" ->
      """WITH lo AS (
        |  SELECT l_orderkey, l_suppkey,
        |    l_shipdate > o_orderdate + INTERVAL 180 DAY AS slow
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |sp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE slow)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM sp JOIN supplier ON sp.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lo o2 WHERE o2.l_orderkey = sp.l_orderkey
        |              AND o2.l_suppkey <> sp.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lo o3 WHERE o3.l_orderkey = sp.l_orderkey
        |              AND o3.l_suppkey <> sp.l_suppkey AND o3.slow)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC NULLS LAST, s_suppkey
        |LIMIT 20""".stripMargin,
    "q22_idle_balance" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_acctbal, c_nationkey % 10 AS code
        |  FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7)),
        |bar AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS ab
        |  FROM cust WHERE c_acctbal > 0)
        |SELECT code AS cntrycode, count(*) AS numcust,
        | CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) AS totacctbal
        |FROM cust, bar
        |WHERE c_acctbal > ab
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
        |GROUP BY code
        |ORDER BY cntrycode""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH ps AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |rs AS (
        |  SELECT pk, sk, cost, s_name, s_acctbal
        |  FROM ps JOIN supplier ON sk = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 0),
        |mn AS (SELECT pk, min(cost) AS mc FROM rs GROUP BY pk)
        |SELECT p_partkey, p_name, sk AS s_suppkey, s_name, s_acctbal,
        |  cost AS min_cost
        |FROM rs JOIN mn ON rs.pk = mn.pk AND cost = mc
        |JOIN part ON rs.pk = p_partkey
        |WHERE p_type = 'STANDARD' AND p_size < 10
        |ORDER BY s_acctbal DESC NULLS LAST, p_partkey, s_suppkey
        |LIMIT 100""".stripMargin,
    "q9_profit_by_nation" ->
      """SELECT n_name AS nation,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
        |  CAST(CAST(sum(
        |    CAST(l_extendedprice AS DECIMAL(12,4))
        |      * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))
        |    - CAST(p_retailprice AS DECIMAL(12,4))
        |      * CAST(l_quantity AS DECIMAL(12,4)) * CAST(0.1 AS DECIMAL(12,4))
        |  ) AS DECIMAL(38,6)) AS DOUBLE) AS profit,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH v AS (
        |  SELECT l_partkey AS pk,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,4))
        |        * CAST(l_quantity AS DECIMAL(12,4))) AS val
        |  FROM lineitem
        |  WHERE l_suppkey IN (
        |    SELECT s_suppkey FROM supplier JOIN nation
        |    ON s_nationkey = n_nationkey WHERE n_regionkey = 1)
        |  GROUP BY 1),
        |tot AS (SELECT sum(val) AS t, count(*) AS n FROM v)
        |SELECT pk AS p_partkey, CAST(CAST(val AS DECIMAL(38,6)) AS DOUBLE) AS value
        |FROM v, tot
        |WHERE CAST(val AS DOUBLE) * n > 2 * CAST(t AS DOUBLE)
        |ORDER BY value DESC NULLS LAST, p_partkey""".stripMargin,
    "q16_supplier_counts" ->
      """WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM pairs JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC NULLS LAST, p_brand, p_type, p_size""".stripMargin,
    "q20_promo_suppliers" ->
      """WITH qty AS (
        |  SELECT l_partkey AS pk, l_suppkey AS sk,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS q
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY 1, 2),
        |tot AS (SELECT pk, sum(q) AS tq FROM qty GROUP BY pk)
        |SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT sk FROM qty JOIN tot ON qty.pk = tot.pk
        |  WHERE qty.pk IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
        |    AND q * 10 > tq * 3)
        |AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        |ORDER BY s_suppkey""".stripMargin,
    "project_expr" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) AS disc_price,
        | l_returnflag || '/' || l_linestatus AS label,
        | CAST(floor(l_quantity) AS INTEGER) AS qty_int,
        | CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ship_date
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, disc_price, label, qty_int, ship_date""".stripMargin,
    "filter_pred" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderstatus IN ('F','P')
        |  AND o_totalprice BETWEEN 50000 AND 150000
        |  AND (o_orderpriority LIKE '%URGENT%' OR o_orderpriority LIKE '2-%')
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND nullif(o_orderstatus, 'X') IS NOT NULL
        |  AND NOT (o_custkey % 10 = 3)
        |ORDER BY o_orderkey""".stripMargin,
    "case_when" ->
      """SELECT CASE WHEN o_totalprice >= 200000 THEN 'big'
        |            WHEN o_totalprice >= 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_f,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY bucket, status_f""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 100000
        |ORDER BY o_orderkey""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acctbal_sum
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "join_outer" ->
      """SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "join_outer_full" ->
      """SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
        | o.n_big, o.big_total
        |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000) c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_big,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS big_total
        |           FROM orders WHERE o_totalprice > 450000
        |           GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY custkey""".stripMargin,
    "agg_groupingsets" ->
      """SELECT r_name, n_name, c_mktsegment, count(*) AS cnt,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acct_sum,
        | CAST(GROUPING(r_name, n_name, c_mktsegment) AS INTEGER) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name, n_name), (r_name), (c_mktsegment))
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST,
        |  c_mktsegment NULLS FIRST, gid""".stripMargin,
    "join_semi_anti" ->
      """SELECT 'has_f' AS kind, c_custkey FROM customer
        | WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |UNION ALL
        |SELECT 'no_f' AS kind, c_custkey FROM customer
        | WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY kind, c_custkey""".stripMargin,
    "join_theta" ->
      """SELECT n1.n_name AS a_nation, n1.n_regionkey AS a_region,
        |       n2.n_name AS b_nation, n2.n_regionkey AS b_region
        |FROM nation n1 JOIN nation n2 ON n1.n_regionkey < n2.n_regionkey
        |ORDER BY a_nation, b_nation""".stripMargin,
    "join_star" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, o_year ORDER BY r_name, o_year""".stripMargin,
    // plain-join oracle: the salted rewrite must be result-invariant
    "join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx
        |           FROM lineitem)
        |SELECT CAST(least(floor((l_extendedprice - mn) * 20.0 / (mx - mn)), 19.0)
        |            AS INTEGER) AS bucket,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS v_sum
        |FROM lineitem CROSS JOIN mm
        |GROUP BY 1 ORDER BY bucket""".stripMargin,
    "agg_groupby" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        | min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
        |FROM orders GROUP BY o_orderpriority HAVING count(*) > 10
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_part,
        | count(DISTINCT l_suppkey) AS n_supp, count(DISTINCT l_orderkey) AS n_orders,
        | count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "agg_rollup" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        | CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS acct_sum,
        | CAST(GROUPING(r_name, n_name) AS INTEGER) AS gid
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC NULLS LAST, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "set_union" ->
      """SELECT 'cust' AS kind, c_custkey AS k FROM customer WHERE c_acctbal > 9000
        |UNION ALL
        |SELECT 'supp' AS kind, s_suppkey AS k FROM supplier WHERE s_acctbal > 100
        |ORDER BY kind, k""".stripMargin,
    "set_intersect_except" ->
      """SELECT 'both' AS kind, k FROM (
        |  SELECT p_partkey AS k FROM part WHERE p_size > 40
        |  INTERSECT SELECT l_partkey AS k FROM lineitem)
        |UNION ALL
        |SELECT 'part_only' AS kind, k FROM (
        |  SELECT p_partkey AS k FROM part WHERE p_size > 40
        |  EXCEPT SELECT l_partkey AS k FROM lineitem)
        |ORDER BY kind, k""".stripMargin,
    "lateral_topn" ->
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t ON true
        |WHERE c_custkey < 300
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "subquery_scalar" ->
      """SELECT o_orderkey, o_totalprice,
        | o_totalprice / (SELECT max(o_totalprice) FROM orders) AS frac_of_max
        |FROM orders
        |WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    // DuckDB's count(*) is BIGINT like Spark's; depth stays INT32 in both
    // (integer literal anchor + depth+1); all key math is exact integer.
    // scripting block result recomputed relationally (count over the five
    // priority classes = all orders; key checksum of the 3-MEDIUM class)
    "sql_scripting" ->
      """SELECT count(*) AS priority_orders,
        | (SELECT CAST(sum(o_orderkey) AS BIGINT) FROM orders
        |  WHERE o_orderpriority LIKE '3-%') AS medium_key_sum
        |FROM orders""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE anc(start_key, node, depth) AS (
        |  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0
        |  FROM part WHERE p_size >= 48
        |  UNION ALL
        |  SELECT start_key, CAST(floor(node / 2.0) AS BIGINT), depth + 1
        |  FROM anc WHERE node > 1)
        |SELECT depth, count(*) AS cnt, min(start_key) AS min_key,
        |       max(start_key) AS max_key
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin,
    "sql_recursive_join" ->
      """WITH RECURSIVE anc(start_key, node, depth) AS (
        |  SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0
        |  FROM part WHERE p_size >= 48
        |  UNION ALL
        |  SELECT a.start_key, e.parent, a.depth + 1
        |  FROM anc a JOIN (
        |    SELECT CAST(p_partkey AS BIGINT) AS child,
        |           CAST(floor(p_partkey / 2.0) AS BIGINT) AS parent
        |    FROM part WHERE p_partkey > 1) e
        |  ON e.child = a.node)
        |SELECT depth, count(*) AS cnt, min(start_key) AS min_key,
        |       CAST(sum(node) AS BIGINT) AS node_sum
        |FROM anc GROUP BY depth ORDER BY depth""".stripMargin)
}
