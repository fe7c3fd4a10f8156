package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism helpers.
  *
  * The driver grades every query by an exact hash-match against DuckDB running
  * the paired `oracleSql` on the same parquet (BASELINE.md). That forbids any
  * value whose bits depend on engine-internal evaluation order. Rules used by
  * every judged query in this package:
  *
  *  - Money/quantity sums: aggregate in DECIMAL (exact, order-independent),
  *    cast to a pinned final type. Spark `sum(decimal(18,6))` and DuckDB both
  *    land on DECIMAL(38,6) after the final cast.
  *  - Averages/ratios: `cast(exact_decimal_or_int AS DOUBLE) / count` — the
  *    decimal→double cast is round-to-nearest in both engines and IEEE-754
  *    division is deterministic, so the result is bit-exact cross-engine.
  *  - No transcendental functions (ln/exp/pow) in judged outputs — Java Math
  *    and libm may differ in the last ulp.
  *  - Every judged query ends in a total-order `orderBy`; the DuckDB oracle
  *    mirrors Spark's null ordering explicitly (ASC → NULLS FIRST,
  *    DESC → NULLS LAST).
  */
package object ops {
  /** Standard exact-measure operand: plenty of range for sf0.1 money values. */
  val M: DecimalType = DecimalType(18, 6)
  /** Narrow operand for triple products (3×12 digits + carries fits DuckDB's
    * 38-digit cap: 12+13+13=38). */
  val M4: DecimalType = DecimalType(12, 4)
  /** Pinned final sum type, matches DuckDB sum widening. */
  val S: DecimalType = DecimalType(38, 6)

  def dec(c: Column): Column  = c.cast(M)
  def dec4(c: Column): Column = c.cast(M4)

  /** Exact decimal sum with pinned output type DECIMAL(38,6). */
  def sumS(c: Column): Column = sum(dec(c)).cast(S)

  /** Bit-exact cross-engine average: exact decimal sum → double → / count. */
  def avgD(c: Column): Column =
    sum(dec(c)).cast(DoubleType) / count(lit(1))

  /** Ratio of two exact (int/decimal) columns as bit-exact double. */
  def ratioD(num: Column, den: Column): Column =
    num.cast(DoubleType) / den.cast(DoubleType)
}
