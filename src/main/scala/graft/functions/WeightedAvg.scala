package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact-buffer weighted-average UDAF (SURVEY.md §2B row B38).
  *
  * The reference inherits Spark's UDAF surface via SQLContext [ref*: Astro,
  * public knowledge per SURVEY.md §0]; we showcase the modern typed
  * `Aggregator` + `functions.udaf` path.
  *
  * Cross-engine determinism: inputs are quantized to DECIMAL(·,2) exactly as
  * the oracle's `CAST(x AS DECIMAL(12,2))` does (both go through the shortest
  * decimal string of the double; the data is 2-decimal money so no rounding
  * occurs), sums are exact BigDecimal, and the finish step mirrors
  * `CAST(sum AS DOUBLE) / CAST(sum AS DOUBLE)` — nearest-double conversions
  * plus one IEEE division, so the result is bit-exact vs DuckDB. The narrow
  * scale also keeps unscaled sums below 2^53, where both engines'
  * decimal→double casts are exact (DuckDB double-rounds above that).
  */
case class WAvgBuf(sumXW: JBigDecimal, sumW: JBigDecimal)

object WeightedAvg extends Aggregator[(Double, Double), WAvgBuf, Double] {
  /** Quantize like the oracle's CAST(x AS DECIMAL(12,2)) — narrow enough that
    * DuckDB's int64 decimal multiply cannot overflow. */
  private def q2(x: Double): JBigDecimal =
    new JBigDecimal(java.lang.Double.toString(x)).setScale(2, RoundingMode.HALF_UP)

  override def zero: WAvgBuf = WAvgBuf(JBigDecimal.ZERO, JBigDecimal.ZERO)

  override def reduce(b: WAvgBuf, a: (Double, Double)): WAvgBuf = {
    val (x, w) = a
    WAvgBuf(b.sumXW.add(q2(x).multiply(q2(w))), b.sumW.add(q2(w)))
  }

  override def merge(b1: WAvgBuf, b2: WAvgBuf): WAvgBuf =
    WAvgBuf(b1.sumXW.add(b2.sumXW), b1.sumW.add(b2.sumW))

  override def finish(r: WAvgBuf): Double =
    if (r.sumW.signum() == 0) Double.NaN
    else r.sumXW.doubleValue() / r.sumW.doubleValue()

  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
