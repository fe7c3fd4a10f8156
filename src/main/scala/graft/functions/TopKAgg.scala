package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator (SURVEY.md §7.3 "100-TB option" for similarity
  * top-k): per-group state is at most k (id, score) pairs, so a billion-row
  * candidate set aggregates with partial combines instead of a full
  * partition sort + window rank. Ordering matches the window form exactly —
  * score descending, id ascending on ties — so the two implementations are
  * interchangeable and share one oracle.
  */
case class TopKBuf(items: Seq[(Long, Double)])

class TopKAgg(k: Int) extends Aggregator[(Long, Double), TopKBuf, Seq[(Long, Double)]] {

  /** Score comparison via java.lang.Double.compare — matches Spark SQL's
    * double ordering exactly (NaN greatest, -0.0 < 0.0), so results stay
    * identical to the row_number window twin even on NaN cosines. */
  private def beats(a: (Long, Double), floor: (Long, Double)): Boolean = {
    val c = java.lang.Double.compare(a._2, floor._2)
    c > 0 || (c == 0 && a._1 < floor._1)
  }

  private def trim(xs: Seq[(Long, Double)]): Seq[(Long, Double)] =
    xs.sortWith(beats).take(k)

  override def zero: TopKBuf = TopKBuf(Seq.empty)

  override def reduce(b: TopKBuf, a: (Long, Double)): TopKBuf =
    // keep the buffer bounded: only re-sort when it can still grow or the
    // candidate beats the current floor
    if (b.items.length < k || beats(a, b.items.last)) TopKBuf(trim(b.items :+ a))
    else b

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf(trim(b1.items ++ b2.items))

  override def finish(r: TopKBuf): Seq[(Long, Double)] = r.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
