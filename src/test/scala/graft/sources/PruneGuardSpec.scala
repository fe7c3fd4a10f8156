package graft.sources

import org.apache.spark.sql.sources.{EqualTo, GreaterThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The pruners' conservative fallback on unparseable filter-value images:
  * canonValue falls through to String.valueOf for value shapes it does
  * not recognize, and on a numerically-ordered column the comparison
  * would throw NumberFormatException at PLANNING time. The contract is
  * the bloom path's: decline to prune (mayMatch=true / allMatch=false),
  * never fail the query. */
class PruneGuardSpec extends AnyFunSuite {
  private val schema = StructType(Seq(
    StructField("ts", TimestampNTZType), StructField("id", LongType)))

  test("stats mayMatch declines (true) on unparseable time value") {
    val stats = Map("ts" -> ("1709251200000000", "1709337600000000"))
    // a raw string is NOT a recognized Timestamp shape -> String.valueOf
    assert(GraftKvSink.mayMatch(schema, stats, EqualTo("ts", "not-a-time")))
    assert(GraftKvSink.mayMatch(schema, stats,
      GreaterThan("ts", new Object { override def toString = "garbage" })))
    // parseable values still prune as before
    assert(!GraftKvSink.mayMatch(schema, stats,
      EqualTo("ts", java.lang.Long.valueOf(1L))))
  }

  test("partition mayMatch declines (true), allMatch declines (false)") {
    val spec = Seq(GraftPartition.parseOne("days(ts)", schema))
    val parts = Map(spec.head.statsKey -> "19783")
    assert(GraftPartition.mayMatch(spec, parts,
      GreaterThan("ts", "not-a-time")))
    assert(!GraftPartition.allMatch(spec, parts,
      LessThanOrEqual("ts", "not-a-time")))
    // parseable micros still prove/prune: day 19783 covers
    // [1709251200000000, 1709337600000000)
    assert(GraftPartition.allMatch(spec, parts,
      LessThanOrEqual("ts", java.lang.Long.valueOf(1709337600000000L))))
    assert(!GraftPartition.mayMatch(spec, parts,
      GreaterThan("ts", java.lang.Long.valueOf(1709337600000000L))))
  }
}
