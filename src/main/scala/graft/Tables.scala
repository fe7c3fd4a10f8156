package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Schema-checked readers for the driver-generated parquet tables
  * (see FIXTURES.md for the measured schemas; TESTDATA.md:13-15 for layout).
  *
  * Design note (100 TB posture): every reader is a plain parquet scan so
  * Catalyst's FileSourceScanExec gets predicate pushdown, column pruning and
  * row-group pruning for free — the Spark-native analogue of the reference's
  * rowkey pruning + server-side filter pushdown (SURVEY.md §2 A2/A3, [ref*:
  * org.apache.spark.sql.hbase CriticalPoint/ScanPredClassifier — mount empty,
  * public-knowledge citation per SURVEY.md §0]).
  */
object Tables {
  private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = rd(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = rd(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = rd(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = rd(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = rd(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = rd(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = rd(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless read
    * as a raw long (`spark.sql.legacy.parquet.nanosAsLong`, set by the
    * Verify/Bench session builders). Truncating ns→µs here matches DuckDB's
    * own nanos handling, so oracle timestamps agree exactly. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = rd(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case _        => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = rd(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = rd(s, d, "embeddings")
}
