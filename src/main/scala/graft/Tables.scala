package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events(s: SparkSession, d: String): DataFrame     = rd(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = rd(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = rd(s, d, "embeddings")
}
