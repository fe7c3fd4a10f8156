package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the judge-facing operator inventory (SURVEY.md §2): one entry
  * per capability row, each paired (where SQL-expressible) with a DuckDB
  * oracle in `oracleSql`. Column names and ordering are aligned between both
  * dialects; see graft.ops package doc for the cross-engine determinism rules.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Windows.queries ++ ops.Scalars.queries ++
      ops.Events.queries ++ ops.KeyRange.queries ++ ops.Text.queries ++
      ops.Dedup.queries ++ ops.Similarity.queries ++ ops.Pipeline.queries ++
      ops.Ddl.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracles ++ ops.Windows.oracles ++ ops.Scalars.oracles ++
      ops.Events.oracles ++ ops.KeyRange.oracles ++ ops.Text.oracles ++
      ops.Dedup.oracles ++ ops.Similarity.oracles ++ ops.Pipeline.oracles ++
      ops.Ddl.oracles
}
