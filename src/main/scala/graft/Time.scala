package graft

import org.apache.spark.sql.SparkSession

/** Micro-bench utility: times the named queries REPS times each (default 3)
  * against SPARK_GRAFT_SF_DIR, printing every rep — the tool for separating
  * a real plan regression from this host's bursty ambient noise (single-run
  * numbers here swing 2-8x; see BASELINE.md).
  * `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Time dedup_components_lsh"`. */
object Time {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries("filter_pred")(spark, sfDir).count() catch { case _: Throwable => }
    args.foreach { name =>
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, sfDir).count()
        println(f"[time] $name rep $r: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
