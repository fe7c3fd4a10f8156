package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * The result line is emitted twice: printed to stdout AND written bare to
  * `bench_out.json` in the working directory — round 1's driver failed to
  * parse the metric out of sbt's [info]-wrapped tail (`BENCH_r01.json
  * parsed:null`), so the file is the reliable channel.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // Same session semantics as the graded Verify run: UTC timestamps and
      // nanos-as-long for events.ts (converted in Tables.events).
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: one small end-to-end query absorbs the one-time session
    // costs (codegen compiler, parquet reader, shuffle machinery) that were
    // previously charged to whichever query happened to run first in the map
    // iteration order (rounds 1-2: stream_tumbling looked ~2s slower than it
    // is). Runs against the SAME sfDir as the timed loop; a failure here is
    // reported (it means the first timed query re-absorbs warmup).
    try SparkEntry.queries("filter_pred")(spark, sfDir).count() catch {
      case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}")
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // keep the JSON contract but never hide a broken query
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1L
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("bench_out.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
