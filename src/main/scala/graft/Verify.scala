package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // Deployment-grade install of the custom surface (functions + the
      // MAPPED BY SQL parser) — the same extensions a cluster job would set
      // via spark.sql.extensions=graft.functions.GraftExtensions.
      .withExtensions(new graft.functions.GraftExtensions)
      // Multipart-identifier resolution for graft-managed tables/views
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is parquet TIMESTAMP(NANOS): read as long, Tables.events
      // converts to a truncated microsecond timestamp (matches DuckDB).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Write MICROS (not INT96): the driver loads results via pandas, which
      // reads INT96 as datetime64[ns] but the DuckDB oracle side is
      // datetime64[us] — micros keeps both sides' dtype identical.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset filter (comma-separated names); unset on the driver,
    // where the full surface is always dumped.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Zero-row guard: an empty result can still hash-match an empty
        // oracle, which proves nothing (round-8 q22 postmortem). Counting
        // the written parquet is footer-metadata-only — effectively free.
        if (spark.read.parquet(s"$outDir/$name").count() == 0L)
          System.err.println(s"[verify] SUSPECT $name: wrote 0 rows — " +
            "an empty-vs-empty oracle match would be vacuous")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
