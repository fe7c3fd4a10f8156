package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Per-job profile of a named query: attributes wall time to the source
  * call sites (file:line) that submitted each Spark job, so a multi-step
  * operator's cost decomposes without the UI (disabled in bench runs).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.Profile kv_zorder keyed_cbo_join"
  *
  * Each query runs once untimed (warm the session) and once profiled; jobs
  * are listed in submission order with their duration and call site. Gaps
  * between the sum of job times and the wall clock are DRIVER-side work
  * (planning, manifest I/O, catalog DDL) — the profile prints both so the
  * split is visible. A query name may be suffixed `!` to skip its warmup
  * (profile the cold path).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // session warmup (same shape as Bench's untimed warmups)
    Seq("filter_pred", "agg_groupby").foreach { w =>
      try SparkEntry.queries(w)(spark, sfDir).count(): Unit
      catch { case e: Throwable => System.err.println(s"[profile] warmup: $e") }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(j.jobId, (j.time, site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, site) =>
          done.add((j.jobId, j.time - t0, site))
        }
      }
    }
    args.foreach { raw =>
      val cold = raw.endsWith("!")
      val name = if (cold) raw.dropRight(1) else raw
      val fn = SparkEntry.queries(name)
      if (!cold) { try fn(spark, sfDir).count(): Unit catch { case _: Throwable => () } }
      done.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count(): Unit
      catch { case e: Throwable => println(s"[profile] $name FAILED: $e") }
      val wallMs = (System.nanoTime() - t0) / 1e6
      Thread.sleep(500) // let the listener bus drain (public API has no wait)
      spark.sparkContext.removeSparkListener(listener)
      println(s"\n===== $name: wall ${f"$wallMs%.0f"} ms =====")
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_._1)
      rows.foreach { case (id, ms, site) =>
        println(f"  job $id%4d ${ms}%6d ms  $site")
      }
      val jobSum = rows.map(_._2).sum
      println(f"  jobs ${rows.size}%3d  sum ${jobSum}%6d ms  driver-side ${wallMs - jobSum}%.0f ms")
    }
    spark.stop()
  }
}
