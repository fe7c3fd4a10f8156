package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (mirrors the harness config:
  * UTC, nanosAsLong for the events table, small shuffle parallelism). */
trait SparkSpec extends AnyFunSuite {
  // force the companion's catalog-path isolation at suite CONSTRUCTION: a
  // test whose first statement touches ops.Ddl (lookup/execute guards)
  // before `spark` would otherwise latch the repo-root catalog file
  SparkSpec.init
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String): String = s"/root/testdata/$dir"
}

object SparkSpec {
  // Isolate the persistent DDL catalog per test JVM: without this, suites
  // that create keyed tables (li_keyed, ddl_rt, ...) persist them into the
  // repo's default spark-warehouse/graft_catalog.json, leaking fixture
  // paths into later shell/bench sessions. Individual tests that exercise
  // persistence explicitly set (and restore) their own path on top.
  sys.props.getOrElseUpdate("graft.catalog.path",
    java.nio.file.Files.createTempDirectory("graft_test_cat")
      .resolve("graft_catalog.json").toString)

  /** Cheap handle whose access runs this object's initializer (the
    * catalog-path prop above) — referenced from the trait constructor. */
  val init: Unit = ()

  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // Deployment-shaped session: custom functions + the MAPPED BY SQL
      // parser installed the way a cluster job would (spark.sql.extensions).
      .withExtensions(new graft.functions.GraftExtensions)
      // Multipart-identifier resolution for graft-managed tables/views
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
