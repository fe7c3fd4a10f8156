package graft

import org.apache.spark.sql.functions._

/** The DSv2 catalog plugin (sources.GraftCatalog, registered as
  * spark.sql.catalog.graft): connector tables, keyed tables, and MV
  * snapshots all resolve as multipart identifiers — Astro's catalog-first
  * integration shape. */
class CatalogSpec extends SparkSpec {

  private def withTmpCatalog(testBody: => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempFile("graft_cat_v2", ".json")
    java.nio.file.Files.delete(tmp)
    val prev = sys.props.get("graft.catalog.path")
    sys.props("graft.catalog.path") = tmp.toString
    try { ops.Ddl.resetForTest(); testBody }
    finally {
      prev match {
        case Some(v) => sys.props("graft.catalog.path") = v
        case None    => sys.props.remove("graft.catalog.path")
      }
      ops.Ddl.resetForTest()
      graft.plans.MvCatalog.clear()
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  test("CREATE TABLE graft.ns.t USING graft_range resolves via multipart SQL") {
    withTmpCatalog {
      spark.sql("CREATE TABLE graft.rng.ct (k BIGINT, v BIGINT, tag STRING) " +
        "USING graft_range OPTIONS (rows '50000', slices '8')")
      val df = spark.sql(
        "SELECT count(*) AS cnt, sum(k) AS ks FROM graft.rng.ct WHERE k < 1000")
      val r = df.head()
      assert(r.getLong(0) == 1000L && r.getLong(1) == (0L until 1000L).sum)
      // pushdown survives the catalog route: key bounds reach the scan
      val plan = spark.sql("SELECT k FROM graft.rng.ct WHERE k BETWEEN 10 AND 19")
        .queryExecution.executedPlan.toString
      assert(plan.contains("keyBounds=[10,20)"), plan.take(800))
      // restart: the definition comes back from the persisted catalog
      ops.Ddl.resetForTest()
      assert(spark.sql("SELECT count(*) FROM graft.rng.ct").head().getLong(0) == 50000L)
      assert(spark.sql("SHOW TABLES IN graft.rng").collect()
        .map(_.getString(1)).contains("ct"))
      spark.sql("DROP TABLE graft.rng.ct")
      intercept[Exception] { spark.sql("SELECT 1 FROM graft.rng.ct").collect() }
    }
  }

  test("graft_kv tables write and read through the catalog (INSERT INTO)") {
    withTmpCatalog {
      val dir = java.nio.file.Files.createTempDirectory("graft_cat_kv").toString
      try {
        spark.sql("CREATE TABLE graft.kv.t (id INT, name STRING) " +
          s"USING graft_kv OPTIONS (path '$dir')")
        spark.sql("INSERT INTO graft.kv.t VALUES (1, 'one'), (2, 'two')")
        spark.sql("INSERT INTO graft.kv.t VALUES (3, 'three')")
        val rows = spark.sql("SELECT id, name FROM graft.kv.t ORDER BY id")
          .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
        assert(rows == Seq((1, "one"), (2, "two"), (3, "three")))
        // restart: resolves again, manifest is authoritative for schema
        ops.Ddl.resetForTest()
        assert(spark.sql("SELECT count(*) FROM graft.kv.t").head().getLong(0) == 3L)
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
      }
    }
  }

  test("keyed tables and MVs resolve as catalog views with mutations applied") {
    withTmpCatalog {
      spark.sql(s"CREATE TABLE kt MAPPED BY '${sf("sf0.001")}/nation.parquet' " +
        "KEYS (n_nationkey)")
      spark.sql("DELETE FROM kt WHERE n_regionkey = 0")
      // the catalog view replays the mutation log
      val viaCatalog = spark.sql(
        "SELECT count(*) AS c, sum(n_nationkey) AS s FROM graft.kt").head()
      val direct = spark.table("kt")
        .agg(count(lit(1)), sum(col("n_nationkey"))).head()
      assert(viaCatalog.getLong(0) == direct.getLong(0))
      assert(viaCatalog.getLong(1) == direct.getLong(1))
      // qualified keyed tables resolve with their namespace
      spark.sql(s"CREATE TABLE wh.kt2 MAPPED BY '${sf("sf0.001")}/region.parquet' " +
        "KEYS (r_regionkey)")
      assert(spark.sql("SELECT count(*) FROM graft.wh.kt2").head().getLong(0) == 5L)
      // an MV snapshot is addressable under the catalog too
      spark.sql("CREATE MATERIALIZED VIEW ktmv ON wh.kt2 " +
        "GROUP BY (r_regionkey) SUMS (r_regionkey)")
      assert(spark.sql("SELECT count(*) FROM graft.ktmv").head().getLong(0) == 5L)
      spark.sql("DROP MATERIALIZED VIEW ktmv")
      // graft references inside SUBQUERY EXPRESSIONS expand too (the
      // parser walks transformUpWithSubqueries — a plain transform never
      // descends into EXISTS/IN/scalar subqueries)
      val inSub = spark.sql(
        """SELECT count(*) FROM kt
          |WHERE n_nationkey IN (SELECT n_nationkey FROM graft.kt)""".stripMargin)
        .head().getLong(0)
      assert(inSub == spark.table("kt").count())
      val scalarSub = spark.sql(
        "SELECT (SELECT max(r_regionkey) FROM graft.wh.kt2) AS m").head()
      assert(scalarSub.getInt(0) == 4)
      spark.sql("DROP TABLE wh.kt2")
      spark.sql("DROP TABLE kt")
      spark.sql("DROP VIEW IF EXISTS wh.kt2")
    }
  }
}
