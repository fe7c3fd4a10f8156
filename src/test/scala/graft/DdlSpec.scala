package graft

import org.apache.spark.sql.functions._

/** A8 surface: DDL registration + catalog-driven composite-key range scans
  * must agree with the hand-written keyrange_scan predicate. */
class DdlSpec extends SparkSpec {

  test("CREATE TABLE MAPPED BY registers a view with key metadata") {
    val t = ops.Ddl.create(spark,
      s"CREATE TABLE li_keyed MAPPED BY '${sf("sf0.001")}/lineitem.parquet' KEYS (l_orderkey, l_linenumber)")
    assert(t.keys == Seq("l_orderkey", "l_linenumber"))
    assert(spark.table("li_keyed").count() > 0)
    assert(ops.Ddl.lookup("LI_KEYED").isDefined) // case-insensitive
  }

  test("catalog-driven range scan matches the hand-written composite predicate") {
    ops.Ddl.create(spark,
      s"CREATE TABLE li_keyed MAPPED BY '${sf("sf0.001")}/lineitem.parquet' KEYS (l_orderkey, l_linenumber)")
    val viaCatalog = ops.Ddl.keyRangeScan(spark, "li_keyed",
        lower = Seq(1000L, 2), upper = Seq(3000L, 3))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
    val handWritten = ops.KeyRange.keyrangeScan(spark, sf("sf0.001"))
    assert(viaCatalog.collect().toSeq == handWritten.collect().toSeq)
  }

  test("malformed DDL and unknown key columns are rejected") {
    intercept[IllegalArgumentException] {
      ops.Ddl.create(spark, "CREATE TABLE broken")
    }
    intercept[IllegalArgumentException] {
      ops.Ddl.create(spark,
        s"CREATE TABLE bad MAPPED BY '${sf("sf0.001")}/lineitem.parquet' KEYS (nope)")
    }
  }

  test("prefix bounds work (leading key only)") {
    ops.Ddl.create(spark,
      s"CREATE TABLE li_keyed MAPPED BY '${sf("sf0.001")}/lineitem.parquet' KEYS (l_orderkey, l_linenumber)")
    val n = ops.Ddl.keyRangeScan(spark, "li_keyed", Seq(100L), Seq(200L)).count()
    val expect = Tables.lineitem(spark, sf("sf0.001"))
      .filter(col("l_orderkey") >= 100 && col("l_orderkey") <= 200).count()
    assert(n == expect)
  }
}
