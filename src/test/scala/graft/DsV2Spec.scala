package graft

import org.apache.spark.sql.functions._

/** The DSv2 connector must actually PRUNE: key predicates shrink the set of
  * planned input partitions (Astro's region-pruning analogue), and residual
  * predicates still apply above the scan. */
class DsV2Spec extends SparkSpec {

  private def ranged = spark.read.format("graft.sources.GraftRangeSource")
    .option("rows", "100000").option("slices", "16").load()

  test("key bounds prune input partitions") {
    val pruned = ranged.filter(col("k") < 10000)
    // 16 slices of 6250 keys; [0, 10000) overlaps exactly 2
    assert(pruned.rdd.getNumPartitions == 2)
    assert(pruned.count() == 10000)
    val full = ranged
    assert(full.rdd.getNumPartitions == 16)
  }

  test("pushed bounds appear in the scan; residual filters still apply") {
    val df = ranged.filter(col("k").between(500, 1499) && col("v") >= 900)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("keyBounds=[500,1500)"), plan)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(0) >= 500 && r.getLong(0) <= 1499))
    assert(rows.forall(_.getLong(1) >= 900))
    // residual matches the brute-force recomputation
    val expect = (500L to 1499L).count(k => graft.sources.GraftRangeSource.valueOf(k) >= 900)
    assert(rows.length == expect)
  }

  test("column pruning generates only requested columns") {
    val df = ranged.select("tag").filter(col("tag") === "r5")
    assert(df.schema.fieldNames === Array("tag"))
    assert(df.count() > 0)
  }
}
