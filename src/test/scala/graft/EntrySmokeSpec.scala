package graft

/** t1-shaped smoke: the flagship entry returns rows, and every declared query
  * executes without throwing at sf0.001 (the contract's "never ship a queries
  * entry without running it" rule, SURVEY.md §7.5). */
class EntrySmokeSpec extends SparkSpec {

  test("entry flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all declared queries run non-empty at sf0.001") {
    val dir = sf("sf0.001")
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) Some(name) else None
    }
    // dedup_embed_cosine legitimately returns few/no pairs at tiny scale;
    // everything else must produce rows.
    assert(empties.toSet.subsetOf(Set("dedup_embed_cosine")), s"empty: $empties")
  }
}
