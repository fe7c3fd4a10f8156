package graft

import java.nio.file.Files

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Tiny literal fixtures written as parquet in the testdata table shapes, so
  * operator functions (which take a table directory) run unchanged against
  * them (FIXTURES.md fixture plan). */
object FixtureData {

  /** documents fixture: one exact-dup pair (by bag of words), one near-dup
    * pair, two distinct docs. */
  def docsDir(s: SparkSession): String = {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_fix_docs").toString
    val rows = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 46L),
      (1L, "theta eta zeta epsilon delta gamma beta alpha", "en", "src1", 46L), // exact dup (bag)
      (2L, "alpha beta gamma delta epsilon zeta eta iota", "en", "src2", 45L),  // near dup of 0
      (3L, "completely different words entirely unrelated text here now", "en", "src3", 59L),
      (4L, "voilà une phrase assez différente du reste", "fr", "src4", 42L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  /** events fixture for temporal-join semantics: clicks/purchases with an
    * exactly-equal timestamp pair (as-of bound must be inclusive), a click
    * after the purchase (must be ignored), and a user with no clicks. */
  def eventsDir(s: SparkSession): String = {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_fix_ev2").toString
    def ts(x: String) = java.sql.Timestamp.from(java.time.Instant.parse(x))
    val rows = Seq(
      (1L, ts("2024-01-01T09:00:00Z"), 1L, "click", 1.0, "{\"k\": 1}"),
      (2L, ts("2024-01-01T10:00:00Z"), 1L, "click", 1.0, "{\"k\": 2}"),
      (3L, ts("2024-01-01T10:00:00Z"), 1L, "purchase", 5.0, "{\"k\": 3}"), // ties click 2
      (4L, ts("2024-01-01T11:00:00Z"), 1L, "click", 1.0, "{\"k\": 4}"),    // after purchase
      (5L, ts("2024-01-01T10:30:00Z"), 2L, "purchase", 7.0, "{\"k\": 5}"), // user 2: no clicks
      (6L, ts("2024-01-01T10:45:00Z"), 2L, "view", 2.0, "{\"k\": 6}"))     // follow-on of 5
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/events.parquet")
    dir
  }

  /** embeddings fixture: v1 == v0 scaled (cos=1), v2 orthogonal to v0. */
  def embDir(s: SparkSession): String = {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_fix_emb").toString
    def vec(xs: Double*): Array[Float] = xs.toArray.map(_.toFloat)
    val rows = Seq(
      (0L, vec(1, 0, 0, 0), 0),
      (1L, vec(2, 0, 0, 0), 0),   // same direction as 0 → cos 1
      (2L, vec(0, 1, 0, 0), 1),   // orthogonal to 0
      (3L, vec(1, 1, 0, 0), 1))   // 45° from 0 and 2
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    dir
  }
}
