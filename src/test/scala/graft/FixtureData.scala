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
