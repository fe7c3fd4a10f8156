package graft

/** graft.Shell's statement machinery, driven without a TTY: splitting on
  * `;`, multi-line buffering, error containment, exit handling — the REPL
  * loop minus readLine. */
class ShellSpec extends SparkSpec {

  test("runComplete executes ;-terminated statements and keeps the remainder") {
    if (ops.Ddl.lookup("shell_t").isDefined) spark.sql("DROP TABLE shell_t")
    val (rem, exit) = Shell.runComplete(spark,
      s"CREATE TABLE shell_t MAPPED BY '${sf("sf0.001")}/region.parquet' KEYS (r_regionkey); SELECT count(*) FROM shell_t")
    assert(!exit)
    assert(rem.trim == "SELECT count(*) FROM shell_t") // unterminated → buffered
    assert(ops.Ddl.lookup("shell_t").isDefined)        // first statement ran
    // completing the buffered statement runs it
    val (rem2, exit2) = Shell.runComplete(spark, rem + ";")
    assert(!exit2 && rem2.trim.isEmpty)
    spark.sql("DROP TABLE shell_t")
  }

  test("a failing statement does not abort the batch; exit stops it") {
    // the bad statement is contained (one stderr line), the next one runs
    val (rem, exit) = Shell.runComplete(spark,
      "SELECT definitely_not_a_column FROM nowhere; SELECT 1 AS ok; exit; SELECT 2 AS never")
    assert(exit)                         // exit; seen...
    assert(rem.trim == "SELECT 2 AS never") // ...and nothing after it ran
  }

  test("quit is exit; blank statements are skipped") {
    val (rem, exit) = Shell.runComplete(spark, " ; ;; QUIT ; SELECT 1")
    assert(exit && rem.trim == "SELECT 1")
  }
}
