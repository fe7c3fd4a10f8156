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

  test("semicolons inside quoted literals do not split statements") {
    // 'a;b' must survive as one statement; the split happens at the real ';'
    val (rem, exit) = Shell.runComplete(spark, "SELECT 'a;b' AS s; SELECT 2")
    assert(!exit && rem.trim == "SELECT 2")
    // doubled-quote escape stays inside the literal too
    val (rem2, _) = Shell.runComplete(spark, "SELECT 'it''s;fine' AS s; SELECT 3")
    assert(rem2.trim == "SELECT 3")
    // double-quoted identifiers with ; behave the same
    val (rem3, _) = Shell.runComplete(spark, "SELECT 1 AS \"a;b\"; SELECT 4")
    assert(rem3.trim == "SELECT 4")
  }
}
